#!/usr/bin/env python
"""Per-image latency at 640px, mean excluding min/max — the reference's
protocol (nn/standard_cal_inference_time.py:9-70) with jax.block_until_ready
in place of CUDA events.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="mspa_c2f_gd_tood_yolov8.yaml")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    mh = DetectionModel(args.model, dtype=jnp.bfloat16)
    # device-resident params (model init keeps them as host numpy; passing
    # those into a jitted call re-uploads the tree every dispatch)
    variables = jax.device_put(mh.variables)

    @jax.jit
    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (args.batch, args.imgsz, args.imgsz, 3)).astype(np.float32),
        jnp.bfloat16)
    def run_blocking():
        out = infer(variables, x)
        # block_until_ready does NOT block through the axon tunnel; a 1-elem
        # device_get is the only reliable completion fence here (CLAUDE.md).
        jax.device_get(out[0].ravel()[:1] if isinstance(out, tuple)
                       else out.ravel()[:1])

    run_blocking()
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run_blocking()
        times.append(time.perf_counter() - t0)
    times = sorted(times)[1:-1]
    ms = sum(times) / len(times) / args.batch * 1000
    print(f"{args.model}: {ms:.2f} ms/image @ {args.imgsz}px "
          f"(batch {args.batch}, {args.iters} runs, min/max excluded; "
          f"includes one ~27 ms tunnel round-trip on this dev box)")


if __name__ == "__main__":
    main()
