"""Benchmark: flagship MGDT eval-path throughput on the real TPU chip.

Prints ONE JSON line: images/sec of the jitted forward+decode+NMS pipeline
(the reference's latency protocol is mean per-image ms at 640px,
nn/standard_cal_inference_time.py:9-70; vs_baseline is the speedup over the
torch-CPU reference measured once and stored in baseline_measurements.json —
BASELINE.md's target is >=5x the CPU-reference images/sec per v5e chip).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    imgsz = 640
    batch = 64  # throughput config: the single-chip pipeline is dispatch-bound
    # below ~batch 32 (per-call tunnel overhead); 64 saturates the chip
    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    variables = mh.variables

    @jax.jit
    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32),
                    dtype=jnp.bfloat16)
    # warmup / compile
    jax.block_until_ready(infer(variables, x))
    # timed runs (exclude min/max like the reference protocol)
    times = []
    for _ in range(12):
        t0 = time.perf_counter()
        jax.block_until_ready(infer(variables, x))
        times.append(time.perf_counter() - t0)
    times = sorted(times)[1:-1]
    ips = batch / (sum(times) / len(times))

    baseline_file = Path(__file__).parent / "baseline_measurements.json"
    vs_baseline = 0.0
    if baseline_file.is_file():
        base = json.loads(baseline_file.read_text())
        ref_ips = base.get("torch_cpu_mgdt_images_per_sec")
        if ref_ips:
            vs_baseline = ips / ref_ips
    print(json.dumps({"metric": "mgdt_640px_infer_throughput", "value": round(ips, 2),
                      "unit": "images/sec", "vs_baseline": round(vs_baseline, 2)}))


if __name__ == "__main__":
    main()
