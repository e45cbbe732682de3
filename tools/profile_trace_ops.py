"""Op-level attribution for a compiled program via jax.profiler traces.

Captures a device trace of the train-mode fwd+loss program, then parses the
perfetto/chrome trace JSON that the profiler writes and aggregates device-op
durations — ground truth for where a composed program spends its time when
host-side timing deltas disagree with isolated microbenches (the axon tunnel
makes per-call wall timing noisy; the trace is recorded on-device).

Usage: python tools/profile_trace_ops.py [batch] [mode]
  mode: fwd | loss (default, fwd+loss) | bwd | infer (fused serving fwd+NMS)
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TRACE_DIR = "/tmp/mgdt_trace_ops"


def summarize(trace_dir: str, top: int = 30):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(f"no trace.json.gz under {trace_dir}", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pick pids whose process_name metadata mentions TPU/device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    if not agg:
        print("no complete events on device tracks; pids seen:", pid_name,
              flush=True)
        return
    print(f"\ntrace: {paths[-1]}")
    print(f"total device op time {total:.1f} ms across {len(agg)} op names")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.3f} ms  {name[:110]}")


def main(batch=32, mode="loss", imgsz=640):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    params = jax.device_put(mh.variables["params"])
    bs = jax.device_put(mh.variables.get("batch_stats", {}))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, imgsz, imgsz, 3), dtype=np.float32))
    max_gt = 8
    labels = jnp.asarray(rng.integers(0, 2, (batch, max_gt)), jnp.int32)
    xy = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.7
    wh = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.2 + 8
    bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    mask = jnp.asarray(rng.random((batch, max_gt)) < 0.7)
    batch_d = {"img": img, "gt_labels": labels, "gt_bboxes": bboxes,
               "mask_gt": mask}
    step = jnp.int32(0)

    if mode == "infer":
        from mgdt_yolo_tpu.ops.nms import non_max_suppression
        mhf = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml",
                             dtype=jnp.bfloat16).fuse()
        variables = jax.device_put(mhf.variables)
        xb = img.astype(jnp.bfloat16)

        @jax.jit
        def prog(vs, x):
            decoded, _ = mhf.model.apply(vs, x, train=False)
            return non_max_suppression(decoded, conf_thres=0.25,
                                       iou_thres=0.7, max_det=300,
                                       pre_topk=1024)
        run = lambda: prog(variables, xb)
    elif mode == "fwd":
        @jax.jit
        def prog(params, bs, img):
            out, upd = mh.model.apply({"params": params, "batch_stats": bs},
                                      img, train=True, mutable=["batch_stats"])
            return out[1], upd
        run = lambda: prog(params, bs, img)
    elif mode == "bwd":
        @jax.jit
        def prog(params, bs, batch_d):
            def loss_fn(p):
                out, upd = mh.model.apply({"params": p, "batch_stats": bs},
                                          batch_d["img"], train=True,
                                          mutable=["batch_stats"])
                lo = criterion(out[1], batch_d, step)
                return lo.total, upd
            (loss, upd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, grads
        run = lambda: prog(params, bs, batch_d)
    else:
        @jax.jit
        def prog(params, bs, batch_d):
            out, upd = mh.model.apply({"params": params, "batch_stats": bs},
                                      batch_d["img"], train=True,
                                      mutable=["batch_stats"])
            lo = criterion(out[1], batch_d, step)
            return lo.total, upd
        run = lambda: prog(params, bs, batch_d)

    t0 = time.perf_counter()
    out = run()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
    for _ in range(2):
        out = run()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = run()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    jax.profiler.stop_trace()
    summarize(TRACE_DIR)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        summarize(sys.argv[2] if len(sys.argv) > 2 else TRACE_DIR)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
             sys.argv[2] if len(sys.argv) > 2 else "loss")
