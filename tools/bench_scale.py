"""Throughput of any model yaml / scale on the real TPU (bench.py protocol:
min-of-windows, forced device_get sync through the axon tunnel).

Usage: python tools/bench_scale.py [scale] [batch] [yaml]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(scale="s", batch=256, cfg="mspa_c2f_gd_tood_yolov8.yaml",
         imgsz=640):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel, yaml_model_load
    from mgdt_yolo_tpu.ops.nms import non_max_suppression
    from mgdt_yolo_tpu.utils.compile_opts import tpu_compiler_options
    from mgdt_yolo_tpu.utils.torch_utils import model_info

    d = yaml_model_load(cfg)
    d["scale"] = scale
    mh = DetectionModel(d, dtype=jnp.bfloat16).fuse()
    info = model_info(mh, imgsz=imgsz, verbose=False)
    n_params = info.get("params", mh.num_params())
    flops_g = float(info.get("gflops", 0.0))
    print(f"{cfg} scale={scale}: {n_params / 1e6:.2f}M params, "
          f"{flops_g:.1f} GFLOPs @{imgsz}", flush=True)
    # device-resident params: host (numpy) variables are re-uploaded on
    # every dispatch otherwise (44 MB fp32 at l-scale = ~1.2 s/call here)
    variables = jax.device_put(mh.variables)

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=1024)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, imgsz, imgsz, 3)),
                    jnp.bfloat16)

    def sync(out):
        jax.device_get(out[0].ravel()[:1])

    t0 = time.perf_counter()
    sync(infer(variables, x))
    print(f"compile {time.perf_counter() - t0:.1f} s", flush=True)

    n_dispatch = 10
    windows = []
    for _ in range(10):
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            out = infer(variables, x)
        sync(out)
        windows.append((time.perf_counter() - t0) / n_dispatch)
        best = sorted(windows)[:2]
        if len(windows) >= 4 and best[1] / best[0] < 1.02:
            break
    dt = min(windows)
    ips = batch / dt
    # get_flops comes from XLA cost_analysis, which already counts an FMA
    # as 2 flops (verified: 128^3 matmul reports 2*N^3) — no MACs x2 here.
    tflops = ips * flops_g / 1e3  # fwd FLOPs only, GF->TF
    print(f"scale={scale} b{batch}: {dt * 1e3:.1f} ms/batch, "
          f"{ips:.0f} img/s, ~{tflops:.1f} TFLOP/s "
          f"({tflops / 197 * 100:.1f}% of v5e bf16 peak)", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "s", int(a[1]) if len(a) > 1 else 256,
         *(a[2:3] or []))
