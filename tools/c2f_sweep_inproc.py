#!/usr/bin/env python
"""In-process XLA compiler-option sweep targeting the l-scale C2f conv stall.

VERDICT r4 weak #3a: two of the three identical C2f bottleneck 128->128
convs run at 30% of SOL in-program vs 58.9% standalone (the third hits
91%) — async scoped-memory copy stalls, i.e. XLA scheduling, not an
emitter ceiling.

tools/c2f_stall_sweep.py tried XLA_FLAGS in subprocesses, but the axon
tunnel compiles REMOTELY: the local parse_flags_from_env aborts on
tpu-only flags (F0820 ... Unknown flag in XLA_FLAGS). Per-compile
`lowered.compile(compiler_options=...)` serializes the options into the
PJRT compile request instead, so the whole sweep runs in ONE process,
one lowering, N compiles — and each config's executable is benched with
the exact bench_scale protocol (min-of-windows, device_get sync).

Usage: python tools/c2f_sweep_inproc.py [scale] [batch]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CONFIGS = {
    "base": {},
    # latency-hiding scheduler: overlaps async (scoped-memory) copies with
    # compute; try both forced states vs whatever the default is
    "lhs_on": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # scoped VMEM budget: the stalls are waits on scoped-memory copies, so
    # both MORE room (copies land earlier) and LESS (fewer scoped ops)
    # are plausible winners
    "svmem8": {"xla_tpu_scoped_vmem_limit_kib": "8192"},
    "svmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "svmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    # scheduler lookahead: more aggressive overlap search
    "lhs_on_svmem64": {"xla_tpu_enable_latency_hiding_scheduler": "true",
                       "xla_tpu_scoped_vmem_limit_kib": "65536"},
    # refine around the 32 MiB winner
    "svmem16": {"xla_tpu_scoped_vmem_limit_kib": "16384"},
    "svmem24": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "svmem48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
}


def main(scale="l", batch=128, imgsz=640, names=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel, yaml_model_load
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    d = yaml_model_load("mspa_c2f_gd_tood_yolov8.yaml")
    d["scale"] = scale
    mh = DetectionModel(d, dtype=jnp.bfloat16).fuse()
    variables = jax.device_put(mh.variables)

    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=1024)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, imgsz, imgsz, 3)),
                    jnp.bfloat16)
    lowered = jax.jit(infer).lower(variables, x)

    def sync(out):
        jax.device_get(out[0].ravel()[:1])

    results = []
    for name in (names or list(CONFIGS)):
        opts = CONFIGS[name]
        t0 = time.perf_counter()
        try:
            ex = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # remote compiler may reject a knob
            print(f"{name}: compile FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            results.append({"config": name, "opts": opts, "error": str(e)[:200]})
            continue
        t_compile = time.perf_counter() - t0
        sync(ex(variables, x))  # warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(ex(variables, x))
            best = min(best, time.perf_counter() - t0)
        best -= 27e-3  # axon tunnel per-call overhead (README protocol)
        rate = batch / best
        print(f"{name}: compile {t_compile:.1f}s, {best * 1e3:.1f} ms/batch, "
              f"{rate:.0f} img/s  opts={opts}", flush=True)
        results.append({"config": name, "opts": opts,
                        "ms_batch": round(best * 1e3, 2),
                        "img_s": round(rate, 1),
                        "compile_s": round(t_compile, 1)})
        Path(__file__).resolve().parents[1].joinpath(
            f"runs/c2f_sweep_{scale}.json").write_text(
            json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "l", int(a[1]) if len(a) > 1 else 128,
         names=a[2:] or None)
