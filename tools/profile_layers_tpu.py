"""Per-layer wall-time profile of a model on the real TPU.

Chains jax.eval_shape over the LayerSpec graph to recover every layer's
input shape, then times each layer as an isolated jitted program at the
requested batch (amortized device_get protocol per CLAUDE.md). Sum of
layers > full-model time (XLA fuses across layers in the real program),
but the RANKING shows where the time goes.

Usage: python tools/profile_layers_tpu.py [batch] [yaml] [scale]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=128, cfg="mspa_c2f_gd_tood_yolov8.yaml", imgsz=640,
         scale=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import (DetectionModel, build_module,
                                        yaml_model_load)

    dtype = jnp.bfloat16
    if scale:
        cfg = dict(yaml_model_load(cfg), scale=scale)
    mh = DetectionModel(cfg, dtype=dtype)
    key = jax.random.PRNGKey(0)

    # --- shape chaining (abstract) ---
    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), dtype)
    saved, out = {}, x
    layer_inputs = []
    for spec in mh.specs:
        if spec.f == -1:
            inp = out
        elif isinstance(spec.f, int):
            inp = saved[spec.f]
        else:
            inp = [out if j == -1 else saved[j] for j in spec.f]
        layer_inputs.append(inp)
        mod = build_module(spec, dtype, mh.stride)
        var_s = jax.eval_shape(partial(mod.init, train=False), key, inp)
        out = jax.eval_shape(partial(mod.apply, train=False), var_s, inp)
        if spec.i in mh.save:
            saved[spec.i] = out

    # --- per-layer isolated timing ---
    def mat(s):
        if isinstance(s, (list, tuple)):
            return [mat(t) for t in s]
        return jnp.zeros(s.shape, s.dtype)

    rows = []
    for spec, inp_s in zip(mh.specs, layer_inputs):
        mod = build_module(spec, dtype, mh.stride)
        inp = mat(inp_s)
        try:
            vs = mod.init(key, inp, train=False)
            fn = jax.jit(lambda v, i, _m=mod: _m.apply(v, i, train=False))
            o = fn(vs, inp)
            jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(vs, inp)
            jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / n * 1e3
        except Exception as e:
            dt = float("nan")
            print(f"{spec.i:>3} {spec.name:<28} FAILED: {e}", flush=True)
            continue
        shp = inp_s.shape if hasattr(inp_s, "shape") else \
            [tuple(s.shape) for s in inp_s]
        rows.append((spec.i, spec.name, shp, dt))
        print(f"{spec.i:>3} {spec.name:<28} in={str(shp):<28} {dt:8.2f} ms",
              flush=True)
    rows.sort(key=lambda r: -r[3])
    print("\n--- hottest layers ---")
    for i, name, shp, dt in rows[:10]:
        print(f"{i:>3} {name:<28} {str(shp):<28} {dt:8.2f} ms")
    print(f"total(sum of isolated layers) {sum(r[3] for r in rows):.1f} ms")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = sys.argv[2] if len(sys.argv) > 2 else "mspa_c2f_gd_tood_yolov8.yaml"
    main(b, cfg, scale=(sys.argv[3] if len(sys.argv) > 3 else None))
