"""Break the compiled train step into phases on the real TPU.

Times four separately-jitted programs on identical b32 inputs:
  1. forward (train=True, mutable batch_stats)
  2. forward + loss (assigner + DFL/IoU/BCE)
  3. value_and_grad of (2)
  4. the full production step (grads + SGD + EMA, make_train_step)

Differences localize the cost: (2)-(1) = loss/assigner, (3)-(2) = backward,
(4)-(3) = optimizer/EMA/metrics. Timing follows the repo protocol: loop n
then one device_get of a scalar slice; the ~27 ms tunnel round-trip
amortizes away.

Usage: python tools/profile_train_phases.py [batch] [imgsz]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, sync, n=6, warmup=2):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(batch=32, imgsz=640):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                              make_train_step)
    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    # model init is host-side (numpy) since the host-only-init change; pin
    # everything on device once so the loop doesn't re-upload params through
    # the ~37 MB/s tunnel every call
    params = jax.device_put(mh.variables["params"])
    bs = jax.device_put(mh.variables.get("batch_stats", {}))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, imgsz, imgsz, 3), dtype=np.float32))
    max_gt = 8
    labels = jnp.asarray(rng.integers(0, 2, (batch, max_gt)), jnp.int32)
    xy = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.7
    wh = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.2 + 8
    bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))  # xyxy px
    mask = jnp.asarray(rng.random((batch, max_gt)) < 0.7)
    batch_d = {"img": img, "gt_labels": labels, "gt_bboxes": bboxes,
               "mask_gt": mask}

    step = jnp.int32(0)

    @jax.jit
    def fwd(params, bs, img):
        out, upd = mh.model.apply({"params": params, "batch_stats": bs},
                                  img, train=True, mutable=["batch_stats"])
        return out[1], upd

    @jax.jit
    def fwd_loss(params, bs, batch_d):
        out, upd = mh.model.apply({"params": params, "batch_stats": bs},
                                  batch_d["img"], train=True,
                                  mutable=["batch_stats"])
        lo = criterion(out[1], batch_d, step)
        return lo.total, upd

    @jax.jit
    def fwd_bwd(params, bs, batch_d):
        def loss_fn(p):
            out, upd = mh.model.apply({"params": p, "batch_stats": bs},
                                      batch_d["img"], train=True,
                                      mutable=["batch_stats"])
            lo = criterion(out[1], batch_d, step)
            return lo.total, upd
        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    tx = build_optimizer(params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                         100, 1000, 10, 100, False, 0.8, nc=mh.nc)
    state = TrainState(params=params, batch_stats=bs,
                       opt_state=jax.device_put(tx.init(params)),
                       ema_params=jax.device_put(
                           jax.tree.map(jnp.asarray, params)),
                       step=jnp.int32(0), ema_updates=jnp.int32(0))
    step_fn = make_train_step(mh.model, criterion, tx)

    def sync_first_leaf(out):
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)

    phases = []
    t0 = time.perf_counter()
    ms = timeit(lambda: fwd(params, bs, img), sync_first_leaf)
    print(f"fwd only:        {ms:7.1f} ms   (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)
    phases.append(("fwd", ms))

    t0 = time.perf_counter()
    ms = timeit(lambda: fwd_loss(params, bs, batch_d), sync_first_leaf)
    print(f"fwd+loss:        {ms:7.1f} ms   (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)
    phases.append(("fwd+loss", ms))

    t0 = time.perf_counter()
    ms = timeit(lambda: fwd_bwd(params, bs, batch_d), sync_first_leaf)
    print(f"fwd+loss+bwd:    {ms:7.1f} ms   (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)
    phases.append(("fwd+bwd", ms))

    # full step: donated state forces a fresh state each call — rebuild once
    # and reuse; donation means we must re-thread the returned state.
    t0 = time.perf_counter()
    st = state
    st, m = step_fn(st, batch_d)
    jax.device_get(m["loss"])
    print(f"full step compile: {time.perf_counter()-t0:.0f}s", flush=True)
    for _ in range(2):
        st, m = step_fn(st, batch_d)
    jax.device_get(m["loss"])
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        st, m = step_fn(st, batch_d)
    jax.device_get(m["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"full step:       {ms:7.1f} ms", flush=True)
    phases.append(("full", ms))

    f, fl, fb, full = [p[1] for p in phases]
    print(f"\nbreakdown @ b{batch}/{imgsz}px:")
    print(f"  forward            {f:7.1f} ms")
    print(f"  loss+assigner      {fl - f:7.1f} ms")
    print(f"  backward           {fb - fl:7.1f} ms")
    print(f"  optimizer/EMA/etc  {full - fb:7.1f} ms")
    print(f"  total              {full:7.1f} ms ({batch / full * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 640)
