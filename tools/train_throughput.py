"""Measure training throughput on the real TPU: compiled-step time vs
end-to-end wall time per step with the worker-pool input pipeline feeding
synthetic 640px data — the host must keep the chip busy.

Usage: python tools/train_throughput.py [batch] [imgsz] [steps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=32, imgsz=640, steps=20, device_aug=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.cfg import get_cfg
    from mgdt_yolo_tpu.data.build import build_dataloader
    from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
    from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                              make_train_step)
    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    mesh = create_mesh()
    params = mh.variables["params"]
    tx = build_optimizer(params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                         100, 1000, 10, 100, False, 0.8, nc=mh.nc)
    state = TrainState(
        params=replicate_tree(params, mesh),
        batch_stats=replicate_tree(mh.variables.get("batch_stats", {}), mesh),
        opt_state=replicate_tree(tx.init(params), mesh),
        ema_params=replicate_tree(jax.tree.map(np.array, params), mesh),
        step=jnp.int32(0), ema_updates=jnp.int32(0))
    step_fn = make_train_step(mh.model, criterion, tx)

    ds = SyntheticDetectionDataset(n=batch * 8, imgsz=imgsz, nc=2, seed=0)

    class _Cached:  # RAM-cached items: isolates pipeline cost from decode
        def __init__(self, inner):
            self._items = [inner[i] for i in range(len(inner))]
            self.buffer = []
            self._inner = inner

        def __len__(self):
            return len(self._items)

        def __getitem__(self, i):
            return self._items[i]

        def max_labels(self):
            return self._inner.max_labels()

    ds = _Cached(ds)
    hyp = get_cfg(overrides={"mosaic": 1.0, "fliplr": 0.5})
    loader = build_dataloader(ds, batch, imgsz, train=True, hyp=hyp,
                              seed=0, workers=8, device_augment=device_aug)
    if device_aug:
        from functools import partial

        from mgdt_yolo_tpu.ops.device_augment import device_augment
        base_key = jax.random.PRNGKey(0)
        aug = partial(device_augment, imgsz=imgsz, mosaic_p=1.0, scale=0.5,
                      translate=0.1, fliplr=0.5, max_out=loader.max_gt)
        step_fn = make_train_step(
            mh.model, criterion, tx,
            augment_fn=lambda b, st: aug(b, jax.random.fold_in(base_key, st)))
        print("device-side augmentation: ON", flush=True)

    it = iter(loader)
    first = shard_batch(next(it), mesh)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, first)
    jax.device_get(metrics["loss"].ravel()[:1] if hasattr(metrics["loss"], "ravel")
                   else metrics["loss"])
    print(f"first step (compile): {time.perf_counter() - t0:.1f} s", flush=True)

    # settle: a few warmup steps so async compile/dispatch tails drain
    for _ in range(3):
        state, metrics = step_fn(state, first)
    jax.device_get(metrics["loss"])

    # end-to-end wall: loader feeding fresh batches every step
    done = 0
    t0 = time.perf_counter()
    for b in it:
        state, metrics = step_fn(state, shard_batch(b, mesh))
        done += 1
        if done >= steps:
            break
    jax.device_get(metrics["loss"])
    wall_ms = (time.perf_counter() - t0) / max(done, 1) * 1e3
    print(f"e2e train step ({done} steps): {wall_ms:.1f} ms "
          f"({batch / wall_ms * 1e3:.1f} img/s)", flush=True)

    # compiled-step time: same batch, no host work, amortized sync
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, first)
    jax.device_get(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"compiled step: {step_ms:.1f} ms ({batch / step_ms * 1e3:.1f} img/s) "
          f"— host overhead {wall_ms - step_ms:+.1f} ms/step", flush=True)


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x != "--device-augment"]
    main(int(a[0]) if a else 32, int(a[1]) if len(a) > 1 else 640,
         int(a[2]) if len(a) > 2 else 20,
         device_aug="--device-augment" in sys.argv)
