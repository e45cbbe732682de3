"""Split the loss tail: BCE vs CIoU vs DFL, and a gather-free DFL rewrite.

Usage: python tools/profile_loss_tail.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, n=8, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3


def main(batch=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.ops.boxes import bbox_iou
    from mgdt_yolo_tpu.utils.loss import _bce_logits, _df_loss

    A, nc, reg_max = 8400, 2, 4
    rng = np.random.default_rng(0)
    ps = jnp.asarray(rng.standard_normal((batch, A, nc), dtype=np.float32))
    ts = jnp.asarray(rng.random((batch, A, nc), dtype=np.float32))
    pb = jnp.asarray(rng.random((batch, A, 4), dtype=np.float32) * 600)
    tb = pb * 0.9
    pd = jnp.asarray(rng.standard_normal((batch, A, 4, reg_max),
                                         dtype=np.float32))
    tgt = jnp.asarray(rng.random((batch, A, 4), dtype=np.float32) * (reg_max - 1))
    w = jnp.asarray(rng.random((batch, A), dtype=np.float32))

    bce = jax.jit(lambda: _bce_logits(ps, ts).sum())
    print(f"bce:        {timeit(bce):7.2f} ms", flush=True)

    iou = jax.jit(lambda: ((1.0 - bbox_iou(pb, tb, xywh=False, CIoU=True)
                            .squeeze(-1)) * w).sum())
    print(f"ciou:       {timeit(iou):7.2f} ms", flush=True)

    dfl = jax.jit(lambda: (_df_loss(pd, tgt) * w).sum())
    print(f"dfl(gather):{timeit(dfl):7.2f} ms", flush=True)

    def df_onehot(pred_dist, target):
        tl = jnp.floor(target).astype(jnp.int32)
        tr = tl + 1
        wl = tr.astype(target.dtype) - target
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
        bins = pred_dist.shape[-1]
        oh_l = jax.nn.one_hot(tl, bins, dtype=logp.dtype)
        oh_r = jax.nn.one_hot(jnp.clip(tr, 0, bins - 1), bins, dtype=logp.dtype)
        ce_l = -(logp * oh_l).sum(-1)
        ce_r = -(logp * oh_r).sum(-1)
        return (ce_l * wl + ce_r * wr).mean(axis=-1)

    dfl2 = jax.jit(lambda: (df_onehot(pd, tgt) * w).sum())
    ms = timeit(dfl2)
    print(f"dfl(onehot):{ms:7.2f} ms", flush=True)
    # parity
    a = jax.device_get(dfl())
    b_ = jax.device_get(dfl2())
    print(f"parity |Δ| = {abs(a - b_):.3e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
