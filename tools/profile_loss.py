"""Microbench the detection loss on the real TPU, isolating the assigner.

The train-phase profile (tools/profile_train_phases.py) showed loss+assigner
costing as much as the whole forward (≈34 ms at b32) — this narrows it:
  1. full criterion (decode + assign + BCE/IoU/DFL)
  2. assigner alone on precomputed scores/boxes
  3. decode alone (softmax-expectation + dist2bbox)
  4. loss tail alone (mocked assignment, BCE/IoU/DFL only)

Usage: python tools/profile_loss.py [batch]
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

    from mgdt_yolo_tpu.ops.boxes import bbox_iou, make_anchors
    from mgdt_yolo_tpu.utils.loss import DetectionLoss, _bce_logits, _df_loss
    from mgdt_yolo_tpu.utils.tal import heuristic_assign_v1

    nc, reg_max = 2, 4
    strides = (8., 16., 32.)
    crit = DetectionLoss(nc, reg_max, strides)
    no = nc + reg_max * 4
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal(
        (batch, s, s, no), dtype=np.float32), jnp.bfloat16)
        for s in (80, 40, 20)]
    max_gt = 8
    labels = jnp.asarray(rng.integers(0, nc, (batch, max_gt)), jnp.int32)
    xy = rng.random((batch, max_gt, 2), dtype=np.float32) * 448
    wh = rng.random((batch, max_gt, 2), dtype=np.float32) * 128 + 8
    bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    mask = jnp.asarray(rng.random((batch, max_gt)) < 0.7)
    batch_d = {"gt_labels": labels, "gt_bboxes": bboxes, "mask_gt": mask}
    step = jnp.int32(0)

    full = jax.jit(lambda f, bd: crit(f, bd, step).total)
    t0 = time.perf_counter()
    ms = timeit(lambda: full(feats, batch_d))
    print(f"full loss:      {ms:7.2f} ms  (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    A = 8400
    shapes = [(80, 80), (40, 40), (20, 20)]
    anc, stride_t = make_anchors(shapes, strides, 0.5)
    scores = jnp.asarray(rng.random((batch, A, nc), dtype=np.float32))
    pxy = rng.random((batch, A, 2), dtype=np.float32) * 600
    pwh = rng.random((batch, A, 2), dtype=np.float32) * 60 + 4
    pbox = jnp.asarray(np.concatenate([pxy, pxy + pwh], -1))

    assign_fn = jax.jit(lambda s, pb: heuristic_assign_v1(
        s, pb, anc * stride_t, labels, bboxes, mask, step, num_classes=nc))
    t0 = time.perf_counter()
    ms = timeit(lambda: assign_fn(scores, pbox))
    print(f"assigner only:  {ms:7.2f} ms  (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    def decode(f):
        b = f[0].shape[0]
        flat = jnp.concatenate([x.reshape(b, -1, no) for x in f], axis=1)
        pd = flat[..., :reg_max * 4]
        return crit._bbox_decode(anc, pd)
    dec = jax.jit(decode)
    t0 = time.perf_counter()
    ms = timeit(lambda: dec(feats))
    print(f"decode only:    {ms:7.2f} ms  (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    tscores = jnp.asarray(rng.random((batch, A, nc), dtype=np.float32))
    fg = jnp.asarray(rng.random((batch, A)) < 0.05)
    tbox = pbox * 0.9

    def tail(f, ts, fgm, tb):
        b = f[0].shape[0]
        flat = jnp.concatenate([x.reshape(b, -1, no) for x in f], axis=1)
        pd = flat[..., :reg_max * 4]
        ps = flat[..., reg_max * 4:]
        pb = crit._bbox_decode(anc, pd)
        tss = jnp.maximum(ts.sum(), 1.0)
        l_cls = _bce_logits(ps, ts).sum() / tss
        w = ts.sum(-1) * fgm
        iou = bbox_iou(pb, tb, xywh=False, CIoU=True).squeeze(-1)
        l_box = ((1.0 - iou) * w).sum() / tss
        from mgdt_yolo_tpu.ops.boxes import bbox2dist
        tl = bbox2dist(anc, tb, reg_max - 1)
        dist = pd.reshape(b, -1, 4, reg_max)
        l_dfl = (_df_loss(dist, tl) * w).sum() / tss
        return l_cls + l_box + l_dfl
    tailj = jax.jit(tail)
    t0 = time.perf_counter()
    ms = timeit(lambda: tailj(feats, tscores, fg, tbox))
    print(f"tail only:      {ms:7.2f} ms  (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
