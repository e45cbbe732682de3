"""Knock out loss terms inside the real fwd+loss program to find the hog.

Isolated microbenches (tools/profile_loss_tail.py) say the loss parts sum to
~10 ms device time at b32, but fwd+loss - fwd = 34 ms — the cost only shows
up composed with the conv stack (layout/fusion interaction). Timing the full
program with one term zeroed at a time cancels all per-call overheads and
attributes the in-context cost.

Usage: python tools/profile_loss_knockout.py [batch]
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


def main(batch=32, imgsz=640):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.ops.boxes import (bbox2dist, bbox_iou, dist2bbox,
                                         make_anchors)
    from mgdt_yolo_tpu.utils.loss import DetectionLoss, _bce_logits, _df_loss
    from mgdt_yolo_tpu.utils.tal import heuristic_assign_v1

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    crit = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
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
    step = jnp.int32(0)

    def loss_body(feats, use=("assign", "cls", "box", "dfl"), flat_only=False):
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, crit.no) for f in feats],
                               axis=1)
        if flat_only:
            return flat.astype(jnp.float32).sum()
        pred_distri = flat[..., :crit.reg_max * 4]
        pred_scores = flat[..., crit.reg_max * 4:]
        shapes = [f.shape[1:3] for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, crit.strides, 0.5)
        pred_bboxes = crit._bbox_decode(anchor_points, pred_distri)
        if "assign" in use:
            assign = heuristic_assign_v1(
                jax.lax.stop_gradient(
                    jax.nn.sigmoid(pred_scores.astype(jnp.float32))),
                jax.lax.stop_gradient(
                    pred_bboxes * stride_tensor).astype(bboxes.dtype),
                anchor_points * stride_tensor, labels, bboxes, mask,
                step, num_classes=crit.nc, epoch_num=crit.epoch_num,
                topk=crit.tal_topk, beta=crit.tal_beta)
            target_scores = assign.target_scores
            fg = assign.fg_mask
            target_bboxes = assign.target_bboxes / stride_tensor
        else:  # mock targets with the right shapes (no assigner in graph)
            A = pred_scores.shape[1]
            target_scores = jnp.zeros_like(pred_scores) + 0.01
            fg = jnp.zeros((b, A), bool).at[:, ::200].set(True)
            target_bboxes = jax.lax.stop_gradient(pred_bboxes) * 0.9
        tss = jnp.maximum(target_scores.sum(), 1.0)
        total = jnp.zeros(())
        weight = target_scores.sum(-1) * fg
        if "cls" in use:
            total += _bce_logits(pred_scores, target_scores).sum() / tss
        if "box" in use:
            iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False,
                           CIoU=True).squeeze(-1)
            total += ((1.0 - iou) * weight).sum() / tss
        if "dfl" in use:
            tl = bbox2dist(anchor_points, target_bboxes, crit.reg_max - 1)
            dist = pred_distri.reshape(b, -1, 4, crit.reg_max)
            total += (_df_loss(dist, tl) * weight).sum() / tss
        return total

    variants = [
        ("fwd only", None),
        ("flat only", "FLAT"),
        ("full", ("assign", "cls", "box", "dfl")),
        ("no dfl", ("assign", "cls", "box")),
        ("no cls", ("assign", "box", "dfl")),
        ("no box", ("assign", "cls", "dfl")),
        ("no assign", ("cls", "box", "dfl")),
        ("assign only", ("assign",)),
    ]
    sel = [int(i) for i in sys.argv[2].split(",")] if len(sys.argv) > 2 \
        else list(range(len(variants)))
    base = None
    for vi, (name, use) in enumerate(variants):
        if vi not in sel and vi != 0:
            continue
        if use is None:
            def prog(img=img):
                out, _ = mh.model.apply({"params": params, "batch_stats": bs},
                                        img, train=True,
                                        mutable=["batch_stats"])
                return [f.astype(jnp.float32).sum() for f in out[1]]
            f = jax.jit(prog)
        else:
            flat_only = use == "FLAT"
            uset = () if flat_only else use

            def prog(img=img, uset=uset, flat_only=flat_only):
                out, _ = mh.model.apply({"params": params, "batch_stats": bs},
                                        img, train=True,
                                        mutable=["batch_stats"])
                return loss_body(out[1], use=uset, flat_only=flat_only)
            f = jax.jit(prog)
        t0 = time.perf_counter()
        ms = timeit(f)
        extra = f"  (vs fwd {ms - base:+.1f} ms)" if base is not None else ""
        if base is None:
            base = ms
        print(f"{name:12s} {ms:7.1f} ms  (compile {time.perf_counter()-t0:.0f}s)"
              f"{extra}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
