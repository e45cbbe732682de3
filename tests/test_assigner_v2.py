"""HeuristicPositiveSampleAssigner_v2 value parity vs the reference torch
implementation (reference yolo/utils/tal.py:355-474 — dormant there, ported
for component completeness; quirks like the unmasked top-k count and the
dynamic-threshold score rescale must match bit-for-bit semantics)."""
import numpy as np
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.utils.tal import heuristic_assign_v2
from reference_harness import import_reference


def _case(rng, b=2, A=84, G=6, nc=4):
    # 2-scale-ish anchor grid in pixels
    pts = np.stack(np.meshgrid(np.arange(A // 12, dtype=np.float32) * 8 + 4,
                               np.arange(12, dtype=np.float32) * 8 + 4,
                               indexing="ij"), -1).reshape(-1, 2)[:A]
    pd_scores = rng.uniform(0.01, 0.99, (b, A, nc)).astype(np.float32)
    # predictions near their anchor with solid size: every in-gt anchor then
    # has CIoU > 0, so the top-k never ties at exactly 0 (torch's tie order
    # among equal values is unspecified and unmatchable)
    cxy = pts[None].repeat(b, 0) + rng.uniform(-3, 3, (b, A, 2))
    wh = rng.uniform(16, 48, (b, A, 2))
    pd_bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    gt_bboxes = np.zeros((b, G, 4), np.float32)
    gt_labels = np.zeros((b, G), np.int64)
    mask_gt = np.zeros((b, G), np.float32)
    for j in range(b):
        n = rng.integers(2, G)
        for g in range(n):
            cx, cy = rng.uniform(8, 56, 2)
            w, h = rng.uniform(10, 40, 2)
            gt_bboxes[j, g] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            gt_labels[j, g] = rng.integers(0, nc)
            mask_gt[j, g] = 1.0
    return pts, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_gt


def test_v2_assigner_value_parity():
    import_reference()
    from ultralytics.yolo.utils.tal import HeuristicPositiveSampleAssigner_v2

    rng = np.random.default_rng(11)
    pts, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_gt = _case(rng)
    nc = pd_scores.shape[-1]

    ref = HeuristicPositiveSampleAssigner_v2(topk=13, num_classes=nc)
    with torch.no_grad():
        tl, tb, ts, fg, tgi = ref(
            torch.from_numpy(pd_scores), torch.from_numpy(pd_bboxes),
            torch.from_numpy(pts), torch.from_numpy(gt_labels)[..., None],
            torch.from_numpy(gt_bboxes),
            torch.from_numpy(mask_gt)[..., None])

    out = heuristic_assign_v2(
        jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(pts),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
        num_classes=nc)

    fg_np = fg.numpy()
    np.testing.assert_array_equal(np.asarray(out.fg_mask), fg_np)
    np.testing.assert_array_equal(np.asarray(out.target_gt_idx)[fg_np],
                                  tgi.numpy()[fg_np])
    np.testing.assert_array_equal(np.asarray(out.target_labels)[fg_np],
                                  tl.numpy()[fg_np])
    np.testing.assert_allclose(np.asarray(out.target_bboxes)[fg_np],
                               tb.numpy()[fg_np], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.target_scores),
                               ts.numpy(), atol=2e-4)


def test_v2_assigner_no_gt_degenerates():
    rng = np.random.default_rng(3)
    pts, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_gt = _case(rng)
    mask_gt[:] = 0.0
    gt_bboxes[:] = 0.0
    out = heuristic_assign_v2(
        jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(pts),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
        num_classes=pd_scores.shape[-1])
    assert not bool(np.asarray(out.fg_mask).any())
    assert float(np.abs(np.asarray(out.target_scores)).sum()) == 0.0
