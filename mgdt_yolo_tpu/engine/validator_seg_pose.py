"""Segment and pose validators: mask-IoU and OKS true-positive matching.

Reference yolo/v8/segment/val.py (mask-IoU TPs) and yolo/v8/pose/val.py
(OKS TPs at the 10 COCO thresholds). The device side reuses the detect
forward+NMS; masks are assembled from prototypes for the kept detections
and keypoints are sliced from the decoded tail channels, then matched on
host like the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.metrics import DetMetrics, box_iou_numpy, match_predictions
from .validator import BaseValidator, DetectionValidator


def mask_iou_matrix(gt_masks: np.ndarray, pred_masks: np.ndarray,
                    eps: float = 1e-7) -> np.ndarray:
    """(G, H, W) x (N, H, W) binary -> (G, N) IoU (reference metrics.py:131)."""
    g = gt_masks.reshape(len(gt_masks), -1).astype(np.float32)
    p = pred_masks.reshape(len(pred_masks), -1).astype(np.float32)
    inter = g @ p.T
    union = g.sum(1)[:, None] + p.sum(1)[None] - inter
    return inter / (union + eps)


def kpt_oks_matrix(gt_kpts: np.ndarray, pred_kpts: np.ndarray, areas: np.ndarray,
                   sigmas: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(G, K, 3) x (N, K, 2|3) -> (G, N) OKS (reference metrics.py:150)."""
    d2 = ((gt_kpts[:, None, :, 0] - pred_kpts[None, :, :, 0]) ** 2 +
          (gt_kpts[:, None, :, 1] - pred_kpts[None, :, :, 1]) ** 2)
    vis = (gt_kpts[..., 2] > 0)[:, None]  # (G, 1, K) broadcast
    e = d2 / (2 * sigmas[None, None]) ** 2 / (areas[:, None, None] + eps) / 2
    oks = (np.exp(-e) * vis).sum(-1) / (vis.sum(-1) + eps)
    return oks


def _match_by_matrix(sim: np.ndarray, gt_cls, pred_cls, thresholds) -> np.ndarray:
    """Greedy unique matching over an arbitrary similarity matrix (the
    _process_batch core, val.py:152-175, parameterized by sim instead of IoU)."""
    n_pred = sim.shape[1]
    tp = np.zeros((n_pred, len(thresholds)), bool)
    sim = sim * (np.asarray(gt_cls)[:, None] == np.asarray(pred_cls)[None, :])
    for t, thr in enumerate(thresholds):
        gi, pi = np.nonzero(sim >= thr)
        if gi.size:
            order = sim[gi, pi].argsort()[::-1]
            m = np.stack([gi, pi], 1)[order]
            m = m[np.unique(m[:, 1], return_index=True)[1]]
            m = m[np.unique(m[:, 0], return_index=True)[1]]
            tp[m[:, 1], t] = True
    return tp


class SegmentationValidator(BaseValidator):
    """Box mAP + mask mAP over prototype-assembled masks."""

    def __init__(self, args=None, dataloader=None):
        super().__init__(args, dataloader)
        self.iouv = np.linspace(0.5, 0.95, 10)

    def __call__(self, model_holder, variables=None, dataset=None,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        args = self.args
        variables = variables or model_holder.variables
        conf = args.conf if args.conf else 0.001
        from ..data.build import build_dataloader
        if dataset is None:
            from .trainer import SegmentationTrainer
            t = SegmentationTrainer(overrides={**vars(args), "mode": "val"})
            t.model_holder = model_holder
            dataset = t.get_dataset(train=False)
        loader = self.dataloader or build_dataloader(
            dataset, args.batch, args.imgsz, train=False, seed=args.seed)
        nm = 32

        def build():
            @jax.jit
            def infer(vs, img):
                if jnp.issubdtype(img.dtype, jnp.integer):
                    img = img.astype(jnp.float32) / 255.0
                decoded, aux = model_holder.model.apply(vs, img, train=False)
                _, mc_flat, proto = aux
                det, cnt, idx = non_max_suppression(decoded, conf_thres=conf,
                                                    iou_thres=args.iou,
                                                    max_det=args.max_det,
                                                    multi_label=True,
                                                    nc=model_holder.nc,
                                                    return_idx=True)
                # exact mask coefficients for each kept detection
                coefs = jnp.take_along_axis(mc_flat,
                                            jnp.clip(idx, 0)[..., None],
                                            axis=1)
                return det, cnt, coefs, proto
            return infer

        from .validator import sharded_val_runner
        run_infer = sharded_val_runner(self.cached_infer(model_holder, build),
                                       variables, args.batch)
        box_m, mask_m = DetMetrics(), DetMetrics()
        n_img = 0
        for bi, batch in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            det, cnt, coefs_all, proto = run_infer(batch)
            for j in range(len(det)):
                n = int(cnt[j])
                d = np.asarray(det[j][:n])
                gt_mask_planes = np.asarray(batch["masks"][j])  # (G, mh, mw)
                gm = batch["mask_gt"][j]
                gt_boxes = np.asarray(batch["gt_bboxes"][j][gm])
                gt_cls = np.asarray(batch["gt_labels"][j][gm]).astype(float)
                gt_masks = gt_mask_planes[gm] > 0.5
                tp_box = match_predictions(d[:, :4], d[:, 5], gt_boxes, gt_cls,
                                           self.iouv)
                box_m.update(tp_box, d[:, 4], d[:, 5], gt_cls)
                # assemble pred masks at proto res for kept detections
                if n and len(gt_masks):
                    ph, pw = proto.shape[1:3]
                    coefs = np.asarray(coefs_all[j][:n])  # (n, nm) exact
                    pm = 1 / (1 + np.exp(-(np.asarray(proto[j]).reshape(-1, nm)
                                           @ coefs.T)))
                    pm = pm.T.reshape(n, ph, pw) > 0.5
                    import cv2
                    gt_rs = np.stack([cv2.resize(m.astype(np.uint8), (pw, ph),
                                                 interpolation=cv2.INTER_NEAREST)
                                      for m in gt_masks]) > 0
                    sim = mask_iou_matrix(gt_rs, pm)
                    tp_mask = _match_by_matrix(sim, gt_cls, d[:, 5], self.iouv)
                else:
                    tp_mask = np.zeros((n, 10), bool)
                mask_m.update(tp_mask, d[:, 4], d[:, 5], gt_cls)
                n_img += 1
        rb = box_m.process()
        rm = mask_m.process()
        out = {f"box_{k}": v for k, v in rb.items()}
        out.update({f"mask_{k}": v for k, v in rm.items()})
        out["fitness"] = rb["fitness"]
        LOGGER.info(f"seg val: {n_img} imgs  box mAP50 {rb['map50']:.3f}  "
                    f"mask mAP50 {rm['map50']:.3f}")
        return out


class PoseValidator(DetectionValidator):
    """Box mAP + OKS keypoint mAP (reference yolo/v8/pose/val.py:224)."""

    def __call__(self, model_holder, variables=None, dataset=None,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        args = self.args
        variables = variables or model_holder.variables
        conf = args.conf if args.conf else 0.001
        from ..data.build import build_dataloader
        if dataset is None:
            from .trainer import PoseTrainer
            t = PoseTrainer(overrides={**vars(args), "mode": "val"})
            t.model_holder = model_holder
            dataset = t.get_dataset(train=False)
        loader = build_dataloader(dataset, args.batch, args.imgsz, train=False,
                                  seed=args.seed)
        kpt_shape = tuple(model_holder.yaml.get("kpt_shape", (17, 3)))
        nk = kpt_shape[0] * kpt_shape[1]
        if kpt_shape[0] == 17:
            sigmas = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72,
                               .62, .62, 1.07, 1.07, .87, .87, .89, .89]) / 10.0
        else:
            sigmas = np.ones(kpt_shape[0]) / kpt_shape[0]

        def build():
            @jax.jit
            def infer(vs, img):
                if jnp.issubdtype(img.dtype, jnp.integer):
                    img = img.astype(jnp.float32) / 255.0
                decoded, _ = model_holder.model.apply(vs, img, train=False)
                det, cnt, idx = non_max_suppression(
                    decoded, conf_thres=conf, iou_thres=args.iou,
                    max_det=args.max_det, multi_label=True,
                    nc=model_holder.nc, return_idx=True)
                kpt_tail = jnp.transpose(decoded[:, 4 + model_holder.nc:],
                                         (0, 2, 1))  # (b, A, nk)
                kpts = jnp.take_along_axis(kpt_tail,
                                           jnp.clip(idx, 0)[..., None],
                                           axis=1)  # (b, max_det, nk)
                return det, cnt, kpts
            return infer

        from .validator import sharded_val_runner
        run_infer = sharded_val_runner(self.cached_infer(model_holder, build),
                                       variables, args.batch)
        box_m, kpt_m = DetMetrics(), DetMetrics()
        iouv = np.linspace(0.5, 0.95, 10)
        n_img = 0
        for batch in loader:
            det, cnt, kpts_all = run_infer(batch)
            for j in range(len(det)):
                n = int(cnt[j])
                d = np.asarray(det[j][:n])
                gm = batch["mask_gt"][j]
                gt_boxes = np.asarray(batch["gt_bboxes"][j][gm])
                gt_cls = np.asarray(batch["gt_labels"][j][gm]).astype(float)
                gt_k = np.asarray(batch["keypoints"][j][gm])
                tp_box = match_predictions(d[:, :4], d[:, 5], gt_boxes, gt_cls,
                                           iouv)
                box_m.update(tp_box, d[:, 4], d[:, 5], gt_cls)
                if n and len(gt_k):
                    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0]) *
                             (gt_boxes[:, 3] - gt_boxes[:, 1]))
                    pk = np.asarray(kpts_all[j][:n]).reshape(n, *kpt_shape)
                    sim = kpt_oks_matrix(gt_k, pk, areas, sigmas)
                    tp_k = _match_by_matrix(sim, gt_cls, d[:, 5], iouv)
                else:
                    tp_k = np.zeros((n, 10), bool)
                kpt_m.update(tp_k, d[:, 4], d[:, 5], gt_cls)
                n_img += 1
        rb = box_m.process()
        rk = kpt_m.process()
        out = {f"box_{k}": v for k, v in rb.items()}
        out.update({f"kpt_{k}": v for k, v in rk.items()})
        out["fitness"] = rb["fitness"]
        LOGGER.info(f"pose val: {n_img} imgs  box mAP50 {rb['map50']:.3f}  "
                    f"kpt mAP50 {rk['map50']:.3f}")
        return out
