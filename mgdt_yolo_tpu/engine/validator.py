"""Validation engine: jitted forward+NMS, host-side mAP accumulation.

Reference yolo/engine/validator.py:38-276 + yolo/v8/detect/val.py:19-278,
re-shaped for TPU: the model forward, DFL decode and batched NMS run as one
jit-compiled program per (static) batch shape; only the fixed-size (max_det,6)
detection tensors come back to host, where boxes are unletterboxed and fed to
the numpy ap_per_class pipeline (val NMS settings conf=0.001 iou=0.7
multi_label, val.py:63-71).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.build import build_dataloader
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.callbacks import CallbackMixin
from ..utils.metrics import ConfusionMatrix, DetMetrics, counting_agreement, match_predictions


class BaseValidator(CallbackMixin):
    def __init__(self, args=None, dataloader=None):
        self.args = args if args is not None else get_cfg()
        self.dataloader = dataloader
        self.init_callbacks()


class DetectionValidator(BaseValidator):
    def __init__(self, args=None, dataloader=None):
        super().__init__(args, dataloader)
        self.iouv = np.linspace(0.5, 0.95, 10)

    def _plot_val_batch(self, batch, dets, counts, model_holder):
        """val_batch0_labels.jpg / val_batch0_pred.jpg (reference
        val.py plot_val_samples/plot_predictions)."""
        try:
            from pathlib import Path

            from ..utils.plotting import plot_images
            sd = getattr(self.args, "save_dir", None)
            if not sd:
                return  # no run dir to land plots in (bare validator call)
            save_dir = Path(str(sd))
            names = getattr(model_holder, "names", {}) or {}
            imgs = np.asarray(batch["img"]).astype(np.float32) / 255.0
            gt = [np.concatenate(
                [np.asarray(batch["gt_bboxes"][j][batch["mask_gt"][j]]),
                 np.ones((int(batch["mask_gt"][j].sum()), 1)),
                 np.asarray(batch["gt_labels"][j][batch["mask_gt"][j]])[:, None]],
                1) for j in range(len(imgs))]
            plot_images(imgs, gt, names, str(save_dir / "val_batch0_labels.jpg"))
            pred = [np.asarray(dets[j][:int(counts[j])]) for j in range(len(imgs))]
            plot_images(imgs, pred, names, str(save_dir / "val_batch0_pred.jpg"))
        except Exception as e:  # plotting must never kill validation
            LOGGER.warning(f"val plots failed: {e}")

    def __call__(self, model_holder, variables=None, dataset=None,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        args = self.args
        variables = variables or model_holder.variables
        conf = args.conf if args.conf else 0.001
        batch_size = args.batch
        if dataset is None:
            from .trainer import BaseTrainer
            t = BaseTrainer(overrides={**vars(args), "mode": "val"})
            t.model_holder = model_holder
            dataset = t.get_dataset(train=False)
        loader = self.dataloader or build_dataloader(
            dataset, batch_size, args.imgsz, train=False, seed=args.seed,
            rect=bool(getattr(args, "rect", False)),
            stride=int(max(model_holder.stride)))

        @partial(jax.jit, static_argnames=())
        def infer(vs, img):
            if jnp.issubdtype(img.dtype, jnp.integer):
                img = img.astype(jnp.float32) / 255.0
            decoded, _ = model_holder.model.apply(vs, img, train=False)
            # nc explicitly: segment/pose decodes append mask/kpt channels
            # val protocol: conf 0.001 + multi_label floods candidates —
            # use a deeper pre-NMS pool than the predict path (the reference
            # caps at 30k, ops.py:213); 4096 is past the dense-head tail
            return non_max_suppression(decoded, conf_thres=conf, iou_thres=args.iou,
                                       max_det=args.max_det, multi_label=True,
                                       agnostic=args.agnostic_nms,
                                       pre_topk=4096,
                                       nc=model_holder.nc)

        metrics = DetMetrics()
        cm = ConfusionMatrix(model_holder.nc)
        per_image_preds, per_image_gts = [], []
        self.run_callbacks("on_val_start")
        t0 = time.time()
        n_img = 0
        for bi, batch in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            dets, counts = jax.device_get(infer(variables, batch["img"]))
            if bi == 0 and getattr(args, "plots", False):
                self._plot_val_batch(batch, dets, counts, model_holder)
            in_shape = tuple(batch["img"].shape[1:3])  # rect: per-batch (h, w)
            metas = batch.get("metas") or [{}] * len(dets)
            for j in range(len(dets)):
                n = int(counts[j])
                det = np.asarray(dets[j][:n])  # input-space [x1,y1,x2,y2,conf,cls]
                m = metas[j] if j < len(metas) else {}
                gt_mask = batch["mask_gt"][j]
                gt_boxes = np.asarray(batch["gt_bboxes"][j][gt_mask])
                gt_cls = np.asarray(batch["gt_labels"][j][gt_mask]).astype(float)
                if m.get("ori_shape") is not None and m.get("ratio_pad"):
                    ori = m["ori_shape"]
                    det_s = det.copy()
                    det_s[:, :4] = scale_boxes(in_shape, det[:, :4],
                                               ori, m["ratio_pad"])
                    gt_s = scale_boxes(in_shape, gt_boxes.copy(), ori,
                                       m["ratio_pad"]) if len(gt_boxes) else gt_boxes
                else:
                    det_s, gt_s = det, gt_boxes
                tp = match_predictions(det_s[:, :4], det_s[:, 5], gt_s, gt_cls,
                                       self.iouv)
                metrics.update(tp, det_s[:, 4], det_s[:, 5], gt_cls)
                cm.process_batch(det_s, gt_s, gt_cls)
                per_image_preds.append(det_s)
                per_image_gts.append((gt_s, gt_cls))
                n_img += 1
        results = metrics.process()
        self.confusion_matrix = cm
        if getattr(args, "plots", False) and getattr(args, "save_dir", None):
            try:
                cm.plot(save_dir=str(args.save_dir))
            except Exception as e:
                LOGGER.warning(f"confusion-matrix plot failed: {e}")
        self.metrics = metrics
        self._per_image_preds = per_image_preds  # native-space, for parity
        self._per_image_gts = per_image_gts
        # fork counting metrics over the val set
        classes = list(range(model_holder.nc))
        self.counting_stats, self.count_r2 = counting_agreement(
            per_image_preds, per_image_gts, classes)
        dt = time.time() - t0
        results["speed_ms_per_image"] = dt / max(n_img, 1) * 1000
        LOGGER.info(
            f"val: {n_img} images  P {results['precision']:.3f} R {results['recall']:.3f} "
            f"mAP50 {results['map50']:.3f} mAP50-95 {results['map']:.3f} "
            f"({results['speed_ms_per_image']:.1f} ms/img)")
        self.run_callbacks("on_val_end")
        return results
