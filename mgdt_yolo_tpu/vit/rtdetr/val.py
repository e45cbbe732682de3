"""RT-DETR validation: square letterbox transforms + no-NMS query
postprocess + mAP accumulation (reference vit/rtdetr/val.py:19-106).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cfg import get_cfg
from ...data.augment import letterbox
from ...utils import LOGGER
from ...utils.metrics import DetMetrics, match_predictions


def square_letterbox(img: np.ndarray, imgsz: int):
    """scaleup square letterbox, returns (rgb float 0-1, meta)."""
    out, ratio, pad = letterbox(img, (imgsz, imgsz), scaleup=True)
    return out[..., ::-1].astype(np.float32) / 255.0, \
        {"ori_shape": img.shape[:2], "ratio_pad": (ratio, pad)}


def postprocess_queries(bboxes_norm: np.ndarray, scores: np.ndarray,
                        conf: float = 0.001):
    """Top-query filtering (val.py:90-106): no NMS, just score threshold."""
    from ...ops.boxes import xywh2xyxy
    bb = np.asarray(xywh2xyxy(bboxes_norm))
    cls = scores.argmax(-1)
    val = scores.max(-1)
    keep = val > conf
    return np.concatenate([bb[keep], val[keep, None],
                           cls[keep, None].astype(np.float32)], axis=1)


class RTDETRValidator:
    """mAP over the decoder's final-layer queries — DETR models skip NMS."""

    def __init__(self, args=None):
        self.args = args if args is not None and hasattr(args, "imgsz") \
            else get_cfg(args)
        self.iouv = np.linspace(0.5, 0.95, 10)

    def __call__(self, model_holder, variables=None, dataset=None,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        args = self.args
        variables = variables or model_holder.variables
        conf = args.conf if args.conf else 0.001
        from ...data.build import build_dataloader
        if dataset is None:
            from ...engine.trainer import BaseTrainer
            t = BaseTrainer(overrides={**vars(args), "mode": "val"})
            t.model_holder = model_holder
            dataset = t.get_dataset(train=False)
        loader = build_dataloader(dataset, args.batch, args.imgsz, train=False,
                                  seed=args.seed)

        @jax.jit
        def infer(vs, img):
            if jnp.issubdtype(img.dtype, jnp.integer):
                img = img.astype(jnp.float32) / 255.0
            (out, _) = model_holder.model.apply(vs, img, train=False)
            dec_bboxes, dec_scores = out[0], out[1]
            return dec_bboxes[-1], dec_scores[-1]

        from ...engine.validator import sharded_val_runner
        run_infer = sharded_val_runner(infer, variables, args.batch)
        metrics = DetMetrics()
        n_img = 0
        for bi, batch in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            bboxes, scores = run_infer(batch)
            for j in range(len(bboxes)):
                det = postprocess_queries(bboxes[j], np.asarray(scores[j]), conf)
                det[:, :4] *= args.imgsz  # normalized -> letterboxed pixels
                gm = batch["mask_gt"][j]
                gt_boxes = np.asarray(batch["gt_bboxes"][j][gm])
                gt_cls = np.asarray(batch["gt_labels"][j][gm]).astype(float)
                tp = match_predictions(det[:, :4], det[:, 5], gt_boxes, gt_cls,
                                       self.iouv)
                metrics.update(tp, det[:, 4], det[:, 5], gt_cls)
                n_img += 1
        res = metrics.process()
        LOGGER.info(f"rtdetr val: {n_img} imgs  mAP50 {res['map50']:.3f} "
                    f"mAP50-95 {res['map']:.3f}")
        return res
