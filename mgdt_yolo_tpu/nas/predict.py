"""NAS predictor: raw (boxes, scores) -> NMS -> Results.

Reference yolo/nas/predict.py:12-35: YOLO-NAS heads emit decoded xyxy boxes
and per-class scores as separate tensors (no objectness, no in-model NMS);
the predictor concatenates them into the standard (B, 4+nc, A) layout —
boxes converted back to xywh because the shared NMS front-end re-applies
xywh2xyxy — and runs the usual class-offset NMS.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.predictor import BasePredictor
from ..ops.boxes import xyxy2xywh
from ..ops.nms import non_max_suppression


def nas_raw_to_pred(boxes_xyxy, scores) -> jnp.ndarray:
    """(B, A, 4) xyxy boxes + (B, A, nc) scores -> (B, 4+nc, A) xywh-first
    prediction tensor (reference predict.py:16-17: xyxy2xywh, cat, permute)."""
    boxes = xyxy2xywh(jnp.asarray(boxes_xyxy, jnp.float32))
    pred = jnp.concatenate([boxes, jnp.asarray(scores, jnp.float32)], axis=-1)
    return jnp.transpose(pred, (0, 2, 1))


def nas_postprocess(preds_in: Tuple, conf: float = 0.25, iou: float = 0.45,
                    max_det: int = 300, agnostic: bool = False,
                    multi_label: bool = False, pre_topk: int = 1024):
    """NMS over raw NAS outputs.

    Args:
        preds_in: the model's raw output — ``preds_in[0]`` is the
            (boxes_xyxy, class_scores) pair (reference predict.py:16).
    Returns:
        (det (B, max_det, 6), counts (B,)) in the framework's padded
        fixed-shape NMS convention.
    """
    boxes, scores = preds_in[0][0], preds_in[0][1]
    return non_max_suppression(nas_raw_to_pred(boxes, scores),
                               conf_thres=conf, iou_thres=iou,
                               max_det=max_det, agnostic=agnostic,
                               multi_label=multi_label, pre_topk=pre_topk)


class _NamesHolder:
    """Minimal model_holder shim for the streaming loop (names + stride)."""

    def __init__(self, names: Dict[int, str]):
        self.names = names
        self.stride = [32]  # reference model.py:42


class NASPredictor(BasePredictor):
    """BasePredictor over a host-side (e.g. torch) YOLO-NAS callable.

    The NAS model runs outside the jit boundary (it is an external torch
    module, reference model.py:40); only the postprocess NMS rides XLA.
    `setup_model` therefore wraps ``raw_fn`` — any callable mapping a float32
    NCHW batch in [0, 1] to the raw (boxes, scores) structure — instead of a
    flax model holder.
    """

    def setup_model(self, raw_fn: Callable, names: Optional[Dict] = None):
        self.model_holder = _NamesHolder(names or {})
        self.variables = None
        self._mesh_ndev = 0  # host-side model: no SPMD batch sharding
        conf = self.args.conf if self.args.conf else 0.25
        iou = self.args.iou
        max_det = self.args.max_det
        agnostic = bool(self.args.agnostic_nms)

        def infer(_vs, img):
            x = np.asarray(img, np.float32)
            if np.issubdtype(x.dtype, np.integer):
                x = x.astype(np.float32) / 255.0
            raw = raw_fn(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW host
            det, counts = nas_postprocess(raw, conf=conf, iou=iou,
                                          max_det=max_det, agnostic=agnostic)
            return jax.device_get((det, counts))

        self._infer = infer
