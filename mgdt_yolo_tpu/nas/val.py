"""NAS validator (reference yolo/nas/val.py:13-25).

Identical metric pipeline to DetectionValidator; only the raw-output
adapter differs: YOLO-NAS emits (xyxy boxes, class scores) pairs, and the
reference's NAS val NMS runs with multi_label=False and
agnostic=args.single_cls (val.py:19-24) — unlike the v8 val protocol's
multi_label=True.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ..engine.validator import DetectionValidator
from .predict import nas_postprocess


class NASModelHolder:
    """Adapter giving a host-side NAS callable the model-holder surface the
    validator reads (stride/nc/names/variables)."""

    def __init__(self, raw_fn: Callable, names: Optional[Dict] = None,
                 nc: Optional[int] = None):
        self.raw_fn = raw_fn
        self.names = names or {}
        self.nc = nc if nc is not None else max(len(self.names), 1)
        self.stride = [32]  # reference nas/model.py:42
        self.variables = {}


class NASValidator(DetectionValidator):
    def cached_infer(self, model_holder, build):
        """Host-side infer: the NAS model runs outside jit (external torch
        module); only the postprocess NMS is jitted. Replaces the jitted
        flax apply the base build() would produce."""
        if self._infer is None or self._infer_mh is not model_holder:
            args = self.args
            conf = args.conf if args.conf else 0.001
            agnostic = bool(getattr(args, "single_cls", False))

            def infer(_vs, img):
                x = np.asarray(img)
                if np.issubdtype(x.dtype, np.integer):
                    x = x.astype(np.float32) / 255.0
                raw = model_holder.raw_fn(np.transpose(x, (0, 3, 1, 2)))
                return nas_postprocess(raw, conf=conf, iou=args.iou,
                                       max_det=args.max_det,
                                       agnostic=agnostic, multi_label=False,
                                       pre_topk=4096)

            self._infer = infer
            self._infer_mh = model_holder
        return self._infer
