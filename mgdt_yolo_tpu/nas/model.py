"""YOLO-NAS model interface (reference yolo/nas/model.py:26-133).

`NAS` wraps a Deci `super_gradients` YOLO-NAS detection model — an external
torch model family that is *consumed*, never trained (reference
model.py:85-87 raises on .train()). The wrapper standardizes it to the
framework surface: predict -> NASPredictor (+ class-offset NMS), val ->
NASValidator over the shared metric pipeline, info -> parameter/layer
summary.

Import gating matches the reference exactly: `super_gradients` is imported
inside __init__ (reference model.py:30), so environments without it (this
one included) fail with a clear ImportError only when a NAS model is
actually constructed; everything downstream of the raw (boxes, scores)
output is package-independent and unit-tested with fakes
(tests/test_nas.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..cfg import get_cfg
from ..utils import DEFAULT_CFG_DICT, LOGGER
from .predict import NASPredictor
from .val import NASModelHolder, NASValidator


def _torch_raw_fn(torch_model):
    """Wrap a torch YOLO-NAS module as `f(NCHW float32) -> raw outputs`."""
    import torch

    def raw_fn(x: np.ndarray):
        with torch.no_grad():
            out = torch_model(torch.from_numpy(np.ascontiguousarray(x)))
        return [[np.asarray(t.detach().cpu()) for t in out[0]]] + list(out[1:])

    return raw_fn


class NAS:
    """YOLO-NAS facade (reference model.py:26).

    Usage:
        model = NAS('yolo_nas_s')          # super_gradients COCO weights
        results = model.predict('img.jpg')
    """

    def __init__(self, model: str = "yolo_nas_s.pt") -> None:
        import super_gradients  # gated exactly like the reference (line 30)

        self.predictor: Optional[NASPredictor] = None
        self.task = "detect"
        suffix = Path(model).suffix
        if suffix == ".pt":
            import torch
            self.model = torch.load(model, weights_only=False)
        elif suffix == "":
            self.model = super_gradients.training.models.get(
                model, pretrained_weights="coco")
        self.model.eval()
        self.args = dict(DEFAULT_CFG_DICT)  # reference model.py:43
        self.names: Dict[int, str] = dict(
            enumerate(getattr(self.model, "_class_names", [])))
        self.stride = [32]
        self.info()

    def _raw_fn(self):
        return _torch_raw_fn(self.model)

    def predict(self, source=None, stream: bool = False, **kwargs):
        """Predict via NASPredictor (reference model.py:55-80)."""
        if source is None:
            raise ValueError("NAS.predict needs a source (reference defaults "
                             "to a hub download URL — zero-egress here)")
        overrides = {"conf": 0.25, "task": "detect", "mode": "predict"}
        overrides.update(kwargs)
        if not self.predictor:
            self.predictor = NASPredictor(overrides=overrides)
            self.predictor.setup_model(self._raw_fn(), self.names)
        else:
            self.predictor.args = get_cfg(self.predictor.args, overrides)
        return self.predictor(source, stream=stream)

    def train(self, **kwargs):
        """NAS models are inference-only (reference model.py:85-87)."""
        raise NotImplementedError("NAS models don't support training")

    def val(self, **kwargs):
        """Validate on a dataset through the shared metric pipeline
        (reference model.py:89-97)."""
        overrides = {"task": "detect", "mode": "val"}
        overrides.update(kwargs)
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        validator = NASValidator(args=args)
        holder = NASModelHolder(self._raw_fn(), self.names,
                                nc=len(self.names) or None)
        self.metrics = validator(holder)
        return self.metrics

    def export(self, **kwargs):
        """The reference exports the torch module through its torch
        Exporter (model.py:99-114); this framework's Exporter serializes
        jax/flax models, which an external torch NAS module is not."""
        raise NotImplementedError(
            "NAS export is not supported: the exporter serializes jax "
            "models; YOLO-NAS modules live in torch/super_gradients")

    def info(self, detailed: bool = False, verbose: bool = True):
        """Parameter/layer summary (reference model.py:116-124)."""
        n_p = sum(int(np.prod(p.shape)) for p in self.model.parameters())
        n_l = sum(1 for _ in self.model.modules())
        if verbose:
            LOGGER.info(f"YOLO-NAS summary: {n_l} layers, {n_p} parameters")
        return {"layers": n_l, "parameters": n_p}

    def __call__(self, source=None, stream: bool = False, **kwargs):
        return self.predict(source, stream, **kwargs)
