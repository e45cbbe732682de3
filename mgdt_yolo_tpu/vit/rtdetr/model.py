"""RTDETR facade mirroring the YOLO API (reference vit/rtdetr/model.py:22-171)."""
from __future__ import annotations

from typing import Optional

from ...nn.tasks import DetectionModel
from ...cfg import get_cfg
from ...utils import DEFAULT_CFG_DICT
from .predict import RTDETRPredictor


class RTDETR:
    def __init__(self, model: str = "yolov8-rtdetr.yaml", task: str = "detect"):
        self.task = task
        self.predictor: Optional[RTDETRPredictor] = None
        self.model = DetectionModel(str(model))
        self.overrides = {"model": str(model), "task": task}

    def predict(self, source, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "predict"}
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        if self.predictor is None or kwargs:
            self.predictor = RTDETRPredictor(args)
            self.predictor.setup_model(self.model)
        return self.predictor(source)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    @property
    def names(self):
        return self.model.names

    def info(self):
        return self.model.info()
