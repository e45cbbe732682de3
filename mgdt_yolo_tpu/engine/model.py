"""The `YOLO` facade: one object driving train/val/predict/export/track.

Same public surface as reference yolo/engine/model.py:32-474 (TASK_MAP
dispatch, override cascade default < ckpt args < kwargs), re-implemented over
the TPU engine. Model sources: architecture YAMLs (from the package model zoo
or a path) and orbax checkpoint dirs saved by the trainer; torch .pt
checkpoints import through utils/torch_import (non-strict, like the
reference's transfer loading).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from ..cfg import get_cfg
from ..nn.tasks import DetectionModel, guess_model_task
from ..utils import DEFAULT_CFG_DICT, LOGGER
from .predictor import DetectionPredictor
from .trainer import DetectionTrainer
from .validator import DetectionValidator

def _classify_entry():
    from ..nn.tasks import ClassificationModel
    from .classify import (ClassificationPredictor, ClassificationTrainer,
                           ClassificationValidator)
    return [ClassificationModel, ClassificationTrainer, ClassificationValidator,
            ClassificationPredictor]


TASK_MAP: Dict[str, list] = {
    "detect": [DetectionModel, DetectionTrainer, DetectionValidator,
               DetectionPredictor],
}
TASK_MAP["classify"] = _classify_entry()


def _register_seg_pose():
    from ..nn.tasks import PoseModel, SegmentationModel
    from .trainer import PoseTrainer, SegmentationTrainer
    from .validator_seg_pose import PoseValidator, SegmentationValidator
    TASK_MAP["segment"] = [SegmentationModel, SegmentationTrainer,
                           SegmentationValidator, DetectionPredictor]
    TASK_MAP["pose"] = [PoseModel, PoseTrainer, PoseValidator,
                        DetectionPredictor]


_register_seg_pose()


class YOLO:
    """YOLO model facade (reference engine/model.py:32)."""

    def __init__(self, model: Union[str, Path] = "yolov8n.yaml",
                 task: Optional[str] = None):
        self.predictor = None
        self.overrides: Dict[str, Any] = {}
        self.ckpt = None
        model = str(model)
        self.task = task or guess_model_task(model)
        if model.endswith((".yaml", ".yml")):
            self._new(model)
        else:
            self._load(model)

    def _new(self, cfg: str):
        self.cfg = cfg
        self.model = TASK_MAP[self.task][0](cfg)
        self.overrides["model"] = cfg
        self.overrides["task"] = self.task

    def _load(self, weights: str):
        p = Path(weights)
        if p.is_dir():  # orbax checkpoint dir saved by our trainer
            import json
            meta_file = p.parent / f"{p.name}.json"
            from .trainer import BaseTrainer
            ckpt = BaseTrainer.load_checkpoint(p)
            train_args = {}
            sem = None
            if meta_file.is_file():
                meta = json.loads(meta_file.read_text())
                train_args = meta.get("train_args", {})
                # serve (and fine-tune) with the DCNv2 semantics the weights
                # were trained under — the windowed TPU kernel and the
                # unbounded exact path are NOT interchangeable on a trained
                # checkpoint (measured mAP50-95 0.619 vs 0.362; README
                # results table). Per-model pin: other models in this
                # process keep theirs.
                sem = meta.get("deform_semantics")
            cfg = train_args.get("model") or "yolov8n.yaml"
            self.model = TASK_MAP[self.task][0](cfg)
            if sem in ("exact", "windowed"):
                self.model.set_deform_semantics(sem)
            # prefer EMA weights like the reference (tasks.py:581)
            params = ckpt.get("ema_params") or ckpt["params"]
            self.model.variables = {"params": params,
                                    "batch_stats": ckpt.get("batch_stats", {})}
            self.ckpt = ckpt
            self.overrides["model"] = cfg
        elif weights.endswith(".npz"):
            # the framework's own exported artifact (Exporter.export_npz):
            # rebuild a live model from weights + metadata, like the
            # reference facade accepting its exported formats
            # (yolo/engine/model.py:104 via nn/autobackend.py:41); the
            # metadata's deform_semantics pins the DCNv2 dispatch
            from ..nn.autobackend import load_npz_model
            self.model, meta = load_npz_model(weights)
            self.overrides["model"] = meta.get("model_yaml")
        elif weights.endswith(".pt"):
            from ..utils.torch_import import load_torch_pt, load_torch_state_dict
            sd, train_args = load_torch_pt(weights)
            cfg = train_args.get("model") or "yolov8n.yaml"
            self.model = TASK_MAP[self.task][0](cfg)
            # reference checkpoints are trained with unbounded mmcv DCNv2
            # (/root/reference/nn/modules/block.py:17); the windowed TPU
            # kernel costs them ~0.05 mAP50-95 (measured, README results
            # table) — pin the exact path for eval AND fine-tuning (the
            # trainer honors the pin: offsets already past a tap's reach
            # get zero offset-gradient under the windowed VJP and could
            # never recover; set_deform_semantics('windowed') opts out)
            self.model.set_deform_semantics("exact")
            self.model.variables, report = load_torch_state_dict(
                self.model.variables, sd)
            self.overrides["model"] = cfg
        else:
            raise FileNotFoundError(f"cannot load model from {weights!r}")

    # ---- modes -----------------------------------------------------------
    def train(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        trainer = TASK_MAP[self.task][1](overrides=overrides, model=self.model)
        metrics = trainer.train()
        self.trainer = trainer
        if hasattr(trainer, "state"):  # adopt trained EMA weights
            import jax
            self.model.variables = {
                "params": jax.device_get(trainer.state.ema_params),
                "batch_stats": jax.device_get(trainer.state.batch_stats)}
            # downstream val/predict on THIS model must use the DCNv2
            # semantics the weights were just trained under (the trainer
            # resolved + recorded it in the checkpoint sidecars)
            from ..ops.deform import training_semantics
            self.model.set_deform_semantics(
                training_semantics(self.model.deform_semantics))
        return metrics

    def val(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "val"}
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        validator = TASK_MAP[self.task][2](args=args)
        dataset = None
        if kwargs.get("dataset") is not None:
            dataset = kwargs["dataset"]
        return validator(self.model, dataset=dataset)

    def predict(self, source, stream: bool = False, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "predict"}
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        if self.predictor is None or kwargs:
            self.predictor = TASK_MAP[self.task][3](args)
            self.predictor.setup_model(self.model)
        return self.predictor(source, stream=stream)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def serve(self, **kwargs):
        """Start a micro-batching inference server on this model — the
        latency-sensitive deployment path (engine/serve.py; no reference
        analog: its latency harness is per-image torch calls,
        nn/standard_cal_inference_time.py:9-70)."""
        from .serve import InferenceServer
        return InferenceServer(self.model, **kwargs).start()

    def track(self, source, **kwargs):
        from ..tracker.track import register_tracker
        kwargs.setdefault("conf", 0.1)
        overrides = {**self.overrides, **kwargs, "mode": "track"}
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        self.predictor = TASK_MAP[self.task][3](args)
        self.predictor.setup_model(self.model)
        register_tracker(self.predictor, persist=False)
        return self.predictor(source, stream=kwargs.get("stream", False),
                              batch=kwargs.get("batch", 1))

    def export(self, **kwargs):
        from .exporter import Exporter
        overrides = {**self.overrides, **kwargs, "mode": "export"}
        args = get_cfg(DEFAULT_CFG_DICT, {k: v for k, v in overrides.items()
                                          if k in DEFAULT_CFG_DICT})
        return Exporter(args)(self.model)

    def benchmark(self, **kwargs):
        from ..utils.benchmarks import benchmark
        return benchmark(self, **kwargs)

    def tune(self, data: str = "synthetic", space: Optional[Dict] = None,
             grace_period: int = 10, max_samples: int = 10,
             train_args: Optional[Dict] = None, **kwargs):
        """Hyperparameter tuning (reference YOLO.tune, model.py:391-474):
        Ray Tune ASHA when ray is installed, else the built-in seeded
        random search over the same space."""
        from ..utils.tuner import run_ray_tune
        return run_ray_tune(self, data=data, space=space,
                            grace_period=grace_period,
                            max_samples=max_samples, train_args=train_args,
                            **kwargs)

    # ---- info ------------------------------------------------------------
    @property
    def names(self):
        return self.model.names

    def info(self):
        return self.model.info()

    def load(self, weights: str):
        """Warm-start from another checkpoint (non-strict intersect)."""
        other = YOLO(weights, task=self.task)
        from ..utils.torch_import import load_torch_state_dict  # noqa: F401
        import jax
        import numpy as _np

        def merge(dst, src):
            for k, v in src.items():
                if k in dst:
                    if isinstance(v, dict):
                        merge(dst[k], v)
                    elif _np.shape(dst[k]) == _np.shape(v):
                        dst[k] = v
        merge(self.model.variables["params"], other.model.variables["params"])
        return self
