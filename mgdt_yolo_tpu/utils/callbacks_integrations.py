"""Logger integrations for the callback bus.

The reference ships 9 integrations (tensorboard/wandb/comet/clearml/dvc/
mlflow/neptune/raytune/hub — yolo/utils/callbacks/, 1548 LoC); none of those
services exist in this offline environment. What's provided:
- JsonlLogger: always-on structured metrics stream (events.jsonl per run).
- TensorBoardLogger: activates when `tensorboard`/`tensorflow` is importable,
  mirroring the reference's scalar writer (callbacks/tensorboard.py:15-47).
Third-party loggers register the same way via trainer.add_callback.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

from . import LOGGER


class JsonlLogger:
    """Writes one JSON line per epoch: losses + val metrics."""

    def __init__(self):
        self.file = None

    def attach(self, trainer):
        trainer.add_callback("on_pretrain_routine_start", self._start)
        trainer.add_callback("on_fit_epoch_end", self._epoch)
        trainer.add_callback("on_train_end", self._end)

    def _start(self, trainer):
        self.file = Path(trainer.save_dir) / "events.jsonl"
        self.file.parent.mkdir(parents=True, exist_ok=True)

    def _epoch(self, trainer):
        if self.file is None:
            return
        row = {"t": time.time(), "epoch": getattr(trainer, "epoch", -1),
               **{k: float(v) for k, v in getattr(trainer, "loss_items", {}).items()},
               **{k: float(v) for k, v in getattr(trainer, "metrics", {}).items()
                  if isinstance(v, (int, float))}}
        with open(self.file, "a") as f:
            f.write(json.dumps(row) + "\n")

    def _end(self, trainer):
        LOGGER.info(f"metrics stream: {self.file}")


class TensorBoardLogger:
    """Scalar writer when a TB backend is available (gated)."""

    def __init__(self):
        self.writer = None

    def attach(self, trainer):
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa: F401
        except ImportError:
            try:
                from tensorboardX import SummaryWriter  # noqa: F401
            except ImportError:
                LOGGER.info("tensorboard writer unavailable; JSONL logging only")
                return
        self._SummaryWriter = SummaryWriter
        trainer.add_callback("on_pretrain_routine_start", self._start)
        trainer.add_callback("on_fit_epoch_end", self._epoch)

    def _start(self, trainer):
        self.writer = self._SummaryWriter(str(trainer.save_dir))

    def _epoch(self, trainer):
        if self.writer is None:
            return
        step = getattr(trainer, "epoch", 0)
        for k, v in getattr(trainer, "loss_items", {}).items():
            self.writer.add_scalar(f"train/{k}", float(v), step)
        for k, v in getattr(trainer, "metrics", {}).items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(f"val/{k}", float(v), step)


def add_integration_callbacks(trainer):
    """Attach every available integration (reference callbacks/base.py:191-212)."""
    JsonlLogger().attach(trainer)
    TensorBoardLogger().attach(trainer)
