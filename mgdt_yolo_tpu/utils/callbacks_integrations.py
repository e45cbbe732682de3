"""Logger integrations for the callback bus.

The reference ships 9 integrations (tensorboard/wandb/comet/clearml/dvc/
mlflow/neptune/raytune/hub — yolo/utils/callbacks/, 1548 LoC); none of those
services exist in this offline environment. What's provided:
- JsonlLogger: always-on structured metrics stream (events.jsonl per run).
- TensorBoardLogger: activates when `tensorboard`/`tensorflow` is importable,
  mirroring the reference's scalar writer (callbacks/tensorboard.py:15-47).
- MlflowFileStoreLogger: fully-offline MLflow tracking (reference
  callbacks/mlflow.py:21-67) — writes the MLflow *file-store layout*
  directly, so no package or server is needed and `mlflow ui
  --backend-store-uri <dir>` on any machine with mlflow installed browses
  the runs. Activates when MLFLOW_TRACKING_URI (a local path / file: URI)
  or MGDT_MLFLOW_DIR is set; http(s) tracking servers are refused (this
  framework does no network logging).
Third-party loggers register the same way via trainer.add_callback.
"""
from __future__ import annotations

import json
import os
import time
import uuid
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


class MlflowFileStoreLogger:
    """MLflow tracking without the mlflow package: the file-store backend
    is a documented on-disk layout (one directory per experiment/run,
    `metrics/<key>` files of "timestamp value step" lines, `params/<key>`
    single-value files, YAML metas), written here directly. The reference's
    mlflow callback (callbacks/mlflow.py:21-67) logs params at pretrain,
    metrics each fit epoch, and the weight artifacts at train end — same
    hooks, same keys (slashes and parens sanitized the way mlflow does).
    """

    def __init__(self, root=None):
        uri = root or os.environ.get("MGDT_MLFLOW_DIR") or \
            os.environ.get("MLFLOW_TRACKING_URI", "")
        uri = str(uri)
        if uri.startswith(("http://", "https://")):
            LOGGER.warning("mlflow http tracking URIs are not supported "
                           "(offline file-store only) — mlflow logging off")
            uri = ""
        if uri.startswith("file:"):
            uri = uri[5:].lstrip("/") if uri.startswith("file:///") \
                else uri[5:]
            uri = ("/" + uri) if not uri.startswith("/") else uri
        self.root = Path(uri) if uri else None
        self.run_dir = None

    def attach(self, trainer):
        if self.root is None:
            return
        trainer.add_callback("on_pretrain_routine_end", self._start)
        trainer.add_callback("on_fit_epoch_end", self._epoch)
        trainer.add_callback("on_train_end", self._end)

    @staticmethod
    def _sanitize(key: str) -> str:
        # mlflow rejects '(', ')' and ':' in keys — the reference's mlflow
        # callback sanitizes the same way (mlflow.py:44)
        return key.replace("(", "").replace(")", "").replace(":", "-")

    def _write_meta(self, path: Path, meta: dict):
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:  # flat scalar YAML, no dependency needed
            for k, v in meta.items():
                f.write(f"{k}: {v}\n")

    def _start(self, trainer):
        exp_name = os.environ.get("MLFLOW_EXPERIMENT_NAME",
                                  f"/mgdt/{getattr(trainer.args, 'task', 'detect')}")
        # experiment ids are numeric strings in the file store; one stable
        # experiment directory per name
        exp_id = str(abs(hash(exp_name)) % 10 ** 9)
        exp_dir = self.root / exp_id
        if not (exp_dir / "meta.yaml").exists():
            self._write_meta(exp_dir / "meta.yaml", {
                "artifact_location": exp_dir.as_uri(),
                "experiment_id": exp_id,
                "lifecycle_stage": "active",
                "name": exp_name})
        run_id = uuid.uuid4().hex
        self.run_dir = exp_dir / run_id
        self.t0 = int(time.time() * 1000)
        run_name = str(getattr(trainer, "save_dir", "run")).rsplit("/", 1)[-1]
        for d in ("metrics", "params", "tags", "artifacts"):
            (self.run_dir / d).mkdir(parents=True, exist_ok=True)
        self._write_meta(self.run_dir / "meta.yaml", {
            "artifact_uri": (self.run_dir / "artifacts").as_uri(),
            "end_time": "null", "entry_point_name": "''",
            "experiment_id": exp_id, "lifecycle_stage": "active",
            "run_id": run_id, "run_name": run_name, "run_uuid": run_id,
            "source_name": "''", "source_type": 4, "source_version": "''",
            "start_time": self.t0, "status": 1,
            "user_id": os.environ.get("USER", "mgdt")})
        (self.run_dir / "tags" / "mlflow.runName").write_text(run_name)
        for k, v in vars(trainer.args).items():  # reference mlflow.py:43
            (self.run_dir / "params" / self._sanitize(str(k))).write_text(
                str(v))
        LOGGER.info(f"mlflow file-store run: {self.run_dir}")

    def _epoch(self, trainer):
        if self.run_dir is None:
            return
        step = int(getattr(trainer, "epoch", 0))
        ts = int(time.time() * 1000)
        rows = {**{f"train/{k}": v
                   for k, v in getattr(trainer, "loss_items", {}).items()},
                **{k: v for k, v in getattr(trainer, "metrics", {}).items()
                   if isinstance(v, (int, float))}}
        for k, v in rows.items():
            p = self.run_dir / "metrics" / self._sanitize(k)
            p.parent.mkdir(parents=True, exist_ok=True)
            with open(p, "a") as f:
                f.write(f"{ts} {float(v)} {step}\n")

    def _end(self, trainer):
        if self.run_dir is None:
            return
        # weight artifacts (reference mlflow.py:60-63 logs save_dir files)
        wdir = Path(str(getattr(trainer, "save_dir", ""))) / "weights"
        art = self.run_dir / "artifacts"
        if wdir.is_dir():
            import shutil
            for item in wdir.iterdir():
                try:
                    if item.is_dir():
                        shutil.copytree(item, art / item.name,
                                        dirs_exist_ok=True)
                    else:
                        shutil.copy2(item, art / item.name)
                except OSError as e:
                    LOGGER.warning(f"mlflow artifact copy failed: {e}")
        # finalize run meta (status 3 = FINISHED)
        meta = (self.run_dir / "meta.yaml").read_text().splitlines()
        done = {"end_time": int(time.time() * 1000), "status": 3}
        out = [f"{k}: {done.pop(k)}" if (k := line.split(":", 1)[0]) in done
               else line for line in meta]
        (self.run_dir / "meta.yaml").write_text("\n".join(out) + "\n")


def add_integration_callbacks(trainer):
    """Attach every available integration (reference callbacks/base.py:191-212)."""
    JsonlLogger().attach(trainer)
    TensorBoardLogger().attach(trainer)
    MlflowFileStoreLogger().attach(trainer)
