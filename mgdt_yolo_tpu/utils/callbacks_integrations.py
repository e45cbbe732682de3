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

    def _experiment_id(self, exp_name: str) -> str:
        """One stable experiment directory per name, across processes.

        Like mlflow's own file store, an existing experiment is found by
        scanning `<root>/*/meta.yaml` for a matching `name:`; only when none
        exists is a new id minted — derived from sha1(name) so concurrent
        first-writers converge on the same directory (Python's builtin
        `hash()` is salted per process and would splinter experiments).
        """
        if self.root.is_dir():
            for meta in self.root.glob("*/meta.yaml"):
                for line in meta.read_text().splitlines():
                    if line.startswith("name: ") and line[6:] == exp_name:
                        return meta.parent.name
        import hashlib
        digest = hashlib.sha1(exp_name.encode()).hexdigest()
        return str(int(digest[:12], 16) % 10 ** 9)

    def _start(self, trainer):
        exp_name = os.environ.get("MLFLOW_EXPERIMENT_NAME",
                                  f"/mgdt/{getattr(trainer.args, 'task', 'detect')}")
        # experiment ids are numeric strings in the file store
        exp_id = self._experiment_id(exp_name)
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


class WandbOfflineLogger:
    """wandb logging, import-gated and FORCED offline (reference
    callbacks/wb.py:24-53 — same hooks: init at pretrain, metrics +
    train losses per epoch, best-weights artifact at train end).

    Unlike mlflow's file store, wandb's offline format (`wandb/*.wandb`)
    is an undocumented protobuf/LevelDB-style binary that cannot be
    written without the package — so this adapter requires `wandb` to be
    importable but never the network: it always calls
    `wandb.init(mode="offline")` (the package's own documented offline
    mode, synced later with `wandb sync`). Activates only when
    MGDT_WANDB=1 or WANDB_MODE=offline is set AND wandb imports; inert
    otherwise (this environment ships no wandb).
    """

    def __init__(self, wandb_module=None):
        self.wb = wandb_module
        self.run = None
        if self.wb is None:
            if not (os.environ.get("MGDT_WANDB")
                    or os.environ.get("WANDB_MODE") == "offline"):
                return
            try:
                import wandb
                assert hasattr(wandb, "__version__")
                self.wb = wandb
            except (ImportError, AssertionError):
                LOGGER.info("wandb not importable; wandb logging off")

    def attach(self, trainer):
        if self.wb is None:
            return
        trainer.add_callback("on_pretrain_routine_start", self._start)
        trainer.add_callback("on_fit_epoch_end", self._epoch)
        trainer.add_callback("on_train_end", self._end)

    def _start(self, trainer):
        self.run = self.wb.init(
            project=str(getattr(trainer.args, "project", None) or "MGDT"),
            name=str(getattr(trainer.args, "name", None) or "train"),
            config=vars(trainer.args), mode="offline",
            dir=str(getattr(trainer, "save_dir", ".")))

    def _epoch(self, trainer):
        if self.run is None:
            return
        step = int(getattr(trainer, "epoch", 0)) + 1
        rows = {**{f"train/{k}": float(v)
                   for k, v in getattr(trainer, "loss_items", {}).items()},
                **{k: float(v) for k, v in getattr(trainer, "metrics", {}).items()
                   if isinstance(v, (int, float))}}
        self.run.log(rows, step=step)

    def _end(self, trainer):
        if self.run is None:
            return
        best = Path(str(getattr(trainer, "save_dir", ""))) / "weights" / "best"
        try:
            if best.exists():
                art = self.wb.Artifact(type="model",
                                       name=f"run_{self.run.id}_model")
                art.add_dir(str(best)) if best.is_dir() else \
                    art.add_file(str(best))
                self.run.log_artifact(art)
        finally:
            self.run.finish()


def add_integration_callbacks(trainer):
    """Attach every available integration (reference callbacks/base.py:191-212)."""
    JsonlLogger().attach(trainer)
    TensorBoardLogger().attach(trainer)
    MlflowFileStoreLogger().attach(trainer)
    WandbOfflineLogger().attach(trainer)
