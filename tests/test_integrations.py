"""MlflowFileStoreLogger: offline MLflow tracking by writing the file-store
layout directly (reference yolo/utils/callbacks/mlflow.py:21-67 — same
hooks/keys, no package or server needed)."""
import os
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from mgdt_yolo_tpu.utils.callbacks_integrations import MlflowFileStoreLogger


class FakeTrainer:
    def __init__(self, save_dir):
        self.args = SimpleNamespace(task="detect", lr0=0.01, imgsz=64,
                                    epochs=2)
        self.save_dir = save_dir
        self.epoch = 0
        self.loss_items = {"box_loss": 1.5, "cls_loss": 2.0}
        self.metrics = {"metrics/mAP50(B)": 0.5, "fitness": 0.4}
        self._cbs = {}

    def add_callback(self, event, fn):
        self._cbs.setdefault(event, []).append(fn)

    def fire(self, event):
        for fn in self._cbs.get(event, []):
            fn(self)


def _run_training(root, tmp_path):
    t = FakeTrainer(tmp_path / "run1")
    (t.save_dir / "weights").mkdir(parents=True)
    (t.save_dir / "weights" / "best.txt").write_text("ckpt")
    lg = MlflowFileStoreLogger(root=root)
    lg.attach(t)
    t.fire("on_pretrain_routine_end")
    for e in range(2):
        t.epoch = e
        t.metrics["metrics/mAP50(B)"] = 0.5 + 0.1 * e
        t.fire("on_fit_epoch_end")
    t.fire("on_train_end")
    return lg


def test_file_store_layout(tmp_path):
    root = tmp_path / "mlruns"
    lg = _run_training(root, tmp_path)
    run = lg.run_dir
    assert run is not None and run.is_dir()
    exp_meta = (run.parent / "meta.yaml").read_text()
    assert "lifecycle_stage: active" in exp_meta
    run_meta = (run / "meta.yaml").read_text()
    assert f"run_id: {run.name}" in run_meta
    assert "status: 3" in run_meta  # finalized FINISHED
    # params: one file per arg, value as text
    assert (run / "params" / "lr0").read_text() == "0.01"
    # metric files: "timestamp value step" lines, keys sanitized like mlflow
    m = (run / "metrics" / "metrics/mAP50B").read_text().splitlines()
    assert len(m) == 2
    ts, v, step = m[1].split()
    assert float(v) == 0.6 and step == "1" and int(ts) > 0
    tr = (run / "metrics" / "train/box_loss").read_text().splitlines()
    assert all(float(line.split()[1]) == 1.5 for line in tr)
    # weight artifacts copied at train end
    assert (run / "artifacts" / "best.txt").read_text() == "ckpt"


def test_metric_series_monotone_steps(tmp_path):
    lg = _run_training(tmp_path / "mlruns", tmp_path)
    lines = (lg.run_dir / "metrics" / "fitness").read_text().splitlines()
    steps = [int(line.split()[2]) for line in lines]
    assert steps == [0, 1]


def test_inert_without_env(tmp_path, monkeypatch):
    monkeypatch.delenv("MGDT_MLFLOW_DIR", raising=False)
    monkeypatch.delenv("MLFLOW_TRACKING_URI", raising=False)
    lg = MlflowFileStoreLogger()
    assert lg.root is None
    t = FakeTrainer(tmp_path / "r")
    lg.attach(t)
    assert t._cbs == {}  # no hooks registered


def test_http_uri_refused(monkeypatch):
    monkeypatch.setenv("MLFLOW_TRACKING_URI", "https://example.com")
    assert MlflowFileStoreLogger().root is None


def test_file_uri_accepted(tmp_path, monkeypatch):
    monkeypatch.setenv("MLFLOW_TRACKING_URI", f"file://{tmp_path}/mlruns")
    lg = MlflowFileStoreLogger()
    assert lg.root == tmp_path / "mlruns"
