"""Classification task e2e (engine/classify.py — reference yolo/v8/classify/):
synthetic overfit raises top-1 well above chance, validator sharding is
equivalent to single-device, and the predictor returns Probs results.
"""
import numpy as np
import pytest

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.engine.classify import (ClassificationDataset,
                                           ClassificationTrainer,
                                           ClassificationValidator)
from mgdt_yolo_tpu.nn.tasks import ClassificationModel


@pytest.fixture(scope="module")
def trained():
    """Overfit yolov8n-cls on the synthetic solid-color dataset.

    Needs a few hundred steps: short runs reach train-mode 100% purely via
    BatchNorm batch-composition leakage while eval-mode stays at chance —
    genuine per-image features (and converged BN running stats) take
    ~50 epochs x 4 steps at batch 16."""
    mh = ClassificationModel("yolov8n-cls.yaml", nc=4)
    tr = ClassificationTrainer(overrides={
        "data": "synthetic", "imgsz": 32, "batch": 16, "epochs": 50,
        "lr0": 0.01, "mode": "train"}, model=mh)
    res = tr.train()
    return tr.model_holder, res


def test_overfit_learns_eval_mode(trained):
    mh, res = trained
    assert res["top1"] > 0.9, res  # eval-mode (running BN stats), 4 classes


def test_val_shard_equivalence(trained, monkeypatch):
    mh, _ = trained
    ds = ClassificationDataset(None, imgsz=32, nc=mh.nc, n_synth=32)
    args = get_cfg(overrides={"imgsz": 32, "batch": 8, "mode": "val"})
    monkeypatch.setenv("MGDT_VAL_NO_SHARD", "1")
    single = ClassificationValidator(args=args)(mh, dataset=ds)
    monkeypatch.delenv("MGDT_VAL_NO_SHARD")
    sharded = ClassificationValidator(args=args)(mh, dataset=ds)
    assert single == sharded


def test_predictor_returns_probs(trained):
    from mgdt_yolo_tpu.engine.classify import ClassificationPredictor
    mh, _ = trained
    pred = ClassificationPredictor(get_cfg(overrides={"imgsz": 32,
                                                      "mode": "predict"}))
    pred.setup_model(mh)
    img = np.full((48, 64, 3), 128, np.uint8)
    out = pred(img)
    assert len(out) == 1
    probs = np.asarray(out[0].probs.data)
    assert probs.shape == (mh.nc,)
    assert np.isfinite(probs).all()
