"""SPMD sharded validation (engine/validator.sharded_val_runner).

With >1 local device, each val batch is padded to a mesh-divisible static
shape, sharded along the batch axis, and the outputs sliced back to the real
rows. The reference's DDP validates on rank 0 only — sharded val is
TPU-native headroom, so the bar is EQUIVALENCE: sharded metrics must match
the single-device path (MGDT_VAL_NO_SHARD=1) on identical weights/data.
Runs on the conftest 8-virtual-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
from mgdt_yolo_tpu.engine.validator import (DetectionValidator,
                                            sharded_val_runner)
from mgdt_yolo_tpu.nn.tasks import DetectionModel


def test_runner_pads_to_mesh_and_slices_back():
    ndev = jax.device_count()
    assert ndev == 8, "conftest should provide 8 virtual devices"

    @jax.jit
    def infer(vs, img):
        # second output witnesses the padded device-side batch dimension
        return img.sum(axis=(1, 2, 3)), jnp.full((img.shape[0],),
                                                 img.shape[0])

    run = sharded_val_runner(infer, {}, batch_size=3)
    sums, bdim = run({"img": np.ones((3, 4, 4, 3), np.float32)})
    assert sums.shape == (3,)              # sliced back to the real rows
    assert (np.asarray(bdim) == 8).all()   # device saw the padded batch
    np.testing.assert_allclose(sums, 48.0)
    # short final batch
    sums2, _ = run({"img": np.ones((2, 4, 4, 3), np.float32)})
    assert sums2.shape == (2,)


def test_multiprocess_runtime_disables_sharding(monkeypatch):
    """Under a multi-host runtime the inference-side mesh must stay off:
    each process iterates the full source, and device_get on an array
    spanning non-addressable devices raises. data_sharding_setup gates on
    process_count (trainer-side shard_batch handles multi-host instead)."""
    from mgdt_yolo_tpu.parallel.mesh import data_sharding_setup
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    ndev, sharding, vs = data_sharding_setup({"w": np.ones(3)},
                                             "MGDT_VAL_NO_SHARD")
    assert ndev == 0 and sharding is None
    # the no-shard path still pins params on device once (host numpy leaves
    # would re-upload the whole tree on every jitted dispatch)
    assert isinstance(vs["w"], jax.Array)
    np.testing.assert_allclose(np.asarray(vs["w"]), 1.0)


def test_no_shard_escape_hatch(monkeypatch):
    monkeypatch.setenv("MGDT_VAL_NO_SHARD", "1")

    @jax.jit
    def infer(vs, img):
        return jnp.full((img.shape[0],), img.shape[0])

    run = sharded_val_runner(infer, {}, batch_size=3)
    bdim = run({"img": np.ones((3, 4, 4, 3), np.float32)})
    assert (np.asarray(bdim) == 3).all()   # no padding on the escape path


def test_sharded_predict_matches_single_device(monkeypatch):
    """BasePredictor with 8 devices (batch sharded over the mesh, incl. a
    padded short chunk) == single-device run on the same images."""
    from mgdt_yolo_tpu import YOLO
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (70 + 6 * i, 90, 3), dtype=np.uint8)
            for i in range(5)]  # batch 3 -> one full + one short chunk
    m = YOLO("yolov8n.yaml")
    # conf 1e-5: a random model's bias init pushes confidences below 1e-3,
    # which would make this equivalence vacuous (zero detections both ways)
    kw = dict(imgsz=64, conf=1e-5, iou=0.7, max_det=32, batch=3)

    monkeypatch.setenv("MGDT_PREDICT_NO_SHARD", "1")
    single = m.predict(imgs, **kw)
    monkeypatch.delenv("MGDT_PREDICT_NO_SHARD")
    sharded = m.predict(imgs, **kw)

    assert len(single) == len(sharded) == 5
    total = 0
    for a, b in zip(single, sharded):
        da = np.asarray(a.boxes.data)
        db = np.asarray(b.boxes.data)
        assert da.shape == db.shape
        if da.size:
            np.testing.assert_allclose(da, db, atol=1e-4, rtol=1e-4)
        total += len(da)
    assert total > 20, f"too few detections to witness equivalence ({total})"


def test_sharded_val_matches_single_device(monkeypatch, tmp_path):
    """Full DetectionValidator: 8-device sharded run == single-device run
    on identical weights and images (metrics and image count)."""
    ds = SyntheticDetectionDataset(n=10, imgsz=64, nc=2, seed=7)
    model = DetectionModel("yolov8n.yaml", nc=2)
    variables = model.variables
    # batch 3 over 10 images: two full batches + one short (1) — exercises
    # both the pad-to-mesh and the short-final-batch paths
    args = get_cfg(overrides={"imgsz": 64, "batch": 3, "conf": 0.001,
                              "iou": 0.7, "mode": "val"})

    monkeypatch.setenv("MGDT_VAL_NO_SHARD", "1")
    v1 = DetectionValidator(args=args)
    single = v1(model, variables, dataset=ds)
    monkeypatch.delenv("MGDT_VAL_NO_SHARD")
    v2 = DetectionValidator(args=args)
    sharded = v2(model, variables, dataset=ds)

    for k in ("map50", "map", "precision", "recall"):
        assert sharded[k] == pytest.approx(single[k], abs=1e-6), \
            (k, sharded[k], single[k])
    # metrics of an untrained model are ~0 — the real equivalence signal is
    # the per-image detections (conf 0.001 floods hundreds of candidates)
    p1, p2 = v1._per_image_preds, v2._per_image_preds
    assert len(p1) == len(p2) == 10
    total = 0
    for a, b in zip(p1, p2):
        assert a.shape == b.shape
        if a.size:
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
        total += len(a)
    assert total > 50, f"too few detections to witness equivalence ({total})"
