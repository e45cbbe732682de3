"""Training-loop sanity: loss decreases, overfit detects, EMA/ckpt round-trips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.data.build import collate
from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                          make_train_step)
from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.loss import DetectionLoss


def _make_state(mh, tx):
    params = mh.variables["params"]
    return TrainState(
        params=params, batch_stats=mh.variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(lambda p: np.array(p, copy=True), params),
        step=jnp.int32(0), ema_updates=jnp.int32(0))


@pytest.fixture(scope="module")
def overfit_setup():
    mh = DetectionModel("yolov8.yaml", nc=2)
    ds = SyntheticDetectionDataset(n=8, imgsz=160, nc=2, seed=3)
    batch = collate([ds[i] for i in range(8)], 160, 8, train=True)
    crit = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    tx = build_optimizer(mh.params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                         warmup_steps=20, total_steps=300, steps_per_epoch=1,
                         epochs=300, cos_lr=False, warmup_momentum=0.8, nc=2)
    step_fn = make_train_step(mh.model, crit, tx)
    db = {k: jnp.asarray(v) for k, v in batch.items() if k != "metas"}
    # state buffers are donated by the train step, so hand out a factory
    return mh, step_fn, lambda: _make_state(mh, tx), db, batch


class TestTraining:
    def test_overfit_synthetic(self, overfit_setup):
        """Loss collapses and the net localizes the training rectangles
        (SURVEY.md §7 step 5's overfit sanity)."""
        mh, step_fn, make_state, db, batch = overfit_setup
        state = make_state()
        first = None
        for i in range(220):
            state, m = step_fn(state, db)
            if i == 0:
                first = float(m["loss"])
        last = float(m["loss"])
        assert np.isfinite(last)
        assert last < first / 4, f"loss did not collapse: {first} -> {last}"

        # detections should overlap gt boxes
        from mgdt_yolo_tpu.ops.nms import non_max_suppression
        from mgdt_yolo_tpu.utils.metrics import box_iou_numpy
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        img = db["img"].astype(jnp.float32) / 255.0  # collate ships uint8
        decoded, _ = mh.model.apply(variables, img, train=False)
        dets, counts = jax.device_get(non_max_suppression(
            decoded, conf_thres=0.05, iou_thres=0.7, max_det=20))
        hits = total_gt = 0
        for j in range(len(counts)):
            gt = np.asarray(batch["gt_bboxes"][j][batch["mask_gt"][j]])
            total_gt += len(gt)
            d = np.asarray(dets[j][:int(counts[j])])
            if len(d) and len(gt):
                iou = box_iou_numpy(d[:, :4], gt)
                hits += (iou.max(axis=0) > 0.5).sum()
        assert total_gt > 0
        assert hits / total_gt > 0.5, f"only {hits}/{total_gt} gts localized"

    def test_ema_tracks_params(self, overfit_setup):
        mh, step_fn, make_state, db, _ = overfit_setup
        state = make_state()
        for _ in range(3):
            state, _ = step_fn(state, db)
        p = jax.tree.leaves(state.params)[0]
        e = jax.tree.leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(p), np.asarray(e))  # ema lags
        assert int(state.ema_updates) == 3

    def test_checkpoint_roundtrip(self, tmp_path, overfit_setup):
        import orbax.checkpoint as ocp
        mh, step_fn, make_state, db, _ = overfit_setup
        state, _ = step_fn(make_state(), db)
        ckpt = {"params": jax.device_get(state.params),
                "step": int(state.step)}
        path = tmp_path / "ck"
        ocp.PyTreeCheckpointer().save(path.absolute(), ckpt)
        back = ocp.PyTreeCheckpointer().restore(path.absolute())
        a = jax.tree.leaves(ckpt["params"])[0]
        b = jax.tree.leaves(back["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSharding:
    def test_train_step_on_8_device_mesh(self):
        """Full SPMD train step over the virtual 8-CPU mesh."""
        from mgdt_yolo_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
        assert jax.device_count() >= 8
        mesh = create_mesh(8)
        mh = DetectionModel("yolov8.yaml", nc=2)
        crit = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
        tx = build_optimizer(mh.params, "SGD", 0.01, 0.01, 0.937, 5e-4, 10, 100,
                             10, 10, False, 0.8, nc=2)
        params = mh.variables["params"]
        state = TrainState(
            params=replicate_tree(params, mesh),
            batch_stats=replicate_tree(mh.variables.get("batch_stats", {}), mesh),
            opt_state=replicate_tree(tx.init(params), mesh),
            ema_params=replicate_tree(
                jax.tree.map(lambda p: np.array(p, copy=True), params), mesh),
            step=jnp.int32(0), ema_updates=jnp.int32(0))
        step_fn = make_train_step(mh.model, crit, tx)
        ds = SyntheticDetectionDataset(n=8, imgsz=64, nc=2, seed=0)
        batch = collate([ds[i] for i in range(8)], 64, 8, train=True)
        db = shard_batch(batch, mesh)
        # batch really is sharded across devices
        assert len(db["img"].sharding.device_set) == 8
        state, metrics = step_fn(state, db)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self):
        """Same batch, 1-device vs 8-device mesh -> identical loss."""
        from mgdt_yolo_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
        mh = DetectionModel("yolov8.yaml", nc=2)
        crit = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
        tx = build_optimizer(mh.params, "SGD", 0.01, 0.01, 0.937, 5e-4, 10, 100,
                             10, 10, False, 0.8, nc=2)
        ds = SyntheticDetectionDataset(n=8, imgsz=64, nc=2, seed=0)
        batch = collate([ds[i] for i in range(8)], 64, 8, train=True)
        step_fn = make_train_step(mh.model, crit, tx)
        losses = []
        for n in (1, 8):
            mesh = create_mesh(n)
            params = mh.variables["params"]
            state = TrainState(
                params=replicate_tree(params, mesh),
                batch_stats=replicate_tree(mh.variables.get("batch_stats", {}), mesh),
                opt_state=replicate_tree(tx.init(params), mesh),
                ema_params=replicate_tree(
                    jax.tree.map(lambda p: np.array(p, copy=True), params), mesh),
                step=jnp.int32(0), ema_updates=jnp.int32(0))
            _, metrics = step_fn(state, shard_batch(batch, mesh))
            losses.append(float(metrics["loss"]))
        assert abs(losses[0] - losses[1]) / losses[0] < 1e-3, losses


class TestDonationGate:
    """make_train_step drops donate_argnums on the axon tunnel (which
    rejects donated buffers at dispatch) and honors MGDT_DONATE."""

    def _captured_jit_kwargs(self, monkeypatch, env):
        import mgdt_yolo_tpu.engine.trainer as T
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        seen = {}
        real_jit = jax.jit

        def spy(fn, **kw):
            seen.update(kw or {"donate_argnums": None})
            return real_jit(fn)
        monkeypatch.setattr(T.jax, "jit", spy)
        T.make_train_step(object(), object(), object())
        return seen

    def test_env_force_off(self, monkeypatch):
        kw = self._captured_jit_kwargs(monkeypatch, {"MGDT_DONATE": "0"})
        assert kw.get("donate_argnums") is None

    def test_env_force_on(self, monkeypatch):
        kw = self._captured_jit_kwargs(monkeypatch, {"MGDT_DONATE": "1"})
        assert kw.get("donate_argnums") == (0,)

    def test_auto_donates_off_tunnel(self, monkeypatch):
        # CPU test env: platform_version has no "axon" -> donation on
        kw = self._captured_jit_kwargs(monkeypatch, {"MGDT_DONATE": "auto"})
        expected = (None if "axon"
                    in jax.devices()[0].client.platform_version else (0,))
        assert kw.get("donate_argnums") == expected


def test_ckpt_records_and_pins_deform_semantics(tmp_path):
    """The trainer sidecar json records which DCNv2 semantics training used
    (ops/deform.py training_semantics), and YOLO(ckpt) pins THE LOADED
    MODEL's dispatch to match (per-model, not process-global) —
    windowed/exact kernels are not interchangeable on a trained checkpoint
    (mAP50-95 0.619 vs 0.362 measured; README results table)."""
    import json

    from mgdt_yolo_tpu.engine.model import YOLO
    from mgdt_yolo_tpu.ops import deform as D

    m = YOLO("yolov8n.yaml")
    m.train(data="synthetic", epochs=1, imgsz=64, batch=8, workers=2,
            project=str(tmp_path), name="sem", val=False, plots=False)
    wdir = tmp_path / "sem" / "weights"
    meta = json.loads((wdir / "last.json").read_text())
    assert meta["deform_semantics"] == D.training_semantics()
    # the facade pinned the just-trained model to its training semantics
    assert m.model.deform_semantics == meta["deform_semantics"]
    # simulate loading a checkpoint trained under the OTHER semantics:
    # only the LOADED model gets that pin; `m` keeps its own
    flipped = ("exact" if meta["deform_semantics"] == "windowed"
               else "windowed")
    meta["deform_semantics"] = flipped
    (wdir / "last.json").write_text(json.dumps(meta))
    other = YOLO(str(wdir / "last"))
    assert other.model.deform_semantics == flipped
    assert m.model.deform_semantics != flipped  # no cross-model re-pin
    assert D.current_semantics() == "auto"  # nothing leaked process-wide


def test_resume_pins_training_semantics(tmp_path, monkeypatch):
    """Resume reads the sidecar's deform_semantics and pins TRAINING
    dispatch (VERDICT r4 weak #2b): a windowed-trained run resumed without
    the env var must keep training windowed, and a conflicting
    MGDT_DEFORM_EXACT is a hard error instead of a silent kernel flip."""
    import json

    from mgdt_yolo_tpu.engine.model import YOLO

    # train 1 epoch with windowed TRAINING semantics (patch path on CPU)
    monkeypatch.setenv("MGDT_DEFORM_FAST_TRAIN", "1")
    m = YOLO("yolov8n.yaml")
    m.train(data="synthetic", epochs=2, imgsz=64, batch=8, workers=2,
            project=str(tmp_path), name="resumable", val=False, plots=False,
            exist_ok=True)
    wdir = tmp_path / "resumable" / "weights"
    meta = json.loads((wdir / "last.json").read_text())
    assert meta["deform_semantics"] == "windowed"
    monkeypatch.delenv("MGDT_DEFORM_FAST_TRAIN", raising=False)

    # resume WITHOUT the env var: the sidecar must pin windowed training
    m2 = YOLO("yolov8n.yaml")
    m2.train(data="synthetic", epochs=3, imgsz=64, batch=8, workers=2,
             project=str(tmp_path), name="resumable", val=False, plots=False,
             resume=True, exist_ok=True)
    assert m2.model.deform_semantics == "windowed"
    meta2 = json.loads((wdir / "last.json").read_text())
    assert meta2["deform_semantics"] == "windowed"  # did not flip to exact

    # conflicting env: hard error, not a silent mid-run kernel swap
    monkeypatch.setenv("MGDT_DEFORM_EXACT", "1")
    m3 = YOLO("yolov8n.yaml")
    with pytest.raises(RuntimeError, match="WINDOWED"):
        m3.train(data="synthetic", epochs=4, imgsz=64, batch=8, workers=2,
                 project=str(tmp_path), name="resumable", val=False,
                 plots=False, resume=True, exist_ok=True)
