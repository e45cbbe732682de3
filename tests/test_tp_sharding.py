"""2-D (data x model) mesh: channel tensor-parallelism correctness.

GSPMD guarantees sharding is layout-only, so a train step with conv output
channels sharded over the model axis must produce the same loss/updates as
the replicated data-parallel run — this asserts our sharding trees are
well-formed (no shape mismatches, momentum mirrors params) and that the
step executes with TP layouts end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                          make_train_step)
from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.parallel.mesh import (create_mesh, create_mesh_2d,
                                         mirror_sharding, replicate_tree,
                                         shard_batch, shard_tree_like,
                                         tp_param_sharding)
from mgdt_yolo_tpu.utils.loss import DetectionLoss


def _setup():
    mh = DetectionModel("yolov8n.yaml", nc=2)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    params = mh.variables["params"]
    tx = build_optimizer(params, "SGD", lr0=0.01, lrf=0.01, momentum=0.937,
                         weight_decay=5e-4, warmup_steps=0, total_steps=100,
                         steps_per_epoch=10, epochs=10, cos_lr=False,
                         warmup_momentum=0.8, nc=mh.nc)
    rng = np.random.default_rng(0)
    b, G = 8, 4
    batch = {
        "img": rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32),
        "gt_labels": rng.integers(0, mh.nc, (b, G)).astype(np.int32),
        "gt_bboxes": np.tile(np.array([8, 8, 40, 40], np.float32), (b, G, 1)),
        "mask_gt": np.tile(np.array([True, True, False, False]), (b, 1)),
    }
    return mh, criterion, params, tx, batch


def _state(params, tx, mh, put_params, put_mirror):
    bs = mh.variables.get("batch_stats", {})
    return TrainState(
        params=put_params(params),
        batch_stats=put_mirror(bs),
        opt_state=put_mirror(tx.init(params)),
        ema_params=put_params(jax.tree.map(lambda p: np.array(p, copy=True),
                                           params)),
        step=jnp.int32(0), ema_updates=jnp.int32(0))


def test_tp_step_matches_dp():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    mh, criterion, params, tx, batch = _setup()
    step_fn = make_train_step(mh.model, criterion, tx)

    # reference: 1-D data-parallel run
    mesh1 = create_mesh(8)
    st1 = _state(params, tx, mh,
                 lambda t: replicate_tree(t, mesh1),
                 lambda t: replicate_tree(t, mesh1))
    st1, m1 = step_fn(st1, shard_batch(batch, mesh1))

    # 2-D: 4-way data x 2-way channel tensor-parallel
    mesh2 = create_mesh_2d(4, 2)
    psh = tp_param_sharding(params, mesh2)
    # at least one leaf must actually shard (yolov8n has >=64-ch convs)
    specs = [s.spec for s in jax.tree.leaves(psh)]
    assert any(s != () and s[-1] == "model" for s in specs
               if len(s)), "no leaf got a model-axis shard"
    st2 = _state(
        params, tx, mh,
        lambda t: shard_tree_like(t, psh),
        lambda t: shard_tree_like(t, mirror_sharding(params, psh, t, mesh2)))
    st2, m2 = step_fn(st2, shard_batch(batch, mesh2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=2e-3)
    # updated params agree leafwise (layout-only difference)
    l1 = jax.tree.leaves(jax.device_get(st1.params))
    l2 = jax.tree.leaves(jax.device_get(st2.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l2))
    assert worst < 5e-5, f"TP vs DP param divergence {worst}"


def test_fsdp_step_matches_dp():
    """ZeRO-style param/opt sharding over the data axis is layout-only:
    same losses and updates as the replicated run."""
    from mgdt_yolo_tpu.parallel.mesh import fsdp_param_sharding
    mh, criterion, params, tx, batch = _setup()
    step_fn = make_train_step(mh.model, criterion, tx)

    mesh = create_mesh(8)
    st_dp = _state(params, tx, mh,
                   lambda t: replicate_tree(t, mesh),
                   lambda t: replicate_tree(t, mesh))
    st_dp, m_dp = step_fn(st_dp, shard_batch(batch, mesh))

    psh = fsdp_param_sharding(params, mesh)
    sharded = [s for s in jax.tree.leaves(psh) if s.spec != ()]
    assert sharded, "no param leaf got an fsdp shard"
    st_f = _state(
        params, tx, mh,
        lambda t: shard_tree_like(t, psh),
        lambda t: shard_tree_like(t, mirror_sharding(params, psh, t, mesh)))
    st_f, m_f = step_fn(st_f, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_f["loss"]),
                               rtol=2e-4)
    l1 = jax.tree.leaves(jax.device_get(st_dp.params))
    l2 = jax.tree.leaves(jax.device_get(st_f.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l2))
    assert worst < 5e-5, f"FSDP vs DP param divergence {worst}"


def test_tp_trainer_smoke(tmp_path):
    """Trainer accepts tp=2 end-to-end (tiny synthetic run, one epoch)."""
    from mgdt_yolo_tpu.engine.model import YOLO
    m = YOLO("yolov8n.yaml")
    m.train(data="synthetic", epochs=1, imgsz=64, batch=16, tp=2, workers=2,
            project=str(tmp_path), name="tp2", val=False, plots=False,
            save=False)
