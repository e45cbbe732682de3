"""Compile-level SPMD checks on the virtual 8-device mesh: the lowered
train-step HLO must contain a cross-replica gradient all-reduce, shard the
batch across devices, and replicate parameters (SURVEY §2.12 — DDP is
replaced by XLA-inserted collectives over the mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.engine.trainer import TrainState, build_optimizer, make_train_step
from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
from mgdt_yolo_tpu.utils.loss import DetectionLoss


@pytest.fixture(scope="module")
def lowered():
    mh = DetectionModel("yolov8.yaml", nc=2)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    mesh = create_mesh(8)
    params = mh.variables["params"]
    tx = build_optimizer(params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                         10, 100, 10, 10, False, 0.8, nc=mh.nc)
    state = TrainState(
        params=replicate_tree(params, mesh),
        batch_stats=replicate_tree(mh.variables.get("batch_stats", {}), mesh),
        opt_state=replicate_tree(tx.init(params), mesh),
        ema_params=replicate_tree(jax.tree.map(np.array, params), mesh),
        step=jnp.int32(0), ema_updates=jnp.int32(0))
    step_fn = make_train_step(mh.model, criterion, tx)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "img": rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32),
        "gt_labels": np.zeros((8, 4), np.int32),
        "gt_bboxes": np.tile(np.array([8, 8, 40, 40], np.float32), (8, 4, 1)),
        "mask_gt": np.ones((8, 4), bool)}, mesh)
    return state, batch, step_fn


class TestSPMDProgram:
    def test_gradient_allreduce_present_and_batch_sharded(self, lowered):
        state, batch, step_fn = lowered
        low = jax.jit(lambda s, b: step_fn(s, b)).lower(state, batch)
        hlo = low.compile().as_text()
        assert "all-reduce" in hlo, "no cross-device gradient all-reduce"
        # batch is sharded along devices, params replicated
        assert batch["img"].sharding.spec[0] is not None
        leaf = jax.tree.leaves(state.params)[0]
        assert all(s is None for s in getattr(leaf.sharding, "spec", [None]))

    def test_sharded_step_runs_and_updates(self, lowered):
        state, batch, step_fn = lowered
        # at step 0 the 3-group warmup gives kernels lr=0 but biases start at
        # warmup_bias_lr=0.1 — so check movement on a bias leaf
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        bias_path = next(p for p, v in flat
                         if getattr(p[-1], "key", "") == "bias")
        get = lambda tree: np.asarray(jax.tree_util.tree_flatten_with_path(
            tree)[0][[pp for pp, _ in flat].index(bias_path)][1])
        before = get(state.params)  # materialize pre-donation
        new_state, metrics = step_fn(state, batch)  # donates `state`
        assert np.isfinite(float(metrics["loss"]))
        after = get(new_state.params)
        assert np.abs(after - before).max() > 0  # bias group actually moved
