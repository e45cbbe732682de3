"""Compile-level SPMD checks on the virtual 8-device mesh: the lowered
train-step HLO must contain a cross-replica gradient all-reduce, shard the
batch across devices, replicate parameters, and split the arithmetic —
per-device cost-analysis FLOPs ≈ total/N (SURVEY §2.12 — DDP's NCCL
all-reduce, reference yolo/engine/trainer.py:337-338, is replaced by
XLA-inserted collectives over the mesh). The dp×tp and fsdp legs assert
their characteristic collectives are present in the compiled program —
scaling-shape evidence that needs no hardware (the numeric equivalence of
those layouts is tests/test_tp_sharding.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.engine.trainer import TrainState, build_optimizer, make_train_step
from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.parallel.mesh import (create_mesh, create_mesh_2d,
                                         fsdp_param_sharding, mirror_sharding,
                                         replicate_tree, shard_batch,
                                         shard_tree_like, tp_param_sharding)
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

    def test_per_device_flops_scale_as_total_over_n(self, lowered):
        """cost_analysis of the compiled SPMD module is per-device: with the
        global batch 8 sharded over 8 devices it must match a single-device
        batch-1 program's FLOPs (collectives add bytes, not flops)."""
        state, batch, step_fn = lowered
        dp = jax.jit(lambda s, b: step_fn(s, b)).lower(state, batch).compile()
        flops_dp = dp.cost_analysis()["flops"]

        host_state = jax.device_get(state)
        b1 = {k: np.asarray(v)[:1] for k, v in jax.device_get(batch).items()}
        single = jax.jit(lambda s, b: step_fn(s, b)).lower(
            host_state, b1).compile()
        flops_b1 = single.cost_analysis()["flops"]
        assert flops_dp == pytest.approx(flops_b1, rel=0.05), \
            f"per-device flops {flops_dp:.3e} != total/N {flops_b1:.3e}"

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


def _mk_batch(b):
    rng = np.random.default_rng(0)
    return {"img": rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32),
            "gt_labels": np.zeros((b, 4), np.int32),
            "gt_bboxes": np.tile(np.array([8, 8, 40, 40], np.float32),
                                 (b, 4, 1)),
            "mask_gt": np.ones((b, 4), bool)}


def _mk_state(mh, tx, put_params, put_mirror):
    params = mh.variables["params"]
    return TrainState(
        params=put_params(params),
        batch_stats=put_mirror(mh.variables.get("batch_stats", {})),
        opt_state=put_mirror(tx.init(params)),
        ema_params=put_params(jax.tree.map(np.array, params)),
        step=jnp.int32(0), ema_updates=jnp.int32(0))


class TestParallelismCollectives:
    """The compiled program must contain each layout's characteristic
    collectives — the machine-checked shape of the scaling claim."""

    @pytest.fixture(scope="class")
    def parts(self):
        mh = DetectionModel("yolov8.yaml", nc=2)
        criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
        params = mh.variables["params"]
        tx = build_optimizer(params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                             10, 100, 10, 10, False, 0.8, nc=mh.nc)
        step_fn = make_train_step(mh.model, criterion, tx)
        return mh, tx, step_fn

    def _hlo(self, mh, tx, step_fn, put_params, put_mirror, mesh):
        state = _mk_state(mh, tx, put_params, put_mirror)
        batch = shard_batch(_mk_batch(8), mesh)
        return jax.jit(lambda s, b: step_fn(s, b)).lower(
            state, batch).compile().as_text()

    def test_dp_tp_collectives(self, parts):
        mh, tx, step_fn = parts
        mesh2 = create_mesh_2d(4, 2)
        psh = tp_param_sharding(mh.variables["params"], mesh2)
        hlo = self._hlo(
            mh, tx, step_fn,
            lambda t: shard_tree_like(t, psh),
            lambda t: shard_tree_like(
                t, mirror_sharding(mh.variables["params"], psh, t, mesh2)),
            mesh2)
        # gradient reduction over the data axis is still an all-reduce;
        # channel-sharded convs force activation collectives too
        assert "all-reduce" in hlo
        assert "all-gather" in hlo or "collective-permute" in hlo or \
            hlo.count("all-reduce") > 1

    def test_fsdp_collectives(self, parts):
        mh, tx, step_fn = parts
        mesh = create_mesh(8)
        psh = fsdp_param_sharding(mh.variables["params"], mesh)
        hlo = self._hlo(
            mh, tx, step_fn,
            lambda t: shard_tree_like(t, psh),
            lambda t: shard_tree_like(
                t, mirror_sharding(mh.variables["params"], psh, t, mesh)),
            mesh)
        # ZeRO shape: params all-gathered for compute, grads reduced back
        # to shards (reduce-scatter, or all-reduce + slice when XLA picks it)
        assert "all-gather" in hlo, "fsdp params must be gathered on use"
        assert "reduce-scatter" in hlo or "all-reduce" in hlo
