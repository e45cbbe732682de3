"""Multi-host worker: one OS process of a 2-process CPU 'cluster'.

Run by tests/test_multihost.py via subprocess (scrubbed env):
    python multihost_worker.py <process_id> <coordinator_port> [single]

Builds the MGDT train step over an 8-device global mesh (4 local virtual
CPU devices per process), feeds the process-local half of a deterministic
global batch through shard_batch's make_array_from_process_local_data
branch (mgdt_yolo_tpu/parallel/mesh.py), runs ONE step and prints the
globally-reduced loss. 'single' mode runs the same global batch in one
process (8 local devices) for the golden value.
"""
import os
import sys

N_GLOBAL = 8


def global_batch(nc: int):
    import numpy as np
    G = 8
    rng = np.random.default_rng(0)
    return {
        "img": rng.uniform(0, 1, (N_GLOBAL, 64, 64, 3)).astype(np.float32),
        "gt_labels": rng.integers(0, nc, (N_GLOBAL, G)).astype(np.int32),
        "gt_bboxes": np.tile(np.array([8, 8, 40, 40], np.float32),
                             (N_GLOBAL, G, 1)),
        "mask_gt": np.tile(np.array([True] * 2 + [False] * (G - 2)),
                           (N_GLOBAL, 1)),
    }


def main(pid: int, port: int, single: bool):
    n_local = N_GLOBAL if single else N_GLOBAL // 2
    os.environ["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={n_local}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if not single:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2
        assert jax.device_count() == N_GLOBAL

    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                              make_train_step)
    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.parallel.mesh import (create_mesh, replicate_tree,
                                             shard_batch)
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    mesh = create_mesh()
    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml")
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    params = mh.variables["params"]
    tx = build_optimizer(params, "SGD", lr0=0.01, lrf=0.01, momentum=0.937,
                         weight_decay=5e-4, warmup_steps=100,
                         total_steps=1000, steps_per_epoch=10, epochs=100,
                         cos_lr=False, warmup_momentum=0.8, nc=mh.nc)
    state = TrainState(
        params=replicate_tree(params, mesh),
        batch_stats=replicate_tree(mh.variables.get("batch_stats", {}), mesh),
        opt_state=replicate_tree(tx.init(params), mesh),
        ema_params=replicate_tree(
            jax.tree.map(lambda p: np.array(p, copy=True), params), mesh),
        step=jnp.int32(0), ema_updates=jnp.int32(0))
    step_fn = make_train_step(mh.model, criterion, tx)

    gb = global_batch(mh.nc)
    if single:
        local = gb
    else:  # this process's contiguous row block of the global batch
        lo, hi = pid * n_local, (pid + 1) * n_local
        local = {k: v[lo:hi] for k, v in gb.items()}
    device_batch = shard_batch(local, mesh)
    assert device_batch["img"].shape[0] == N_GLOBAL  # assembled globally
    if not single:
        # AOT-compile BEFORE the first collective executes: the two workers'
        # compiles serialize on a 1-core host (minutes of skew), and gloo
        # context creation at first execution has a hard 30 s KV-exchange
        # deadline (observed: "GetKeyValue() timed out ... 29.99s"). Compile
        # locally, re-sync on the coordination service with a generous
        # barrier, then execute in lockstep.
        compiled = step_fn.lower(state, device_batch).compile()
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            "mgdt_step_compiled", 600_000)
        state, metrics = compiled(state, device_batch)
    else:
        state, metrics = step_fn(state, device_batch)
    jax.block_until_ready(metrics)
    print(f"MULTIHOST_LOSS {float(metrics['loss']):.6f}", flush=True)
    if not single:
        # Reach the coordination-service shutdown barrier together and
        # explicitly: leaving it to atexit lets interpreter teardown (array
        # GC, compile-cache writes) skew the two processes past the 30 s
        # barrier timeout on a 1-core host — observed flake.
        sync = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),), jnp.float32))
        jax.block_until_ready(sync)
        jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         len(sys.argv) > 3 and sys.argv[3] == "single")
