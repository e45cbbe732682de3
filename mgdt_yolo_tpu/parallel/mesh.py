"""Device mesh + sharding helpers: SPMD data parallelism over ICI.

Replaces the reference's whole DDP machinery (subprocess torch.distributed.run
launcher dist.py:26-61, NCCL process groups trainer.py:194-203, DDP gradient
hooks, DistributedSampler) with single-program JAX sharding: one 1-D 'data'
mesh over all chips, params/opt-state replicated, batches sharded along the
batch axis. XLA inserts the gradient all-reduce (the NCCL equivalent rides
ICI automatically); there is no per-rank process dance to reproduce.

For multi-host slices, call jax.distributed.initialize() before creating
the mesh and feed each host its local shard — shard_batch handles both
single- and multi-process layouts via make_array_from_process_local_data.
Exercised for real by tests/test_multihost.py: a 2-OS-process CPU cluster
(gloo collectives, 4 virtual devices per process) runs the full MGDT train
step and matches the single-process loss on the same global batch.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the local devices."""
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard along the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a host batch dict onto the mesh, sharded along batch dim.

    Works both single-process (device_put with sharding) and multi-process
    (each process contributes its local portion of the global batch).
    """
    sh = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return {k: put(v) for k, v in batch.items() if k != "metas"}


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def data_sharding_setup(variables, no_shard_env: str):
    """Common setup for inference-side data parallelism (val / predict /
    serve): a 1-D data mesh over the local devices with variables
    replicated onto it.

    Returns (ndev, batch_sharding, replicated_variables), or
    (0, None, variables) when sharding is off: a single device, the
    `no_shard_env` escape hatch set to "1", or a multi-process runtime —
    inference loops are single-host (each process would re-iterate the full
    source and fetching a multi-host global array raises on non-addressable
    shards); multi-host scaling is the trainer's shard_batch path.
    """
    import os
    ndev = jax.local_device_count()
    if (ndev <= 1 or jax.process_count() > 1
            or os.environ.get(no_shard_env, "0") == "1"):
        # Even without sharding, pin the params on device once: model init
        # keeps variables host-resident (numpy), and a jitted call with
        # numpy leaves re-uploads the whole tree on EVERY dispatch — through
        # a slow host<->device link that dominates end-to-end time (measured
        # ~950 ms/batch for the 44 MB l-scale tree on the 37 MB/s tunnel).
        return 0, None, jax.device_put(variables)
    mesh = create_mesh()
    return ndev, batch_sharding(mesh), replicate_tree(variables, mesh)


def pad_to_multiple(x: np.ndarray, m: int) -> np.ndarray:
    """Zero-pad a batch's leading dim up to the next multiple of m."""
    x = np.asarray(x)
    gb = -(-len(x) // m) * m
    if gb == len(x):
        return x
    return np.concatenate([x, np.zeros((gb - len(x), *x.shape[1:]), x.dtype)])


def create_mesh_2d(n_data: int, n_model: int,
                   axes=("data", "model")) -> Mesh:
    """2-D (data x model) mesh for combined DP + channel tensor-parallelism.

    Lay the model axis innermost so its collectives (the all-gathers /
    reduce-scatters around channel-sharded convs) ride neighboring-chip ICI
    links while data-parallel gradient all-reduce spans the outer axis —
    the standard ICI-friendly layout (scaling-book recipe; contrast with the
    reference's flat NCCL world, yolo/utils/dist.py:26-61)."""
    devs = jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_model), axes)


def tp_param_sharding(params, mesh: Mesh, model_axis: str = "model",
                      min_channels: int = 64):
    """Channel tensor-parallel layout for a conv-net param tree.

    Shards the trailing (output-channel) dimension of every array whose last
    dim is divisible by the model-axis size and at least `min_channels`
    wide — conv kernels are HWIO, dense kernels IO, and per-channel
    bias/scale/BN vectors follow their producing conv, so "shard the last
    axis" is layout-consistent across the whole tree: each model shard owns
    a channel slice end-to-end and XLA/GSPMD inserts the halo-free
    all-gathers only where a spatial conv consumes the full input-channel
    extent. Small vectors and odd-sized leaves stay replicated.

    Returns a pytree of NamedShardings (same structure as `params`).
    """
    size = mesh.shape[model_axis]

    def spec(x):
        shape = np.shape(x)
        if (shape and shape[-1] >= min_channels and shape[-1] % size == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [model_axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_tree_like(tree, shardings):
    """device_put a pytree with a matching pytree of shardings; extra leaves
    in optimizer state that don't mirror a param shape are replicated."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def fsdp_param_sharding(params, mesh: Mesh, axis: str = "data",
                        min_elems: int = 4096):
    """ZeRO-style fully-sharded layout over the data axis.

    Each param (and, via mirror_sharding, its optimizer/EMA buffers) is
    split along its largest axis-divisible dimension across the data-
    parallel workers; XLA all-gathers a param just before its op needs it
    and reduce-scatters its gradient — N-fold memory for params + opt
    state with only layout annotations (the reference has no analog; its
    DDP replicates everything per rank). Small leaves stay replicated.
    """
    size = mesh.shape[axis]

    def spec(x):
        shape = np.shape(x)
        if shape and int(np.prod(shape)) >= min_elems:
            # widest divisible dim gives the most even split
            cands = [d for d in range(len(shape)) if shape[d] % size == 0]
            if cands:
                d = max(cands, key=lambda i: shape[i])
                parts = [None] * len(shape)
                parts[d] = axis
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def mirror_sharding(params, params_sharding, tree, mesh: Mesh):
    """Sharding tree for an opt-state/EMA pytree: leaves whose shape matches
    a sharded param reuse that param's spec (SGD/Adam momentum buffers mirror
    the params they accompany); every other leaf — step counters, schedule
    scalars — is replicated."""
    by_shape = {}
    for p, s in zip(jax.tree.leaves(params), jax.tree.leaves(params_sharding)):
        by_shape.setdefault(np.shape(p), s)
    rep = replicated(mesh)
    return jax.tree.map(lambda x: by_shape.get(np.shape(x), rep), tree)


def pad_batch_to(batch: Dict, global_batch: int) -> Dict:
    """Pad a possibly-short final batch up to the static global batch size.

    Padding rows have mask_gt all-false so they contribute zero loss weight,
    but note the loss's `* batch_size` scaling counts them; trainers drop
    short batches instead (drop_last) and this is only used for val."""
    b = len(next(iter(batch.values())))
    if b == global_batch:
        return batch
    out = {}
    for k, v in batch.items():
        if k == "metas":
            out[k] = v
            continue
        pad = np.zeros((global_batch - b, *np.shape(v)[1:]), dtype=np.asarray(v).dtype)
        out[k] = np.concatenate([v, pad], axis=0)
    return out
