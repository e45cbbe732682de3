"""Model introspection + timing helpers (TPU equivalents of the reference's
yolo/utils/torch_utils.py: model_info/get_flops via XLA cost analysis instead
of thop, Profile timers with device sync, seeded determinism helpers).

The name is kept for API familiarity; nothing here imports torch.
"""
from __future__ import annotations

import time
from contextlib import ContextDecorator
from typing import Dict, Optional

import jax
import numpy as np

from . import LOGGER


class Profile(ContextDecorator):
    """Stage timer with device synchronization (reference ops.py:19-55).

    Usage: with Profile() as p: ... ; p.dt has seconds.
    """

    def __init__(self, sync=None):
        self.t = 0.0
        self.dt = 0.0
        self._sync = sync  # optional array/pytree to block on

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False


def get_flops(model_holder, imgsz: int = 640) -> float:
    """Forward GFLOPs from XLA's cost analysis (replaces thop,
    reference torch_utils.py:220-245)."""
    import jax.numpy as jnp

    def fwd(vs, x):
        # train=True keeps the decode out of the count (raw maps only); BN
        # running stats must be declared mutable for that mode to trace.
        out, _ = model_holder.model.apply(vs, x, train=True,
                                          mutable=["batch_stats"])
        return out

    x = jnp.zeros((1, imgsz, imgsz, 3), model_holder.dtype)
    lowered = jax.jit(fwd).lower(model_holder.variables, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) / 1e9


def model_info(model_holder, imgsz: int = 640, verbose: bool = True) -> Dict:
    """layers / params / GFLOPs summary (reference torch_utils.py:163-245)."""
    n_layers = len(model_holder.specs)
    n_params = model_holder.num_params()
    try:
        gflops = get_flops(model_holder, imgsz)
    except Exception as e:  # cost analysis can be backend-dependent
        LOGGER.warning(f"flops analysis unavailable: {e}")
        gflops = 0.0
    if verbose:
        LOGGER.info(f"model summary: {n_layers} layers, {n_params:,} parameters, "
                    f"{gflops:.1f} GFLOPs @ {imgsz}px")
    return {"layers": n_layers, "params": n_params, "gflops": gflops}


def profile_layers(model_holder, imgsz: int = 256, runs: int = 10):
    """Per-layer wall-time profile (reference BaseModel._profile_one_layer,
    nn/tasks.py:96-119): times each layer's isolated jitted forward."""
    import jax.numpy as jnp

    from ..nn.tasks import GraphModel
    results = []
    specs = model_holder.specs
    x = jnp.zeros((1, imgsz, imgsz, 3), model_holder.dtype)
    for upto in range(1, len(specs) + 1):
        sub = GraphModel(specs[:upto], model_holder.save,
                         strides=model_holder.stride, dtype=model_holder.dtype)
        try:
            # train=True puts BN in update mode: batch_stats must be mutable
            # or flax raises and every probe would read NaN
            fn = jax.jit(lambda vs, xx: sub.apply(
                vs, xx, train=True, mutable=["batch_stats"]))
            out = fn(model_holder.variables, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(runs):
                out = fn(model_holder.variables, x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / runs * 1e3
        except Exception:
            dt = float("nan")
        results.append(dt)
    # per-layer = prefix deltas
    deltas = [results[0]] + [results[i] - results[i - 1]
                             for i in range(1, len(results))]
    for spec, d in zip(specs, deltas):
        LOGGER.info(f"{spec.i:>3} {spec.name:<28} {d:8.3f} ms")
    return deltas


def start_trace(log_dir: str = "/tmp/mgdt_trace"):
    """jax.profiler trace capture (TPU equivalent of the reference's CUDA
    event timers; view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace():
    jax.profiler.stop_trace()


def init_seeds(seed: int = 0, deterministic: bool = True):
    """Seed host-side RNGs (device RNG is explicit via jax.random keys —
    the reference's torch.use_deterministic_algorithms dance
    (torch_utils.py:314-332) has no analog: XLA is deterministic by default)."""
    import random
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Cosine ramp y1->y2 (reference torch_utils.py:309)."""
    import math

    def fn(x):
        return ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1
    return fn


def strip_optimizer(ckpt_dir: str, out_dir: Optional[str] = None):
    """Deploy-strip a checkpoint: keep EMA params only (reference
    torch_utils.py:370-407 halves + strips)."""
    import orbax.checkpoint as ocp
    from pathlib import Path
    ck = ocp.PyTreeCheckpointer().restore(str(Path(ckpt_dir).absolute()))
    params = ck.get("ema_params") or ck["params"]
    out = {"params": jax.tree.map(lambda a: np.asarray(a, np.float16), params),
           "batch_stats": ck.get("batch_stats", {}),
           "stripped": True}
    dst = Path(out_dir or (str(ckpt_dir) + "_stripped"))
    if dst.exists():
        import shutil
        shutil.rmtree(dst)
    ocp.PyTreeCheckpointer().save(dst.absolute(), out)
    return str(dst)
