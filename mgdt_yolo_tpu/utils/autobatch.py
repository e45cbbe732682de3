"""Automatic batch-size estimation for batch=-1 (reference
yolo/utils/autobatch.py:15-71 polyfits CUDA memory; the TPU version measures
the compiled train-step's HBM footprint via XLA memory analysis and picks the
largest power-of-two batch fitting the chip's HBM budget).
"""
from __future__ import annotations

from typing import Optional

import jax

from . import LOGGER


def device_memory_bytes() -> Optional[int]:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    if d.platform == "tpu":
        return 16 * 1024 ** 3  # v5e HBM
    return 8 * 1024 ** 3


def autobatch(model_holder, imgsz: int = 640, fraction: float = 0.6,
              max_batch: int = 128) -> int:
    """Pick the largest batch whose compiled forward+backward fits in
    `fraction` of device memory."""
    import jax.numpy as jnp

    budget = device_memory_bytes() * fraction

    def step(vs, x):
        def loss(params):
            (out, _) = model_holder.model.apply(
                {"params": params, "batch_stats": vs.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in out[1])
        return jax.grad(loss)(vs["params"])

    best = 1
    b = 2
    while b <= max_batch:
        try:
            x = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), model_holder.dtype)
            compiled = jax.jit(step).lower(
                jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                             model_holder.variables), x).compile()
            mem = compiled.memory_analysis()
            used = getattr(mem, "temp_size_in_bytes", 0) + \
                getattr(mem, "argument_size_in_bytes", 0) + \
                getattr(mem, "output_size_in_bytes", 0)
            if used > budget:
                break
            best = b
            b *= 2
        except Exception as e:
            LOGGER.warning(f"autobatch probe failed at batch {b}: {e}")
            break
    LOGGER.info(f"autobatch: using batch {best} @ {imgsz}px "
                f"({fraction:.0%} of device memory budget)")
    return best
