"""Prototype: int8 vs bf16 conv throughput on the v5e MXU.

v5e quotes ~2x int8 TOPS over bf16. This times a representative mid-network
conv both ways (weights pre-quantized per-channel, activations quantized
per-tensor inline, int32 accumulation, dequant fused into the epilogue) to
decide whether an int8 serving path is worth building into the framework.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main(B=128, H=80, W=80, C=128, O=128, k=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, k, C, O)) * 0.1, jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    # per-channel weight scales, per-tensor activation scale
    wq = np.clip(np.round(np.asarray(w, np.float32)
                          / (np.abs(np.asarray(w, np.float32)).max((0, 1, 2))
                             / 127.0 + 1e-12)), -127, 127).astype(np.int8)
    wq = jnp.asarray(wq)
    wscale = jnp.asarray(np.abs(np.asarray(w, np.float32)).max((0, 1, 2))
                         / 127.0, jnp.float32)

    @jax.jit
    def conv_int8(x, wq, wscale):
        ascale = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (ascale * wscale)).astype(jnp.bfloat16)

    tb = timeit(conv_bf16, (x, w))
    ti = timeit(conv_int8, (x, wq, wscale))
    flops = 2 * B * H * W * C * O * k * k
    print(f"bf16: {tb * 1e3:7.2f} ms  ({flops / tb / 1e12:5.1f} TF/s)")
    print(f"int8: {ti * 1e3:7.2f} ms  ({flops / ti / 1e12:5.1f} TOP/s) "
          f"speedup {tb / ti:.2f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
