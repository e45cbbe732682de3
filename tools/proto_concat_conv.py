#!/usr/bin/env python
"""Probe: does splitting a channel-concat feeding a 1x1 conv into partial
convs summed (identical math; the concat never materializes in HBM) beat
XLA's handling of Conv1x1(concat(...)) on TPU?

The MGDT graph is concat-heavy (C2f/MSPA tail concats, SimFusion_4in's
4-scale concat, GD injection) and the n-scale model is HBM-bandwidth-bound
(tools/roofline.py), so every materialized concat costs write+read of the
full concatenated tensor.

VERDICT (2026-08-18, v5e, two runs): REJECTED end-to-end. In isolation the
split form wins 1.70x at the C2f-tail shape (jit-argument inputs force the
concat to materialize), but wiring it through every CSP/SPPF/HG/MSPA tail
in the real model regressed bench.py 1718 -> 1515 img/s (-12%). Inside one
fused program XLA already writes producer outputs straight into the concat
buffer, so the "saved" materialization never existed and the split form
only adds fp32 partial-accumulator traffic + worse fusion. Do not re-apply
without an end-to-end win on bench.py.

Usage: python tools/proto_concat_conv.py [H] [chunks] [C] [O] [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(fn, args, iters=8):
    out = fn(*args)
    import jax
    jax.device_get(out.ravel()[:1])  # fence (block_until_ready lies here)
    windows = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(out.ravel()[:1])
        windows.append((time.perf_counter() - t0) / iters)
    return min(windows)


def main(H=160, chunks=4, C=32, O=64, B=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
          for _ in range(chunks)]
    w = jnp.asarray(rng.standard_normal((1, 1, chunks * C, O)) * 0.05,
                    jnp.bfloat16)

    dn = jax.lax.conv_dimension_numbers((B, H, H, chunks * C), (1, 1, chunks * C, O),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def fused(*xs):
        x = jnp.concatenate(xs, axis=-1)
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    dn1 = jax.lax.conv_dimension_numbers((B, H, H, C), (1, 1, C, O),
                                         ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def split(*xs):
        acc = None
        for i, x in enumerate(xs):
            wi = jax.lax.slice_in_dim(w, i * C, (i + 1) * C, axis=2)
            y = jax.lax.conv_general_dilated(x, wi, (1, 1), "SAME",
                                             dimension_numbers=dn1)
            acc = y if acc is None else acc + y
        return acc

    a = fused(*xs)
    b = split(*xs)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    tf = bench(fused, xs)
    ts = bench(split, xs)
    print(f"{B}x{H}^2 concat({chunks}x{C})->1x1x{O}: "
          f"fused {tf * 1e3:.2f} ms, split {ts * 1e3:.2f} ms "
          f"({tf / ts:.2f}x), max|d|={err:.2e}")


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
