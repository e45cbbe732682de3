"""Split timings for the patch deform kernel's three stages on the TPU:
im2col, bilinear-weight build, and the sampling+conv contractions.

Each stage is jitted standalone with realistic inputs; sums exceed the fused
whole (XLA fuses across stages in the real kernel) but the ranking shows
where the time goes.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main(B=32, H=80, W=80, C=32, M=8, K=9):  # B=32 == the lax.map chunk
    P = H * W
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    ry = jnp.asarray(2.0 + rng.uniform(-1.5, 1.5, (B, P, K)), jnp.float32)
    rx = jnp.asarray(2.0 + rng.uniform(-1.5, 1.5, (B, P, K)), jnp.float32)
    w2d = jnp.asarray(rng.uniform(0, 1, (B, P, K, M * M)), dt)
    patch_in = jnp.asarray(rng.standard_normal((B, P, C, M * M)), dt)
    wgt = jnp.asarray(rng.standard_normal((K, C, C)) * 0.1, dt)

    @jax.jit
    def stage_im2col(x):
        pat = jax.lax.conv_general_dilated_patches(
            x, filter_shape=(M, M), window_strides=(1, 1),
            padding=((3, M - 4), (3, M - 4)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pat.reshape(B, P, C, M * M)

    @jax.jit
    def stage_w2d(ry, rx):
        f32 = jnp.float32

        def axis_w(r):
            r0 = jnp.clip(jnp.floor(r), 0, M - 2)
            f = jnp.clip(r - r0, 0.0, 1.0)
            slots = jnp.arange(M, dtype=f32)
            oh0 = (slots == r0[..., None]).astype(f32)
            oh1 = (slots == (r0 + 1)[..., None]).astype(f32)
            return oh0 * (1 - f)[..., None] + oh1 * f[..., None]

        return jnp.einsum("bpki,bpkj->bpkij", axis_w(ry).astype(dt),
                          axis_w(rx).astype(dt)).reshape(B, P, K, M * M)

    @jax.jit
    def stage_contract(w2d, patch):
        s = jnp.einsum("bpkq,bpcq->bpkc", w2d, patch)
        return jnp.einsum("bpkc,kco->bpo", s, wgt,
                          preferred_element_type=jnp.float32)

    w2d_t = jnp.asarray(rng.uniform(0, 1, (B, P, M * M, K)), dt)
    patch_q = jnp.asarray(rng.standard_normal((B, P, M * M, C)), dt)

    @jax.jit
    def stage_contract_t(w2d_t, patch_q):
        # contraction over q as second-minor for both operands
        s = jnp.einsum("bpqk,bpqc->bpkc", w2d_t, patch_q)
        return jnp.einsum("bpkc,kco->bpo", s, wgt,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def stage_im2col_concat(x):
        # two-stage channel concat: q-major feature order qy*(M*C)+qx*C+c,
        # lane-aligned copies only (no one-hot conv like the patches op)
        xpad = jnp.pad(x, ((0, 0), (3, M - 4), (3, M - 4), (0, 0)))
        cols = jnp.concatenate([xpad[:, :, qx:qx + W, :] for qx in range(M)],
                               axis=-1)
        pat = jnp.concatenate([cols[:, qy:qy + H] for qy in range(M)], axis=-1)
        return pat.reshape(B, P, M * M, C)

    print(f"im2col:        {timeit(stage_im2col, (x,)) * 1e3:7.1f} ms")
    print(f"im2col_concat: {timeit(stage_im2col_concat, (x,)) * 1e3:7.1f} ms")
    print(f"w2d:           {timeit(stage_w2d, (ry, rx)) * 1e3:7.1f} ms")
    print(f"contract:      {timeit(stage_contract, (w2d, patch_in)) * 1e3:7.1f} ms")
    print(f"contract_t:    {timeit(stage_contract_t, (w2d_t, patch_q)) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
