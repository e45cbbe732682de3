"""A/B: per-tap static 6x6 window walk vs the shared 64-slot walk.

The shipped kernel walks all 8x8 window slots and, at each slot, FMAs the
full (K*C, RB, W) accumulator after building a K-times concatenated copy of
the slab slice. But a tap at grid position (ty, tx) with an in-window
(|off| <= 2 px) offset can only land its bilinear floor in
[ty, ty+4] x [tx, tx+4] — so with a per-tap clamp, tap k only ever touches
window slots [ty, ty+5] x [tx, tx+5]: a STATIC (python-unrolled) 6x6 walk
per tap. Work drops from 64 * K*C to 9 * 36 * C = 0.56x the FMAs, and the
per-slot 9x slab concat disappears (each tap FMAs its own (C, RB, W) slice
directly). Unlike proto_deform_slot_skip.py this is static structure, not
runtime predication, so Mosaic emits straight-line vector code.

Semantics: identical to the shipped kernel for offsets within +/-2 px
(where both are exact); offsets beyond that clamp to the tap's own 5x5
reach instead of the shared 8x8 window — a different (tighter) clamp in
the already-approximate regime.

NOTE (post-landing): the per-tap walk WON this A/B (1.72x, 138->80 ms
isolated b512 C64) and was merged into ops/pallas_deform.py — so the
"baseline" PD.modulated_deform_conv2d_pallas below now IS the per-tap
walk, and rerunning this script from HEAD compares the variant against
itself (~1.0x). To reproduce the recorded 1.72x, check out the
pre-tapwalk kernel (commit cited in PARITY.md §2.14) for the baseline
side. Kept for the variant implementation + parity harness.
"""
import sys, time, functools
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import mgdt_yolo_tpu.ops.pallas_deform as PD
from mgdt_yolo_tpu.ops.pallas_deform import _pad_cf, M, RB, K

B, H, W, Cin, Cout = 512, 80, 80, 64, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.bfloat16)
mask = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, H, W, K)), jnp.bfloat16))
off_small = jnp.asarray(rng.standard_normal((B, H, W, 2 * K)) * 0.1, jnp.bfloat16)
off_mid = jnp.asarray(np.clip(rng.standard_normal((B, H, W, 2 * K)) * 0.7,
                              -2.0, 2.0), jnp.bfloat16)


def timeit(f, args, n=8):
    out = f(*args); jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n): out = f(*args)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3


def _fields_tap(offset, mask_, H, W):
    """Per-tap-clamped sampling fields: y0 in [ty, ty+4], x0 in [tx, tx+4]."""
    Bv = offset.shape[0]
    P = H * W
    f32 = jnp.float32
    ty = (jnp.arange(K) // 3).astype(f32).reshape(1, 1, K)
    tx = (jnp.arange(K) % 3).astype(f32).reshape(1, 1, K)
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32) - 1,
                          jnp.arange(W, dtype=f32) - 1, indexing="ij")
    off = offset.reshape(Bv, P, K, 2).astype(f32)
    ry = ty + off[..., 0] + 2.0
    rx = tx + off[..., 1] + 2.0
    py = gy.reshape(1, P, 1) + ty + off[..., 0]
    px = gx.reshape(1, P, 1) + tx + off[..., 1]
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    def fr(r, t):
        r0 = jnp.clip(jnp.floor(r), t, t + 4.0)
        return r0, jnp.clip(r - r0, 0.0, 1.0)

    y0, fy = fr(ry, ty)
    x0, fx = fr(rx, tx)
    wv = mask_.reshape(Bv, P, K).astype(f32) * valid

    def bkhw(a):
        return a.transpose(0, 2, 1).reshape(Bv, K, H, W)

    return tuple(bkhw(a) for a in (y0, fy, x0, fx, wv))


def _kernel_tap(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, w_ref,
                o_ref, *, C, W):
    r = pl.program_id(1)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]
    accs = []
    for k in range(K):
        ty, tx = divmod(k, 3)
        y0 = y0_ref[0, k]
        fy = fy_ref[0, k]
        x0 = x0_ref[0, k]
        fx = fx_ref[0, k]
        wv = wv_ref[0, k]                         # (RB, W)
        axs = [jnp.where(x0 == qx, 1.0 - fx, 0.0) +
               jnp.where(x0 == qx - 1, fx, 0.0)
               for qx in range(tx, tx + 6)]
        acc = jnp.zeros((C, RB, W), jnp.float32)
        for qy in range(ty, ty + 6):
            ay = (jnp.where(y0 == qy, 1.0 - fy, 0.0) +
                  jnp.where(y0 == qy - 1, fy, 0.0)) * wv
            for j, qx in enumerate(range(tx, tx + 6)):
                w_q = (ay * axs[j]).astype(jnp.float32)     # (RB, W)
                xs = slab[:, qy:qy + RB, qx:qx + W]         # (C, RB, W)
                acc = acc + w_q[None] * xs.astype(jnp.float32)
        accs.append(acc)
    acc = jnp.concatenate(accs, axis=0)           # (K*C, RB, W)
    wf = w_ref[...].astype(jnp.float32)
    rows = [jax.lax.dot_general(acc[:, i], wf,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[None]
            for i in range(RB)]
    o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)


def variant(x, offset, mask_, weight):
    Bv, Hv, Wv, Ci = x.shape
    Co = weight.shape[-1]
    y0, fy, x0, fx, wv = _fields_tap(offset, mask_, Hv, Wv)
    xp = _pad_cf(x)
    _, _, Hp, Wp = xp.shape
    wf = weight.reshape(K * Ci, Co)
    fspec = pl.BlockSpec((1, K, RB, Wv), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_tap, C=Ci, W=Wv),
        out_shape=jax.ShapeDtypeStruct((Bv, Hv, Wv, Co), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bv, Hv // RB),
            in_specs=[pl.BlockSpec((1, Ci, Hp, Wp), lambda b, r: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      fspec, fspec, fspec, fspec, fspec,
                      pl.BlockSpec((K * Ci, Co), lambda b, r: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, RB, Wv, Co), lambda b, r: (b, r, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(xp, y0, fy, x0, fx, wv, wf)


if __name__ == "__main__":
    base_f = jax.jit(PD.modulated_deform_conv2d_pallas)
    var_f = jax.jit(variant)
    for name, off in (("small-off", off_small), ("clamped +/-2", off_mid)):
        tb = timeit(base_f, (x, off, mask, wgt))
        tv = timeit(var_f, (x, off, mask, wgt))
        a = jax.device_get(base_f(x, off, mask, wgt)).astype(np.float32)
        b = jax.device_get(var_f(x, off, mask, wgt)).astype(np.float32)
        print(f"{name}: tapwalk {tv:.1f} ms vs base {tb:.1f} ms "
              f"({tb/tv:.2f}x), max|d| {np.abs(a-b).max()}", flush=True)
