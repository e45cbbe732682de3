"""A/B: f32 vs bf16 slot-FMA in the fused deform kernel at serving shapes.

VERDICT (v5e, b512 80^2 C32): REJECTED — bf16 products in the 64-slot walk
measure 0.80x the f32 baseline (89.8 vs 72.2 ms isolated op): Mosaic pays a
per-slot convert on the (K*C, RB, W) product and gets no 2x packing back.
The kernel keeps f32 slot-FMA with f32 accumulation.

Also tried and rejected without a prototype: restricting each tap's slot
walk to its 6x6 reachable subwindow (1.8x fewer FMAs) — breaks the
shared-window clamp semantics for |offset| > 2 px, which the patch-path
parity tests pin down.
"""
import sys, time, functools
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import mgdt_yolo_tpu.ops.pallas_deform as PD
from mgdt_yolo_tpu.ops.pallas_deform import (_fields, _pad_cf, M, RB, K)

B, H, W, Cin, Cout = 512, 80, 80, 32, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
off = jnp.asarray(rng.standard_normal((B, H, W, 2 * K)) * 0.7, jnp.bfloat16)
mask = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, H, W, K)), jnp.bfloat16))
wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.bfloat16)

def timeit(f, n=8):
    out = f()
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3

base_f = jax.jit(PD.modulated_deform_conv2d_pallas)
base = lambda: base_f(x, off, mask, wgt)
t = timeit(base)
print(f"baseline f32 slot-FMA: {t:.1f} ms")

def _kernel_bf16(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, w_ref,
                 o_ref, *, C, W):
    r = pl.program_id(1)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]
    y0, fy, x0v, fx, wv = y0_ref[0], fy_ref[0], x0_ref[0], fx_ref[0], wv_ref[0]
    acc = jnp.zeros((K * C, RB, W), jnp.float32)
    for q in range(M * M):
        qy, qx = divmod(q, M)
        ay = jnp.where(y0 == qy, 1.0 - fy, 0.0) + jnp.where(y0 == qy - 1, fy, 0.0)
        ax = jnp.where(x0v == qx, 1.0 - fx, 0.0) + jnp.where(x0v == qx - 1, fx, 0.0)
        w_q = (ay * ax * wv).astype(jnp.bfloat16)
        xs = slab[:, qy:qy + RB, qx:qx + W]
        w_qx = jnp.broadcast_to(w_q[:, None], (K, C, RB, W)).reshape(K * C, RB, W)
        xs_t = jnp.concatenate([xs] * K, axis=0)
        acc = acc + (w_qx * xs_t).astype(jnp.float32)
    wf = w_ref[...].astype(jnp.float32)
    rows = [jax.lax.dot_general(acc[:, i], wf,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[None]
            for i in range(RB)]
    o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)

def variant(x, offset, mask, weight):
    Bv, Hv, Wv, Ci = x.shape
    _, _, _, Co = weight.shape
    y0, fy, x0v, fx, wv = _fields(offset, mask, Hv, Wv)[:5]
    xp = _pad_cf(x)
    _, _, Hp, Wp = xp.shape
    wf = weight.reshape(K * Ci, Co)
    fspec = pl.BlockSpec((1, K, RB, Wv), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_bf16, C=Ci, W=Wv),
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
    )(xp, y0, fy, x0v, fx, wv, wf)

var_f = jax.jit(variant)
var = lambda: var_f(x, off, mask, wgt)
tv = timeit(var)
print(f"bf16 slot-FMA:        {tv:.1f} ms  ({t/tv:.2f}x)")
a = jax.device_get(base()).astype(np.float32)
b = jax.device_get(var()).astype(np.float32)
rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
print("max rel delta vs f32 path:", rel)
