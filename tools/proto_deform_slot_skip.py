"""A/B: slot-skip via per-block hit predicates (@pl.when + VMEM scratch acc).

Slots whose row/col one-hot cannot fire anywhere in the block are skipped
at runtime; with near-zero offsets only ~16 of 64 slots are live.

VERDICT (v5e, b512 80^2 C32): REJECTED — bit-identical (max|d| 0.0) but
only 1.10x with concentrated offsets (65.5 vs 72.2 ms) and 0.62x with
sigma=0.7 offsets (116 ms): Mosaic lowers @pl.when around vector code to
predicated/masked execution plus a scratch-accumulator round-trip, so the
"skipped" slots still burn VPU issue slots and the worst case regresses.
The shipped kernel keeps the unconditional 64-slot walk. Together with
proto_deform_bf16_fma.py this pins the kernel at its VPU-FMA floor:
72 ms isolated at b512 (60 ms in-model = 22.5%% of serving per
profile_trace_ops infer mode), and the remaining serving time is intrinsic
conv work at 72%% of the HBM roofline."""
import sys, time, functools
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import mgdt_yolo_tpu.ops.pallas_deform as PD
from mgdt_yolo_tpu.ops.pallas_deform import _fields, _pad_cf, M, RB, K

B, H, W, Cin, Cout = 512, 80, 80, 32, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.bfloat16)
mask = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, H, W, K)), jnp.bfloat16))
off_small = jnp.asarray(rng.standard_normal((B, H, W, 2 * K)) * 0.1, jnp.bfloat16)
off_big = jnp.asarray(rng.standard_normal((B, H, W, 2 * K)) * 0.7, jnp.bfloat16)

def timeit(f, args, n=8):
    out = f(*args); jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n): out = f(*args)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3

base_f = jax.jit(PD.modulated_deform_conv2d_pallas)
print(f"baseline small-off: {timeit(base_f, (x, off_small, mask, wgt)):.1f} ms", flush=True)

def _kernel_skip(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, w_ref,
                 o_ref, acc_ref, *, C, W):
    r = pl.program_id(1)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]
    y0, fy, x0v, fx, wv = (y0_ref[0], fy_ref[0], x0_ref[0], fx_ref[0],
                           wv_ref[0])
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for q in range(M * M):
        qy, qx = divmod(q, M)
        yhit = jnp.any((y0 == qy) | (y0 == qy - 1))
        xhit = jnp.any((x0v == qx) | (x0v == qx - 1))

        @pl.when(yhit & xhit)
        def _(qy=qy, qx=qx):
            ay = jnp.where(y0 == qy, 1.0 - fy, 0.0) + \
                jnp.where(y0 == qy - 1, fy, 0.0)
            ax = jnp.where(x0v == qx, 1.0 - fx, 0.0) + \
                jnp.where(x0v == qx - 1, fx, 0.0)
            w_q = ay * ax * wv
            xs = slab[:, qy:qy + RB, qx:qx + W]
            w_qx = jnp.broadcast_to(w_q[:, None], (K, C, RB, W)) \
                .reshape(K * C, RB, W)
            xs_t = jnp.concatenate([xs] * K, axis=0)
            acc_ref[...] = acc_ref[...] + \
                w_qx.astype(jnp.float32) * xs_t.astype(jnp.float32)
    acc = acc_ref[...]
    wf = w_ref[...].astype(jnp.float32)
    rows = [jax.lax.dot_general(acc[:, i], wf,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[None]
            for i in range(RB)]
    o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)

def variant(x, offset, mask, weight):
    Bv, Hv, Wv, Ci = x.shape
    Co = weight.shape[-1]
    y0, fy, x0v, fx, wv = _fields(offset, mask, Hv, Wv)[:5]
    xp = _pad_cf(x)
    _, _, Hp, Wp = xp.shape
    wf = weight.reshape(K * Ci, Co)
    fspec = pl.BlockSpec((1, K, RB, Wv), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_skip, C=Ci, W=Wv),
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
            scratch_shapes=[pltpu.VMEM((K * Ci, RB, Wv), jnp.float32)],
        ),
    )(xp, y0, fy, x0v, fx, wv, wf)

var_f = jax.jit(variant)
for name, off in (("small-off", off_small), ("big-off", off_big)):
    tv = timeit(var_f, (x, off, mask, wgt))
    tb = timeit(base_f, (x, off, mask, wgt))
    a = jax.device_get(base_f(x, off, mask, wgt)).astype(np.float32)
    b = jax.device_get(var_f(x, off, mask, wgt)).astype(np.float32)
    print(f"{name}: skip {tv:.1f} ms vs base {tb:.1f} ms ({tb/tv:.2f}x), "
          f"max|d| {np.abs(a-b).max()}", flush=True)
