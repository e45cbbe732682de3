"""Prototype: gather-free 'patch' formulation of modulated deform conv.

Exact path gathers B*P*K quad rows (per-index overhead bound on TPU).
Patch path: static 8x8 im2col around each output pixel (origin is a pure
function of the output grid -> 64 static shifted slices, NO gather), then
per-(pixel, tap) bilinear one-hot weights contracted against the patch on
the MXU. Exact whenever every tap's bilinear support stays inside the 8x8
window (universal +/-2 px offset coverage); violators clamp to the edge.

Usage: python tools/proto_deform_patch.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from mgdt_yolo_tpu.ops.deform import (modulated_deform_conv2d,
                                      modulated_deform_conv2d_patch)
from mgdt_yolo_tpu.ops.pallas_deform import modulated_deform_conv2d_pallas


def main(batch=128):
    H = W = 80
    C = 32
    Cout = 32
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((batch, H, W, C)), dt)
    # offsets ~ N(0, 0.8): the scale a trained offset conv produces
    offset = jnp.asarray(0.6 * rng.standard_normal((batch, H, W, 18)), dt)
    mask = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 9)), dt)
    wgt = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.1, dt)

    f_exact = jax.jit(lambda *a: modulated_deform_conv2d(*a, method="exact"))
    f_patch = jax.jit(lambda *a: modulated_deform_conv2d_patch(*a))

    def timeit(f, n=5):
        out = f(x, offset, mask, wgt)
        jax.device_get(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x, offset, mask, wgt)
        jax.device_get(out.ravel()[:1])
        return (time.perf_counter() - t0) / n, out

    te, oe = timeit(f_exact)
    tp, op = timeit(f_patch)
    f_pl = jax.jit(lambda *a: modulated_deform_conv2d_pallas(*a))
    tl, ol = timeit(f_pl)
    dl = np.abs(np.asarray(op, np.float32) - np.asarray(ol, np.float32))
    print(f"pallas: {tl * 1e3:.1f} ms  (vs patch {tp / tl:.2f}x, vs exact "
          f"{te / tl:.2f}x)  maxdiff-vs-patch {dl.max():.6f}")
    d = np.abs(np.asarray(oe, np.float32) - np.asarray(op, np.float32))
    print(f"exact: {te * 1e3:.1f} ms   patch: {tp * 1e3:.1f} ms   "
          f"speedup {te / tp:.2f}x")
    print(f"maxdiff {d.max():.6f}  meandiff {d.mean():.8f}  "
          f"out_scale {np.abs(np.asarray(oe, np.float32)).mean():.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
