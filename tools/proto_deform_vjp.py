"""TPU smoke + timing for the differentiable Pallas deform path.

Compiles fwd+bwd of modulated_deform_conv2d_pallas_vjp at MGDT training
shapes (stride-8 head at 640px), checks grads against the XLA patch
formulation, and times both against the patch path's fwd+bwd.

Usage: python tools/proto_deform_vjp.py [B] [HW] [C]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(B=32, HW=80, C=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.ops.deform import modulated_deform_conv2d_patch
    from mgdt_yolo_tpu.ops.pallas_deform import \
        modulated_deform_conv2d_pallas_vjp

    rng = np.random.default_rng(0)
    O = C
    x = jnp.asarray(rng.standard_normal((B, HW, HW, C)), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (B, HW, HW, 18)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, jnp.bfloat16)
    cot = jnp.asarray(rng.standard_normal((B, HW, HW, O)), jnp.float32)

    def loss_pallas(x, off, mask, w):
        out = modulated_deform_conv2d_pallas_vjp(x, off, mask, w)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_patch(x, off, mask, w):
        out = modulated_deform_conv2d_patch(x, off, mask, w)
        return jnp.sum(out.astype(jnp.float32) * cot)

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))
    gx = jax.jit(jax.grad(loss_patch, argnums=(0, 1, 2, 3)))

    def run(fn, tag):
        t0 = time.perf_counter()
        out = fn(x, off, mask, w)
        jax.device_get(out[1].ravel()[:1])
        print(f"{tag} compile+1st: {time.perf_counter() - t0:.1f} s",
              flush=True)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x, off, mask, w)
        jax.device_get(out[1].ravel()[:1])
        dt = (time.perf_counter() - t0) / n * 1e3 - 27  # tunnel overhead
        print(f"{tag} fwd+bwd: {dt:.1f} ms", flush=True)
        return out

    op = run(gp, "pallas_vjp")
    ox = run(gx, "patch     ")
    for name, a, b in zip(("x", "offset", "mask", "weight"), ox, op):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-6
        print(f"grad {name}: max rel-to-peak delta "
              f"{np.abs(a - b).max() / scale:.2e}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(v) for v in a))
