"""Prototype: space-to-depth reformulation of the 3-channel stem conv.

The flagship stem (reference yolo/v8 yaml layer 0: Conv(16, 3, 2) at 640px)
contracts only kh*kw*Cin = 27 values per output — the strided 3x3 window
extraction over the full-res 640^2 input is the expensive part on TPU, not
the math. Rewriting it as space-to-depth(2) + a 2x2 stride-1 conv on 12
channels produces bit-identical outputs (the 3x3/s2 taps map 1:1 into a 2x2
window over 2x2 pixel cells, with the unused (row-parity 0, cell 0) slots
zeroed) while reading the input once, densely, at 320^2.

Usage: python tools/proto_stem_s2d.py [batch]
Prints timings for the XLA-native stride-2 conv vs the s2d formulation plus
a max|delta| exactness check. Decides whether the model graph should adopt
s2d for stride-2 convs whose input channels underfill the MXU.

VERDICT (2026-08-18, v5e, b128): REJECTED — 0.92x (native 6.18 ms, s2d
6.75 ms). XLA/Mosaic already handles the strided 3-channel window
extraction well; the 4*Cin=12-channel reformulation still underfills the
MXU and pays an extra reshape pass. Keep the stock stride-2 stem.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def s2d_weights(w):
    """Map HWIO (3,3,Cin,Cout) stride-2 weights onto (2,2,4*Cin,Cout).

    Tap r = 2i-1+di lives in pixel-cell p = r//2 with parity a = r%2:
    di 0 -> (cell i-1, a=1), di 1 -> (cell i, a=0), di 2 -> (cell i, a=1);
    window index u = p - (i-1). s2d channel layout: a*2*Cin + b*Cin + c.
    """
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    tap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # di -> (u, a)
    for di in range(3):
        u, a = tap[di]
        for dj in range(3):
            v, b = tap[dj]
            k = k.at[u, v, (a * 2 + b) * cin:(a * 2 + b + 1) * cin, :].set(
                w[di, dj])
    return k


def main(batch=128, imgsz=640, cout=16):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, imgsz, imgsz, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, cout)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.bfloat16)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    @jax.jit
    def stem_native(x):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return silu(y + b)

    k = s2d_weights(w)

    @jax.jit
    def stem_s2d(x):
        n, h, wd, c = x.shape
        y = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(n, h // 2, wd // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            y, k, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return silu(y + b)

    a0 = stem_native(x)
    a1 = stem_s2d(x)
    delta = float(jnp.max(jnp.abs(a0.astype(jnp.float32) -
                                  a1.astype(jnp.float32))))
    print(f"max|delta| = {delta:.3e}  (shapes {a0.shape} vs {a1.shape})",
          flush=True)

    def timeit(fn, label):
        def sync(out):
            jax.device_get(out.ravel()[:1])
        sync(fn(x))
        wins = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(x)
            sync(out)
            wins.append((time.perf_counter() - t0) / 10)
            best = sorted(wins)[:2]
            if len(wins) >= 4 and best[1] / best[0] < 1.02:
                break
        print(f"{label}: {min(wins) * 1e3:.3f} ms  (b{batch})", flush=True)
        return min(wins)

    t_native = timeit(stem_native, "native 3x3/s2 conv + SiLU")
    t_s2d = timeit(stem_s2d, "s2d(2) + 2x2/s1 conv + SiLU")
    print(f"speedup: {t_native / t_s2d:.2f}x", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
