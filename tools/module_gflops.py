#!/usr/bin/env python
"""C2f vs MSPA_C2f module cost at 32ch / 160px — the reference's module cost
protocol (nn/cal_module_GFLOPs.py:21-37), using XLA cost analysis instead of
thop.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def cost(module, c: int = 32, hw: int = 160):
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, hw, hw, c))
    vars_ = module.init(jax.random.PRNGKey(0), x, train=False)
    lowered = jax.jit(lambda v, xx: module.apply(v, xx, train=False)).lower(vars_, x)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0)) / 1e9
    n = sum(int(p.size) for p in jax.tree.leaves(vars_["params"]))
    return flops, n


def main():
    from mgdt_yolo_tpu.nn.modules.block import C2f, MSPA_C2f
    for name, mod in (("C2f", C2f(32, n=1)),
                      ("MSPA_C2f", MSPA_C2f(32, 32, n=1))):
        gflops, params = cost(mod)
        print(f"{name:>9}: {gflops:.3f} GFLOPs  {params:,} params @ 32ch 160px")


if __name__ == "__main__":
    main()
