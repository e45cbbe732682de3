"""Eval-time Conv+BN folding (the reference's `fuse()`, nn/tasks.py:121-146).

Folds every BatchNorm that follows a bias-free conv into the conv kernel and
a new bias, producing a variables tree whose BN params are identity
(scale=1, bias=0, mean=0, var=1). The graph is unchanged — an identity BN is
free after XLA constant-folds it — so the SAME GraphModel/compiled program
serves fused and unfused weights, and exported artifacts carry the fold.

w' = w * scale / sqrt(var + eps);  b' = bias - mean * scale / sqrt(var + eps)
is materialized as an identity-BN whose bias carries b' (convs stay
bias-free, matching the torch fuse which moves b' into the conv bias —
numerically identical).
"""
from __future__ import annotations

import copy
from typing import Dict, Tuple

import numpy as np

from ..utils import LOGGER

_BN_EPS = 1e-3  # reference initialize_weights sets bn.eps = 1e-3


def fuse_conv_bn(variables: Dict) -> Tuple[Dict, int]:
    """Return (fused_variables, n_folded). Input tree is not mutated."""
    out = copy.deepcopy(variables)
    params = out.get("params", {})
    stats = out.get("batch_stats", {})
    n = 0

    def walk(p: Dict, s: Dict):
        nonlocal n
        for key in list(p.keys()):
            val = p[key]
            if not isinstance(val, dict):
                continue
            # pattern: {conv: {kernel}, norm: {bn: {scale,bias}}} + stats norm/bn
            if ("conv" in val and isinstance(val["conv"], dict)
                    and "kernel" in val["conv"] and "norm" in val
                    and isinstance(val["norm"], dict) and "bn" in val["norm"]
                    and key in s and "norm" in s.get(key, {})):
            # (guard below re-checks the stats path)
                bn_p = val["norm"]["bn"]
                bn_s = s[key]["norm"]["bn"]
                kernel = np.asarray(val["conv"]["kernel"], np.float32)
                scale = np.asarray(bn_p["scale"], np.float32)
                bias = np.asarray(bn_p["bias"], np.float32)
                mean = np.asarray(bn_s["mean"], np.float32)
                var = np.asarray(bn_s["var"], np.float32)
                g = scale / np.sqrt(var + _BN_EPS)
                val["conv"]["kernel"] = kernel * g  # broadcast over out-chan
                # Conv2: BN normalizes conv(x) + cv2(x), so the parallel
                # bias-free 1x1 branch (a raw kernel with no norm of its
                # own) must absorb the same gain or fused output is off by
                # cv2(x) * (1 - g)
                if ("cv2" in val and isinstance(val["cv2"], dict)
                        and "kernel" in val["cv2"]
                        and "norm" not in val["cv2"]):
                    val["cv2"]["kernel"] = np.asarray(
                        val["cv2"]["kernel"], np.float32) * g
                bn_p["scale"] = np.ones_like(scale)
                bn_p["bias"] = bias - mean * g
                bn_s["mean"] = np.zeros_like(mean)
                bn_s["var"] = np.ones_like(var) - _BN_EPS  # sqrt(var+eps)=1
                n += 1
                # recurse into remaining children (nested convs inside blocks)
                walk({k: v for k, v in val.items() if k not in ("conv", "norm")},
                     s.get(key, {}))
            else:
                walk(val, s.get(key, {}) if isinstance(s.get(key), dict) else {})

    walk(params, stats)
    LOGGER.info(f"fused {n} Conv+BN pairs")
    return out, n
