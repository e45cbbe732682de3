"""Benchmark harness: export-format sweep + raw throughput profiling.

Reference yolo/utils/benchmarks.py:44-130 exports all formats then validates
each; here the format set is the TPU-native one (flax live, stablehlo, npz)
and the metric is images/sec + optional val mAP on a provided dataset.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from . import LOGGER


def benchmark(model, imgsz: int = 640, formats: Optional[List[str]] = None,
              n_iters: int = 10, batch: int = 1, hard_fail: bool = False
              ) -> List[Dict]:
    """Time the model through each runtime backend.

    Args:
        model: a YOLO facade instance.
    Returns rows of {format, ok, images_per_sec, ms_per_image}.
    """
    import jax

    from ..nn.autobackend import AutoBackend
    rows = []
    formats = formats or ["flax", "stablehlo"]
    x = np.random.default_rng(0).uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    for fmt in formats:
        ok, ips = False, 0.0
        try:
            if fmt == "flax":
                backend = AutoBackend(model.model, imgsz)
            elif fmt == "stablehlo":
                out = model.export(format="stablehlo", imgsz=imgsz)
                backend = AutoBackend(out[0], imgsz)
            elif fmt == "npz":
                out = model.export(format="npz", imgsz=imgsz)
                rows.append({"format": fmt, "ok": True, "images_per_sec": 0.0,
                             "ms_per_image": 0.0, "note": "weights archive"})
                continue
            else:
                raise ValueError(f"unknown benchmark format {fmt}")
            backend.forward(x)  # warmup/compile
            times = []
            for _ in range(n_iters):
                t0 = time.perf_counter()
                jax.block_until_ready(backend.forward(x))
                times.append(time.perf_counter() - t0)
            times = sorted(times)[1:-1] or times
            ips = batch / (sum(times) / len(times))
            ok = True
        except Exception as e:
            LOGGER.warning(f"benchmark {fmt} failed: {e}")
            if hard_fail:
                raise
        rows.append({"format": fmt, "ok": ok,
                     "images_per_sec": round(ips, 2),
                     "ms_per_image": round(1000.0 / ips, 2) if ips else None})
    for r in rows:
        LOGGER.info(str(r))
    return rows
