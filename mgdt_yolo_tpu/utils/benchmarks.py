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
              n_iters: int = 10, batch: int = 1, hard_fail: bool = False,
              data: Optional[object] = None, val_batches: int = 4,
              ) -> List[Dict]:
    """Export-format sweep: time each runtime backend AND validate its mAP
    on a dataset (reference benchmark(), yolo/utils/benchmarks.py:44-130 —
    export -> predict smoke -> val metric per format).

    Args:
        model: a YOLO facade instance.
        data: optional dataset (or 'synthetic') to mAP-validate each backend
            on `val_batches` batches; None skips the val sweep (pure timing).
    Returns rows of {format, ok, images_per_sec, ms_per_image, map50}.
    """
    import jax

    from ..nn.autobackend import AutoBackend
    rows = []
    formats = formats or ["flax", "stablehlo"]
    x = np.random.default_rng(0).uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)

    val_ds = None
    if data is not None:
        if data == "synthetic" or data is True:
            from ..data.dataset import SyntheticDetectionDataset
            val_ds = SyntheticDetectionDataset(n=16, imgsz=imgsz,
                                               nc=model.model.nc, seed=0)
        else:
            val_ds = data

    def _validate(backend) -> Optional[float]:
        """Run the real DetectionValidator over the backend (its forward
        substituted for the live model's) — the reference validates each
        exported format the same way (benchmarks.py:90-104)."""
        if val_ds is None:
            return None
        from types import SimpleNamespace

        from ..cfg import get_cfg
        from ..engine.validator import DetectionValidator

        holder = SimpleNamespace(
            nc=model.model.nc, names=model.model.names,
            stride=model.model.stride, variables={},
            model=SimpleNamespace(
                apply=lambda vs, img, train=False, **kw:
                (backend.forward_device(img), None)))
        args = get_cfg(overrides={"imgsz": imgsz, "batch": batch,
                                  "conf": 0.001, "mode": "val"})
        res = DetectionValidator(args=args)(holder, variables={},
                                            dataset=val_ds,
                                            max_batches=val_batches)
        return round(float(res["map50"]), 4)

    for fmt in formats:
        ok, ips, map50 = False, 0.0, None
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
            map50 = _validate(backend)
            ok = True
        except Exception as e:
            LOGGER.warning(f"benchmark {fmt} failed: {e}")
            if hard_fail:
                raise
        rows.append({"format": fmt, "ok": ok,
                     "images_per_sec": round(ips, 2),
                     "ms_per_image": round(1000.0 / ips, 2) if ips else None,
                     "map50": map50})
    for r in rows:
        LOGGER.info(str(r))
    return rows
