#!/usr/bin/env python
"""Roofline position of the compiled train step (fwd+loss+bwd+opt+EMA):
flops and bytes from XLA's cost analysis of the actual jitted program,
against the v5e walls. Complements tools/roofline.py (serving).

Usage: python tools/roofline_train.py [batch] [imgsz] [measured_ms]
  e.g. python tools/roofline_train.py 64 640 159.6
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9


def main(batch=64, imgsz=640, measured_ms=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.data.build import collate
    from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
    from mgdt_yolo_tpu.engine.trainer import (TrainState, build_optimizer,
                                              make_train_step)
    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    params = mh.variables["params"]
    tx = build_optimizer(params, "SGD", 0.01, 0.01, 0.937, 5e-4,
                         100, 1000, 10, 100, False, 0.8, nc=mh.nc)
    state = TrainState(
        params=params,
        batch_stats=mh.variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(np.array, params),
        step=jnp.int32(0), ema_updates=jnp.int32(0))
    step_fn = make_train_step(mh.model, criterion, tx)

    ds = SyntheticDetectionDataset(n=batch, imgsz=imgsz, nc=2, seed=0)
    batch_data = collate([ds[i] for i in range(batch)], imgsz,
                         max_gt=ds.max_labels(), train=True)

    lowered = jax.jit(step_fn).lower(state, batch_data)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    byt = float(cost.get("bytes accessed", 0.0))
    fpi, bpi = flops / batch, byt / batch
    ai = flops / byt if byt else float("nan")
    mxu_bound = V5E_PEAK_BF16 / fpi
    hbm_bound = V5E_HBM_BW / bpi if bpi else float("inf")
    bound = min(mxu_bound, hbm_bound)
    which = "HBM-bandwidth" if hbm_bound < mxu_bound else "MXU-compute"
    print(f"train step b{batch} @{imgsz}: {fpi / 1e9:.2f} GFLOP/img, "
          f"{bpi / 1e6:.1f} MB/img, AI={ai:.1f} flops/byte (ridge 241)")
    print(f"roofline: MXU bound {mxu_bound:.0f} img/s, HBM bound "
          f"{hbm_bound:.0f} img/s -> {which}-bound, "
          f"speed-of-light {bound:.0f} img/s")
    if measured_ms:
        ips = batch / float(measured_ms) * 1e3
        print(f"measured {float(measured_ms):.1f} ms ({ips:.0f} img/s) = "
              f"{100 * ips / bound:.1f}% of the {which} roofline "
              f"({100 * ips * fpi / V5E_PEAK_BF16:.1f}% MFU)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 640,
         a[2] if len(a) > 2 else None)
