#!/usr/bin/env python
"""Roofline analysis of the serving forward: is the model MXU-bound or
HBM-bound, and how close is the measured throughput to the hardware bound?

XLA's compiled cost analysis reports flops and bytes accessed for the whole
program; arithmetic intensity AI = flops/bytes decides which wall applies:

    bound_img_s = min(PEAK_FLOPS / flops_per_img, PEAK_HBM_BW / bytes_per_img)

For small-channel CNNs (yolov8n-scale) AI sits far below the v5e ridge point
(197 TF/s / 819 GB/s = 241 flops/byte), so the model is HBM-bound and "% of
MXU peak" (MFU) is the wrong yardstick — % of the HBM roofline is.

Usage: python tools/roofline.py [scale] [batch] [yaml] [measured_img_s]
  e.g. python tools/roofline.py n 512 mspa_c2f_gd_tood_yolov8.yaml 1718
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_PEAK_BF16 = 197e12   # FLOP/s
V5E_HBM_BW = 819e9       # bytes/s


def main(scale=None, batch=512, cfg="mspa_c2f_gd_tood_yolov8.yaml",
         measured=None, imgsz=640):
    import jax
    import jax.numpy as jnp

    from mgdt_yolo_tpu.nn.tasks import DetectionModel, yaml_model_load
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    model_cfg = dict(yaml_model_load(cfg), scale=scale) if scale else cfg
    mh = DetectionModel(model_cfg, dtype=jnp.bfloat16).fuse()
    variables = jax.device_put(mh.variables)

    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7)

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.bfloat16)
    cost = jax.jit(infer).lower(variables, x).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    byt = float(cost.get("bytes accessed", 0.0))
    if not byt:  # some backends split it per memory space
        byt = sum(v for k, v in cost.items()
                  if isinstance(v, float) and k.startswith("bytes accessed"))
    fpi, bpi = flops / batch, byt / batch
    ai = flops / byt if byt else float("nan")
    mxu_bound = V5E_PEAK_BF16 / fpi
    hbm_bound = V5E_HBM_BW / bpi if bpi else float("inf")
    bound = min(mxu_bound, hbm_bound)
    which = "HBM-bandwidth" if hbm_bound < mxu_bound else "MXU-compute"
    print(f"{cfg} scale={scale or 'n'} b{batch} @{imgsz}: "
          f"{fpi / 1e9:.2f} GFLOP/img, {bpi / 1e6:.1f} MB/img, "
          f"AI={ai:.1f} flops/byte (ridge 241)")
    print(f"roofline: MXU bound {mxu_bound:.0f} img/s, "
          f"HBM bound {hbm_bound:.0f} img/s -> {which}-bound, "
          f"speed-of-light {bound:.0f} img/s")
    if measured:
        measured = float(measured)
        print(f"measured {measured:.0f} img/s = {100 * measured / bound:.1f}% "
              f"of the {which} roofline "
              f"({100 * measured * fpi / V5E_PEAK_BF16:.1f}% MFU)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(scale=(a[0] if a and a[0] != "n" else None),
         batch=int(a[1]) if len(a) > 1 else 512,
         cfg=a[2] if len(a) > 2 else "mspa_c2f_gd_tood_yolov8.yaml",
         measured=a[3] if len(a) > 3 else None)
