#!/usr/bin/env python
"""Audit the windowed-deform semantics on a TRAINED checkpoint.

The TPU default dispatch (ops/deform.py method='auto') computes DCNv2 with a
per-tap clamped window — exact only for per-axis offsets in [-2, +3) of each
tap's rest position (reference semantics are unbounded: mmcv DCNv2,
/root/reference/nn/modules/block.py:17). This tool turns the README's
"trained offsets sit well inside the window" defense into numbers:

1. offset distribution: runs the trained model on the synthetic val set and
   captures every TOODHead `spatial_conv_offset` output (the 18 offset
   channels feeding DyDCNv2, nn/modules/head.py:177-180); reports per-level
   |offset| max / p99 / p99.9 and the fraction of (pixel, tap, axis) draws
   outside the exact window.
2. windowed-vs-exact output parity: the same val batch through the full
   decoded forward + val-protocol NMS twice — method='auto' (pallas on TPU)
   vs MGDT_DEFORM_EXACT=1 — and reports max |Δ| of decoded boxes/scores and
   detection-count mismatches.

Usage:  python tools/deform_window_audit.py runs/detect/NAME/weights/best \
            [--imgsz 320] [--batch 16] [--json out.json]
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def collect_offsets(mh, variables, img):
    """All spatial_conv_offset outputs for one batch: list of (B,H,W,27)."""
    import jax

    filt = lambda mdl, _name: "spatial_conv_offset" in (mdl.name or "")
    _, state = mh.model.apply(variables, img, train=False,
                              capture_intermediates=filt)
    outs = []
    for leaf in jax.tree.leaves(state["intermediates"]):
        a = np.asarray(leaf)
        if a.ndim == 4 and a.shape[-1] == 27:
            outs.append(a)
    assert outs, "no spatial_conv_offset intermediates captured"
    return sorted(outs, key=lambda a: -a.shape[1])  # level order P3,P4,P5


def offset_stats(off_levels):
    rows = []
    for lvl, om in enumerate(off_levels):
        off = om[..., :18].astype(np.float64).ravel()
        a = np.abs(off)
        # exact window per axis: offset in [-2, +3) of the tap rest position
        outside = float(np.mean((off < -2.0) | (off >= 3.0)))
        rows.append({
            "level": f"P{3 + lvl}", "n": int(off.size),
            "abs_max": float(a.max()),
            "p99": float(np.percentile(a, 99)),
            "p999": float(np.percentile(a, 99.9)),
            "frac_outside_window": outside,
        })
    return rows


def decoded_parity(mh, variables, img, iou=0.7, conf=0.001, max_det=300):
    """Full forward + NMS, auto (windowed on TPU) vs forced exact."""
    import jax
    import jax.numpy as jnp

    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    def build():
        # fresh closure per env state: method='auto' reads MGDT_DEFORM_EXACT
        # at trace time, so each jit must trace anew
        @jax.jit
        def infer(vs, x):
            x = x.astype(jnp.float32) / 255.0 if jnp.issubdtype(
                x.dtype, jnp.integer) else x
            decoded, _ = mh.model.apply(vs, x, train=False)
            det, counts = non_max_suppression(
                decoded, conf_thres=conf, iou_thres=iou, max_det=max_det,
                multi_label=True, pre_topk=4096, block=1024, nc=mh.nc)
            return decoded, det, counts
        return infer

    os.environ.pop("MGDT_DEFORM_EXACT", None)
    dec_a, det_a, cnt_a = jax.device_get(build()(variables, img))
    os.environ["MGDT_DEFORM_EXACT"] = "1"
    dec_e, det_e, cnt_e = jax.device_get(build()(variables, img))
    os.environ.pop("MGDT_DEFORM_EXACT", None)

    boxes_a, boxes_e = dec_a[:, :4], dec_e[:, :4]
    scores_a, scores_e = dec_a[:, 4:], dec_e[:, 4:]
    return {
        "decoded_box_max_abs_delta": float(np.abs(boxes_a - boxes_e).max()),
        "decoded_score_max_abs_delta": float(
            np.abs(scores_a - scores_e).max()),
        "nms_count_auto": int(cnt_a.sum()),
        "nms_count_exact": int(cnt_e.sum()),
        "nms_det_max_abs_delta": float(np.abs(det_a - det_e).max()),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="orbax checkpoint dir (weights/best)")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from mgdt_yolo_tpu import YOLO
    from mgdt_yolo_tpu.data.build import build_dataloader
    from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset

    y = YOLO(args.ckpt)
    mh = y.model
    import jax
    variables = jax.device_put(mh.variables)

    ds = SyntheticDetectionDataset(n=args.batch, imgsz=args.imgsz, nc=mh.nc,
                                   seed=1, augment=False)
    batch = next(iter(build_dataloader(ds, args.batch, args.imgsz,
                                       train=False, seed=0)))
    img = batch["img"]

    off_levels = collect_offsets(mh, variables, img)
    stats = offset_stats(off_levels)
    print(f"\noffset-magnitude distribution ({args.ckpt}, "
          f"{args.batch} val images @{args.imgsz}):")
    print(f"{'level':>6} {'n':>10} {'|off| max':>10} {'p99':>8} "
          f"{'p99.9':>8} {'frac outside [-2,3)':>20}")
    for r in stats:
        print(f"{r['level']:>6} {r['n']:>10} {r['abs_max']:>10.3f} "
              f"{r['p99']:>8.3f} {r['p999']:>8.3f} "
              f"{r['frac_outside_window']:>20.6f}")

    parity = decoded_parity(mh, variables, img)
    print("\nwindowed (auto) vs exact decoded parity on the same batch:")
    for k, v in parity.items():
        print(f"  {k}: {v}")

    out = {"ckpt": str(args.ckpt), "imgsz": args.imgsz,
           "offset_stats": stats, "parity": parity,
           "backend": jax.default_backend()}
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
