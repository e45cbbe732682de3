#!/usr/bin/env python
"""Package a trained MGDT run into the COMMITTED bench weights artifact.

bench.py's flagship protocol needs trained weights in a clean clone
(VERDICT r4 weak #1: the r4 driver bench silently fell back to random
because the checkpoint it pointed at was an uncommitted training artifact).
This takes a training run's best checkpoint (EMA weights preferred, like
the reference's strip_optimizer flow) and writes `weights/mgdt_n_synth.npz`
+ metadata through the standard Exporter — the metadata carries
`deform_semantics` so bench.py pins the kernel dispatch the weights were
trained under.

Usage: python tools/make_bench_weights.py [runs/detect/ab_windowed_s0/weights/best]
"""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1
               else REPO / "runs/detect/ab_windowed_s0/weights/best")
    assert src.is_dir(), f"no checkpoint at {src}"
    import jax

    jax.config.update("jax_platforms", "cpu")  # packaging needs no TPU

    from mgdt_yolo_tpu.engine.exporter import Exporter
    from mgdt_yolo_tpu.engine.trainer import BaseTrainer
    from mgdt_yolo_tpu.nn.tasks import DetectionModel

    ck = BaseTrainer.load_checkpoint(src)
    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml")
    mh.variables = {"params": ck.get("ema_params") or ck["params"],
                    "batch_stats": ck.get("batch_stats", {})}
    sidecar = src.parent / f"{src.name}.json"
    sem = None
    if sidecar.is_file():
        sem = json.loads(sidecar.read_text()).get("deform_semantics")
        if sem in ("exact", "windowed"):
            mh.set_deform_semantics(sem)
    out_dir = REPO / "weights"
    ex = Exporter(overrides={"format": "npz", "imgsz": 640,
                             "project": str(out_dir)})
    # Exporter names artifacts after the model yaml stem; rename to the
    # stable committed name bench.py looks for
    paths = ex(mh, fmt="npz")
    src_npz = Path(paths[0])
    dst = out_dir / "mgdt_n_synth.npz"
    src_npz.rename(dst)
    meta_src = src_npz.parent / f"{src_npz.stem}_metadata.json"
    meta_dst = out_dir / "mgdt_n_synth_metadata.json"
    if meta_src.is_file():
        meta_src.rename(meta_dst)
    print(f"wrote {dst} ({dst.stat().st_size / 1e6:.1f} MB) "
          f"deform_semantics={sem}")


if __name__ == "__main__":
    main()
