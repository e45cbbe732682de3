"""Dataset utilities: label verification, polygon rasterization, dataset
yaml resolution, COCO conversion (reference yolo/data/utils.py:63-266,
converter.py:28, annotator.py:8).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def verify_image_label(img_path: str, label_path: str, num_cls: int
                       ) -> Tuple[bool, str]:
    """Validate one image/label pair (reference utils.py:63-134): readable
    image, sane size, well-formed normalized labels, class ids in range."""
    try:
        img = cv2.imread(str(img_path))
        if img is None:
            return False, f"unreadable image {img_path}"
        h, w = img.shape[:2]
        if h < 10 or w < 10:
            return False, f"image too small {w}x{h}"
        lp = Path(label_path)
        if lp.is_file():
            rows = [l.split() for l in lp.read_text().splitlines() if l.strip()]
            for r in rows:
                if len(r) < 5:
                    return False, f"label row with {len(r)} fields in {label_path}"
                c = float(r[0])
                if not c.is_integer() or not 0 <= int(c) < num_cls:
                    return False, f"class {c} out of range [0, {num_cls})"
                vals = np.asarray(r[1:5], np.float32)
                if (vals < 0).any() or (vals > 1).any():
                    return False, f"non-normalized coords in {label_path}"
        return True, ""
    except Exception as e:
        return False, str(e)


def polygon2mask(imgsz: Tuple[int, int], polygons: List[np.ndarray],
                 color: int = 1, downsample_ratio: int = 1) -> np.ndarray:
    """Rasterize polygons into a mask (reference utils.py:137-160)."""
    mask = np.zeros(imgsz, dtype=np.uint8)
    polys = [np.asarray(p, dtype=np.int32).reshape(-1, 2) for p in polygons]
    cv2.fillPoly(mask, polys, color=color)
    if downsample_ratio > 1:
        nh, nw = imgsz[0] // downsample_ratio, imgsz[1] // downsample_ratio
        mask = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_NEAREST)
    return mask


def polygons2masks(imgsz, segments: List[np.ndarray], color: int = 1,
                   downsample_ratio: int = 1) -> np.ndarray:
    """One mask plane per instance (reference utils.py:162-170)."""
    return np.stack([polygon2mask(imgsz, [s], color, downsample_ratio)
                     for s in segments]) if segments else \
        np.zeros((0, imgsz[0] // downsample_ratio,
                  imgsz[1] // downsample_ratio), np.uint8)


def check_det_dataset(data) -> Dict:
    """Resolve a dataset yaml into paths + names (reference utils.py:193-266;
    the auto-download path is disabled — zero-egress environment)."""
    if isinstance(data, dict):
        d = dict(data)
    else:
        p = Path(str(data))
        if p.suffix in (".yaml", ".yml") and p.is_file():
            d = yaml_load(p)
            d.setdefault("path", str(p.parent))
        elif p.is_dir():
            d = {"path": str(p), "train": ".", "val": ".", "names": {0: "0"}}
        else:
            raise FileNotFoundError(
                f"dataset {data!r} not found (auto-download is disabled in "
                f"this offline environment)")
    root = Path(d.get("path", "."))
    for split in ("train", "val", "test"):
        if d.get(split):
            sp = root / d[split] if not Path(d[split]).is_absolute() else Path(d[split])
            d[split] = str(sp)
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    d["names"] = names or {i: str(i) for i in range(int(d.get("nc", 1)))}
    d["nc"] = len(d["names"])
    return d


def convert_coco(json_file: str, out_dir: str, use_segments: bool = False):
    """COCO annotation json -> YOLO txt labels (reference converter.py:28)."""
    data = json.loads(Path(json_file).read_text())
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    images = {im["id"]: im for im in data["images"]}
    cat_map = {c["id"]: i for i, c in enumerate(
        sorted(data["categories"], key=lambda c: c["id"]))}
    per_image: Dict[int, List[str]] = {}
    for ann in data["annotations"]:
        if ann.get("iscrowd"):
            continue
        im = images[ann["image_id"]]
        w, h = im["width"], im["height"]
        x, y, bw, bh = ann["bbox"]
        row = [cat_map[ann["category_id"]],
               (x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h]
        line = " ".join(f"{v:.6g}" for v in row)
        if use_segments and ann.get("segmentation"):
            seg = np.asarray(ann["segmentation"][0], np.float32).reshape(-1, 2)
            seg[:, 0] /= w
            seg[:, 1] /= h
            line = f"{cat_map[ann['category_id']]} " + " ".join(
                f"{v:.6g}" for v in seg.reshape(-1))
        per_image.setdefault(ann["image_id"], []).append(line)
    n = 0
    for img_id, lines in per_image.items():
        stem = Path(images[img_id]["file_name"]).stem
        (out / f"{stem}.txt").write_text("\n".join(lines) + "\n")
        n += 1
    LOGGER.info(f"converted {n} label files -> {out}")
    return out


def auto_annotate(source, det_model="yolov8.yaml", sam_model: str = "sam_b",
                  out_dir: str = "auto_annotate_labels", conf: float = 0.25,
                  imgsz: int = 640, sam_imgsz: int = 256):
    """YOLO detections -> SAM box-prompted segments -> YOLO-seg txt labels
    (reference yolo/data/annotator.py:8-47), fully in-framework."""
    from ..engine.model import YOLO
    from ..vit.sam import SAM
    det = YOLO(det_model) if isinstance(det_model, str) else det_model
    sam = SAM(sam_model, img_size=sam_imgsz) if isinstance(sam_model, str) else sam_model
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    results = det.predict(source, conf=conf, imgsz=imgsz)
    for r in results:
        h, w = r.orig_shape
        lines = []
        for row in r.boxes.data:
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            masks, _ = sam.predict(r.orig_img, points=[[[cx, cy]]], labels=[[1]])
            m = masks[0, 0] > 0
            cnts, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
            if not cnts:
                continue
            seg = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            seg[:, 0] /= w
            seg[:, 1] /= h
            lines.append(f"{int(row[5])} " + " ".join(f"{v:.4g}" for v in seg.reshape(-1)))
        (out / f"{Path(r.path).stem}.txt").write_text("\n".join(lines) + "\n")
    return out
