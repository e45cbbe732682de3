"""Dataset utilities: label verification + hash-validated scan cache,
polygon rasterization, dataset yaml resolution, COCO conversion (reference
yolo/data/utils.py:45-266, dataset.py:41-142, converter.py:28,
annotator.py:8).
"""
from __future__ import annotations

import hashlib
import json
import os
from multiprocessing.pool import ThreadPool
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..utils import LOGGER, yaml_load

# canonical image-extension set — dataset.py and loaders.py import this so
# dataset scanning, label verification, and source sniffing cannot drift
IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}
CACHE_VERSION = "mgdt-tpu-1.0"


def get_hash(paths: List[str]) -> str:
    """Single hash of a path list: total size + joined names (reference
    yolo/data/utils.py:45-50) — invalidates the label cache when any file
    changes size or the file set changes."""
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.sha256(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def exif_size(img) -> Tuple[int, int]:
    """EXIF-orientation-corrected (w, h) of a PIL image (reference
    yolo/data/utils.py:53-60)."""
    s = img.size
    try:
        rotation = dict(img.getexif()).get(274, None)
        if rotation in (6, 8):  # 270 / 90 degrees
            s = (s[1], s[0])
    except Exception:
        pass
    return s


def segments2boxes(segments: List[np.ndarray]) -> np.ndarray:
    """Polygon segments -> normalized xywh boxes (reference utils.py:176-190)."""
    boxes = []
    for s in segments:
        x, y = s[:, 0], s[:, 1]
        boxes.append([(x.min() + x.max()) / 2, (y.min() + y.max()) / 2,
                      x.max() - x.min(), y.max() - y.min()])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


def verify_image_label(img_path: str, label_path: str,
                       num_cls: Optional[int] = None):
    """Verify one image/label pair (reference yolo/data/utils.py:63-134).

    Returns (record | None, nm, nf, ne, ncorrupt, msg):
    record = {im_file, shape (h, w), cls (n,), xywh (n, 4) normalized} on a
    healthy pair, None when the image/label is corrupt (counted, not fatal).
    Checks: PIL verify + EXIF size, >=10px, known format, truncated-JPEG
    restore, 5-column normalized labels (polygon rows folded to boxes),
    class range, duplicate-row dedup.
    """
    nm = nf = ne = nc_bad = 0
    msg = ""
    try:
        from PIL import Image, ImageOps
        with Image.open(img_path) as im:
            im.verify()  # cheap corruption check (no full decode)
            w, h = exif_size(im)
            fmt = (im.format or "").lower()
        assert h > 9 and w > 9, f"image size {w}x{h} <10 pixels"
        assert fmt in IMG_FORMATS, f"invalid image format {fmt}"
        if fmt in ("jpg", "jpeg"):
            with open(img_path, "rb") as f:
                f.seek(-2, 2)
                if f.read() != b"\xff\xd9":  # truncated JPEG: restore
                    from PIL import ImageFile
                    old = ImageFile.LOAD_TRUNCATED_IMAGES
                    ImageFile.LOAD_TRUNCATED_IMAGES = True  # decode what's there
                    try:
                        ImageOps.exif_transpose(Image.open(img_path)).save(
                            img_path, "JPEG", subsampling=0, quality=100)
                    finally:
                        ImageFile.LOAD_TRUNCATED_IMAGES = old
                    msg = f"{img_path}: corrupt JPEG restored and saved"

        lp = Path(label_path)
        if lp.is_file():
            nf = 1
            rows = [l.split() for l in lp.read_text().strip().splitlines()
                    if l.strip()]
            if any(len(r) > 6 for r in rows):  # polygon rows -> boxes
                classes = np.asarray([r[0] for r in rows], np.float32)
                segs = [np.asarray(r[1:], np.float32).reshape(-1, 2)
                        for r in rows]
                lb = np.concatenate(
                    [classes.reshape(-1, 1), segments2boxes(segs)], 1)
            else:
                lb = np.asarray(rows, np.float32).reshape(-1, 5)
            if len(lb):
                assert lb.shape[1] == 5, f"labels require 5 columns, got {lb.shape[1]}"
                assert (lb[:, 1:] <= 1).all(), "non-normalized coordinates"
                assert (lb >= 0).all(), "negative label values"
                if num_cls is not None:
                    assert int(lb[:, 0].max()) < num_cls, \
                        f"class {int(lb[:, 0].max())} exceeds nc={num_cls}"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < len(lb):
                    lb = lb[np.sort(idx)]
                    msg = f"{img_path}: duplicate labels removed"
            else:
                ne = 1
                lb = np.zeros((0, 5), np.float32)
        else:
            nm = 1
            lb = np.zeros((0, 5), np.float32)
        rec = {"im_file": str(img_path), "shape": (h, w),
               "cls": lb[:, 0].copy(), "xywh": lb[:, 1:5].copy()}
        return rec, nm, nf, ne, nc_bad, msg
    except Exception as e:
        return None, nm, nf, ne, 1, f"{img_path}: ignoring corrupt image/label: {e}"


def scan_labels(im_files: List[str], label_files: List[str],
                cache_path: Path, num_cls: Optional[int] = None,
                workers: int = 8) -> List[Dict]:
    """Hash-validated label scan (reference dataset.py:41-142): load the
    sidecar cache when its version and file-set hash match, else verify
    every image/label pair on a thread pool and rewrite the cache. Corrupt
    pairs are dropped with a warning, never fatal."""
    want_hash = get_hash(list(label_files) + list(im_files))
    try:
        cache = np.load(str(cache_path), allow_pickle=True).item()
        if cache.get("version") == CACHE_VERSION and cache.get("hash") == want_hash:
            LOGGER.info(f"dataset: loaded label cache {cache_path} "
                        f"({len(cache['labels'])} images)")
            return cache["labels"]
    except (FileNotFoundError, OSError, ValueError, AttributeError):
        pass

    with ThreadPool(max(1, workers)) as pool:
        results = pool.starmap(
            verify_image_label,
            [(im, lb, num_cls) for im, lb in zip(im_files, label_files)])
    labels, msgs = [], []
    nm = nf = ne = ncorrupt = 0
    for rec, m, f, e, c, msg in results:
        nm += m
        nf += f
        ne += e
        ncorrupt += c
        if rec is not None:
            labels.append(rec)
        if msg:
            msgs.append(msg)
    for m in msgs[:10]:
        LOGGER.warning(m)
    LOGGER.info(f"dataset scan: {nf} labels, {nm + ne} backgrounds, "
                f"{ncorrupt} corrupt")
    cache = {"labels": labels, "hash": want_hash, "version": CACHE_VERSION,
             "results": (nf, nm, ne, ncorrupt, len(im_files)), "msgs": msgs}
    try:
        np.save(str(cache_path), cache)
        cache_path.with_suffix(cache_path.suffix + ".npy").rename(cache_path)
        LOGGER.info(f"dataset: new label cache {cache_path}")
    except OSError:
        LOGGER.warning(f"cache dir not writeable: {cache_path.parent}")
    return labels


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
