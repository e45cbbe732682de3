"""Plotting: annotated images, batch mosaics, training curves, PR curves.

cv2/matplotlib re-implementation of reference yolo/utils/plotting.py:49-514
plus the fork's ablation PR-curve script (nn/plot_model_pr_curve.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from . import LOGGER

PALETTE = [(56, 56, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
           (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26),
           (187, 212, 0), (168, 153, 44), (255, 194, 0), (147, 69, 52),
           (255, 115, 100), (236, 24, 0), (255, 56, 132), (133, 0, 82),
           (255, 56, 203), (200, 149, 255), (199, 55, 255)]


def color(i: int):
    return PALETTE[int(i) % len(PALETTE)]


class Annotator:
    """Box / label / mask drawing on BGR images (reference plotting.py:49-298)."""

    def __init__(self, img: np.ndarray, line_width: Optional[int] = None):
        self.img = img if img.flags.writeable else img.copy()
        self.lw = line_width or max(round(sum(img.shape) / 2 * 0.003), 2)

    def box_label(self, box, label: str = "", color=(128, 128, 128),
                  txt_color=(255, 255, 255)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.img, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - h >= 3
            p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
            cv2.rectangle(self.img, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(self.img, label,
                        (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                        0, self.lw / 3, txt_color, tf, cv2.LINE_AA)

    def masks(self, masks: np.ndarray, colors: Sequence, alpha: float = 0.5):
        """masks: (n, H, W) bool."""
        overlay = self.img.astype(np.float32)
        for m, c in zip(masks, colors):
            overlay[m] = overlay[m] * (1 - alpha) + np.asarray(c) * alpha
        self.img[:] = overlay.astype(np.uint8)

    def kpts(self, kpts: np.ndarray, radius: int = 5):
        for x, y, *rest in kpts:
            conf = rest[0] if rest else 1.0
            if conf > 0.5:
                cv2.circle(self.img, (int(x), int(y)), radius, (0, 255, 0), -1)

    def result(self):
        return self.img


def plot_images(images: np.ndarray, batch_boxes: List[np.ndarray],
                names: Dict[int, str], fname: str = "batch.jpg",
                max_images: int = 16):
    """Mosaic grid of a batch with drawn boxes (reference plotting.py:299-430).

    images: (b, H, W, 3) float 0-1 RGB; batch_boxes: per-image (n, 6) rows.
    """
    b = min(len(images), max_images)
    n = int(np.ceil(b ** 0.5))
    h, w = images.shape[1:3]
    grid = np.full((n * h, n * w, 3), 255, np.uint8)
    for i in range(b):
        r, c = divmod(i, n)
        img = (images[i, ..., ::-1] * 255).astype(np.uint8)
        ann = Annotator(img.copy())
        for row in (batch_boxes[i] if i < len(batch_boxes) else []):
            cls = int(row[5]) if len(row) > 5 else 0
            ann.box_label(row[:4], f"{names.get(cls, cls)}", color(cls))
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = ann.result()
    Path(fname).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), grid)
    return fname


def plot_labels(boxes: np.ndarray, cls: np.ndarray, names: Dict[int, str],
                save_dir: str = "."):
    """Dataset label statistics -> labels.jpg (reference plotting.py:231-278,
    seaborn correlogram replaced by matplotlib hist2d panels).

    boxes: (n, 4) normalized xywh; cls: (n,) class ids.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    cls = np.asarray(cls).astype(int).ravel()
    fig, axes = plt.subplots(2, 2, figsize=(10, 10))
    nc = int(cls.max()) + 1 if len(cls) else 1
    axes[0, 0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xticks(range(nc))
    axes[0, 0].set_xticklabels([str(names.get(i, i)) for i in range(nc)],
                               rotation=90, fontsize=8)
    axes[0, 0].set_ylabel("instances")
    # box-outline overlay at a common center (reference's "boxes" panel)
    axes[0, 1].set_title("boxes")
    for row in boxes[:500]:
        w, h = row[2], row[3]
        axes[0, 1].add_patch(plt.Rectangle((0.5 - w / 2, 0.5 - h / 2), w, h,
                                           fill=False, lw=0.6))
    axes[0, 1].set_xlim(0, 1)
    axes[0, 1].set_ylim(0, 1)
    if len(boxes):
        axes[1, 0].hist2d(boxes[:, 0], boxes[:, 1], bins=50, cmap="Blues")
        axes[1, 1].hist2d(boxes[:, 2], boxes[:, 3], bins=50, cmap="Blues")
    axes[1, 0].set_xlabel("x")
    axes[1, 0].set_ylabel("y")
    axes[1, 1].set_xlabel("width")
    axes[1, 1].set_ylabel("height")
    fig.tight_layout()
    out = Path(save_dir) / "labels.jpg"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def save_one_box(xyxy, im: np.ndarray, file="im.jpg", gain: float = 1.02,
                 pad: int = 10, square: bool = False, BGR: bool = False,
                 save: bool = True):
    """Save/return a gain*wh + pad crop around a box (reference
    plotting.py:281-295; predictor save_crop path)."""
    r = np.asarray(xyxy, np.float32).reshape(-1, 4)[0]
    cx, cy = (r[0] + r[2]) / 2, (r[1] + r[3]) / 2
    bw, bh = r[2] - r[0], r[3] - r[1]
    if square:
        bw = bh = max(bw, bh)
    bw, bh = bw * gain + pad, bh * gain + pad  # reference: +pad total, not per side
    box = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], int)
    h, w = im.shape[:2]
    x1, y1 = max(box[0], 0), max(box[1], 0)
    x2, y2 = min(box[2], w), min(box[3], h)
    crop = im[y1:y2, x1:x2, ::(1 if BGR else -1)]
    if save:
        from ..utils import increment_path
        f = Path(increment_path(Path(file))).with_suffix(".jpg")
        f.parent.mkdir(parents=True, exist_ok=True)
        # imwrite wants BGR: the crop is already BGR when BGR=True
        cv2.imwrite(str(f), crop if BGR else crop[..., ::-1])
    return crop


def plot_results(csv_file: str, out: Optional[str] = None):
    """Training curves from results.csv (reference plotting.py:431-483)."""
    import csv as csv_mod
    rows = list(csv_mod.DictReader(open(csv_file)))
    if not rows:
        LOGGER.warning(f"no rows in {csv_file}")
        return None
    keys = [k for k in rows[0] if k != "epoch"]
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n = len(keys)
    fig, axes = plt.subplots(2, (n + 1) // 2, figsize=(4 * ((n + 1) // 2), 8))
    axes = np.asarray(axes).ravel()
    x = [float(r["epoch"]) for r in rows]
    for ax, k in zip(axes, keys):
        ax.plot(x, [float(r[k]) for r in rows], marker=".")
        ax.set_title(k)
        ax.set_xlabel("epoch")
    fig.tight_layout()
    out = out or str(Path(csv_file).with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curves(model_stats: Dict[str, Dict], out: str = "pr_curves.png"):
    """Multi-model PR curves (the fork's ablation comparison,
    nn/plot_model_pr_curve.py:14-23). model_stats: name -> DetMetrics.per_class."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 6))
    for name, r in model_stats.items():
        # approximate PR curve from per-class P/R at best-F1 + AP label
        ap = float(np.mean(r["ap"][:, 0])) if len(r.get("ap", [])) else 0.0
        ax.plot(r.get("recall", [0]), r.get("precision", [0]), marker="o",
                label=f"{name} (mAP50 {ap:.3f})")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def feature_visualization(feats, layer_idx: int, out_dir: str = "features",
                          max_channels: int = 32):
    """Dump per-channel activation tiles (reference plotting.py:484-514)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    x = np.asarray(feats)[0]  # (H, W, C)
    c = min(max_channels, x.shape[-1])
    n = int(np.ceil(c ** 0.5))
    fig, axes = plt.subplots(n, n, figsize=(n * 1.6, n * 1.6))
    for i, ax in enumerate(np.asarray(axes).ravel()):
        ax.axis("off")
        if i < c:
            ax.imshow(x[..., i], cmap="viridis")
    out = Path(out_dir) / f"layer_{layer_idx}.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return str(out)
