"""Automatic-mask-generation utilities (reference vit/sam/amg.py, numpy):
point grids, crop boxes, stability score, RLE encoding, small-region
cleanup, mask->box. Host-side post-processing around the jitted SAM
decode — these operate on already-materialized masks.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced (n^2, 2) points in [0,1]^2 (reference amg.py:168-175)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    px = np.tile(side[None, :], (n_per_side, 1))
    py = np.tile(side[:, None], (1, n_per_side))
    return np.stack([px, py], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer point grids (reference amg.py:177-180)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float) -> Tuple[List[List[int]], List[int]]:
    """Crop boxes per layer; layer i has (2**i)^2 overlapping crops
    (reference amg.py:182-213)."""
    crop_boxes: List[List[int]] = []
    layer_idxs: List[int] = []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def calculate_stability_score(masks: np.ndarray, mask_threshold: float,
                              threshold_offset: float) -> np.ndarray:
    """IoU between the high- and low-threshold binarizations
    (reference amg.py:154-165). masks: (..., H, W) logits."""
    inter = (masks > (mask_threshold + threshold_offset)).sum(-1).sum(-1)
    union = (masks > (mask_threshold - threshold_offset)).sum(-1).sum(-1)
    return inter / np.maximum(union, 1)


def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Binary (H, W) mask -> uncompressed column-major RLE
    (reference mask_to_rle_pytorch, amg.py:110-132)."""
    h, w = mask.shape
    flat = mask.transpose().reshape(-1).astype(bool)  # column-major like ref
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [h * w]])
    counts = np.diff(idx).tolist()
    if flat[0]:  # RLE starts with the run of zeros
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """Inverse of mask_to_rle (reference amg.py:135-146)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx:idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str
                         ) -> Tuple[np.ndarray, bool]:
    """Drop small disconnected regions / holes (reference amg.py:247-264)."""
    import cv2
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]  # row 0 is background
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        # if every region is below threshold, keep the largest
        fill = [i for i in range(n_labels) if i not in fill] or \
            [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(..., H, W) binary masks -> xyxy boxes with INCLUSIVE max edges,
    zeros for empty masks (reference amg.py:277-304)."""
    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)
    out = np.zeros((flat.shape[0], 4), np.float32)
    for i, m in enumerate(flat):
        ys, xs = np.nonzero(m)
        if len(xs):
            out[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return out.reshape(*shape[:-2], 4)


def is_box_near_crop_edge(boxes: np.ndarray, crop_box: List[int],
                          orig_box: List[int], atol: float = 20.0) -> np.ndarray:
    """Filter boxes touching a crop edge but not the image edge
    (reference amg.py:80-91)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    near_crop = np.isclose(boxes, crop[None], atol=atol)
    near_image = np.isclose(boxes, orig[None], atol=atol)
    return (near_crop & ~near_image).any(-1)
