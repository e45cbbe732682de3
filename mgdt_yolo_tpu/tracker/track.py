"""Tracker wiring into the predictor callback bus
(reference tracker/track.py:15-65): the tracker YAML from
`predictor.args.tracker` is loaded into the tracker args, one tracker is
created per batch slot (multi-stream Kalman/ID isolation), and detections
are reindexed to tracks on on_predict_postprocess_end.
"""
from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np

from ..utils import IterableSimpleNamespace, yaml_load
from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def check_tracker_yaml(tracker) -> Path:
    """Resolve a tracker spec to a config YAML path.

    Accepts a path to a custom YAML, a bundled name ('botsort.yaml'), or a
    bare tracker type ('bytetrack') — mirroring reference
    tracker/track.py:28 (`check_yaml(predictor.args.tracker)`).
    """
    name = str(tracker or "botsort.yaml")
    if not name.endswith((".yaml", ".yml")):
        name += ".yaml"
    p = Path(name)
    if not p.is_file():
        bundled = Path(__file__).parent / "cfg" / p.name
        if bundled.is_file():
            p = bundled
        else:
            raise FileNotFoundError(
                f"tracker config {name!r} not found (looked at {p} and the "
                f"bundled {bundled.parent})")
    return p


def load_tracker_cfg(tracker) -> IterableSimpleNamespace:
    cfg = IterableSimpleNamespace(**yaml_load(check_tracker_yaml(tracker)))
    if cfg.tracker_type not in TRACKER_MAP:
        raise ValueError(f"unknown tracker_type {cfg.tracker_type!r}; "
                         f"choose from {list(TRACKER_MAP)}")
    return cfg


def on_predict_start(predictor, persist: bool = False):
    """Configure tracking from predictor.args.tracker (reference
    tracker/track.py:15-36). Trackers are allocated lazily per *stream*
    (see tracker_for) rather than per batch index: this predictor's batches
    hold CONSECUTIVE frames of one sequential source, so indexing trackers
    by position-in-batch would round-robin one video's frames across
    independent Kalman states and fragment IDs whenever batch > 1."""
    if hasattr(predictor, "trackers") and persist:
        return
    predictor._tracker_cfg = load_tracker_cfg(
        getattr(predictor.args, "tracker", None))
    predictor.trackers = {}  # stream key -> tracker


def tracker_for(predictor, key):
    """Get (or lazily create) the tracker owning stream `key`.

    Keys are the source path for video/stream frames — each video or live
    stream gets its own Kalman/ID space — and a single shared key for still
    images, which the reference treats as one continuous frame sequence
    (its LoadImages runs bs=1 through slot 0)."""
    tr = predictor.trackers.get(key)
    if tr is None:
        cfg = predictor._tracker_cfg
        tr = TRACKER_MAP[cfg.tracker_type](args=cfg, frame_rate=30)
        predictor.trackers[key] = tr
    return tr


def _stream_key(predictor, i, result):
    items = getattr(predictor, "batch_items", None)
    if items is not None and i < len(items):
        it = items[i]
        if it.get("is_video"):
            return it.get("path", "__frames__")
    return "__frames__"


def on_predict_postprocess_end(predictor):
    """Update trackers with the batch detections, reindex Results rows."""
    for i, result in enumerate(predictor.results):
        tracker = tracker_for(predictor, _stream_key(predictor, i, result))
        det = result.boxes.data
        if len(det) == 0:
            tracker.update(np.zeros((0, 4), np.float32),
                           np.zeros((0,)), np.zeros((0,)), result.orig_img)
            continue
        tracks = tracker.update(det[:, :4], det[:, 4], det[:, 5],
                                result.orig_img)
        if len(tracks) == 0:
            result.update(boxes=np.zeros((0, 7), np.float32))
            continue
        # rows: [x1,y1,x2,y2,track_id,score,cls] (+det idx col 7 dropped).
        # Boxes are the KALMAN-POSTERIOR tlbr the tracker returns — the
        # reference sets boxes=tracks[:, :-1] (tracker/track.py:52), which
        # is what gives .track() temporally smoothed boxes; raw det boxes
        # would discard the filter entirely.
        result.update(boxes=tracks[:, :7].astype(np.float32))


def register_tracker(predictor, persist: bool = False):
    predictor.add_callback("on_predict_start",
                           partial(on_predict_start, persist=persist))
    predictor.add_callback("on_predict_postprocess_end",
                           on_predict_postprocess_end)
