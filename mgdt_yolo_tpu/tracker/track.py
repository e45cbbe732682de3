"""Tracker wiring into the predictor callback bus
(reference tracker/track.py:15-65): one tracker per stream slot on
on_predict_start, detection->track reindexing on on_predict_postprocess_end.
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ..utils import LOGGER
from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def on_predict_start(predictor, persist: bool = False,
                     tracker_type: str = "bytetrack"):
    if hasattr(predictor, "trackers") and persist:
        return
    if tracker_type not in TRACKER_MAP:
        raise ValueError(f"unknown tracker {tracker_type!r}; "
                         f"choose from {list(TRACKER_MAP)}")
    predictor.trackers = [TRACKER_MAP[tracker_type]()]


def on_predict_postprocess_end(predictor):
    """Update trackers with the batch detections, reindex Results rows."""
    for i, result in enumerate(predictor.results):
        tracker = predictor.trackers[min(i, len(predictor.trackers) - 1)]
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
        # rows: [x1,y1,x2,y2,track_id,score,cls] (+det idx col 7 dropped)
        idx = tracks[:, 7].astype(int)
        boxes = np.concatenate([det[idx, :4], tracks[:, 4:5],
                                det[idx, 4:6]], axis=1)
        result.update(boxes=boxes)


def register_tracker(predictor, persist: bool = False,
                     tracker_type: str = "bytetrack"):
    predictor.add_callback("on_predict_start",
                           partial(on_predict_start, persist=persist,
                                   tracker_type=tracker_type))
    predictor.add_callback("on_predict_postprocess_end",
                           on_predict_postprocess_end)
    # predictor callbacks fire with predictor as the arg; ensure start hook
    # runs even if __call__ was entered before registration
    on_predict_start(predictor, persist=persist, tracker_type=tracker_type)
