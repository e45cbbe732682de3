"""ByteTrack: two-stage confidence-split association over Kalman tracks.

Re-implementation of reference tracker/trackers/byte_tracker.py:10-364:
high-confidence detections (>= track_high_thresh) associate first by fused
IoU cost; the low band (track_low_thresh..high) rescues still-live tracks;
unconfirmed tracks get a final pass; leftovers spawn / age out. Track state
machine and tlwh/xyah conversions mirror STrack/BaseTrack
(basetrack.py:8-69).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .kalman import KalmanFilterXYAH
from .matching import fuse_score, iou_distance, linear_assignment


class TrackState:
    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


class STrack:
    shared_kalman = KalmanFilterXYAH()
    _count = 0

    def __init__(self, tlwh, score: float, cls: int):
        self._tlwh = np.asarray(tlwh, np.float32)
        self.score = float(score)
        self.cls = int(cls)
        self.kalman_filter: Optional[KalmanFilterXYAH] = None
        self.mean = None
        self.covariance = None
        self.is_activated = False
        self.track_id = 0
        self.state = TrackState.New
        self.frame_id = 0
        self.start_frame = 0
        self.tracklet_len = 0
        self.idx = -1  # index into the frame's detection array

    # ---- id / lifecycle --------------------------------------------------
    @staticmethod
    def next_id() -> int:
        STrack._count += 1
        return STrack._count

    @staticmethod
    def reset_id():
        STrack._count = 0

    def activate(self, kalman_filter, frame_id: int):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(
            self.convert_coords(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track: "STrack", frame_id: int,
                    new_id: bool = False):
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.convert_coords(new_track.tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def update(self, new_track: "STrack", frame_id: int):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.convert_coords(new_track.tlwh))
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def predict(self):
        mean = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean[7] = 0
        self.mean, self.covariance = self.kalman_filter.predict(mean, self.covariance)

    @staticmethod
    def multi_predict(tracks: List["STrack"]):
        if not tracks:
            return
        means = np.stack([t.mean.copy() for t in tracks])
        covs = np.stack([t.covariance for t in tracks])
        for i, t in enumerate(tracks):
            if t.state != TrackState.Tracked:
                means[i][7] = 0
        means, covs = STrack.shared_kalman.multi_predict(means, covs)
        for i, t in enumerate(tracks):
            t.mean, t.covariance = means[i], covs[i]

    def mark_lost(self):
        self.state = TrackState.Lost

    def mark_removed(self):
        self.state = TrackState.Removed

    # ---- geometry --------------------------------------------------------
    def convert_coords(self, tlwh):
        return self.tlwh_to_xyah(tlwh)

    @property
    def tlwh(self) -> np.ndarray:
        if self.mean is None:
            return self._tlwh.copy()
        x = self.mean[:4].copy()  # cx, cy, a, h
        x[2] *= x[3]              # w = a*h
        x[:2] -= x[2:] / 2
        return x

    @property
    def tlbr(self) -> np.ndarray:
        t = self.tlwh
        return np.concatenate([t[:2], t[:2] + t[2:]])

    @staticmethod
    def tlwh_to_xyah(tlwh) -> np.ndarray:
        x = np.asarray(tlwh, np.float32).copy()
        x[:2] += x[2:] / 2
        x[2] /= x[3]
        return x

    @property
    def end_frame(self):
        return self.frame_id

    def __repr__(self):
        return f"OT_{self.track_id}_({self.start_frame}-{self.end_frame})"


class BYTETracker:
    """The two-stage association loop (byte_tracker.py:167-364)."""

    def __init__(self, args=None, frame_rate: int = 30):
        from types import SimpleNamespace
        self.args = args or SimpleNamespace(
            track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.6,
            track_buffer=30, match_thresh=0.8)
        self.tracked_stracks: List[STrack] = []
        self.lost_stracks: List[STrack] = []
        self.removed_stracks: List[STrack] = []
        self.frame_id = 0
        self.max_time_lost = int(frame_rate / 30.0 * self.args.track_buffer)
        self.kalman_filter = self.get_kalmanfilter()
        STrack.reset_id()

    def get_kalmanfilter(self):
        return KalmanFilterXYAH()

    def init_track(self, dets, scores, cls, img=None):
        return [STrack(xyxy_to_tlwh(d), s, c)
                for d, s, c in zip(dets, scores, cls)] if len(dets) else []

    def get_dists(self, tracks, detections):
        dists = iou_distance(tracks, detections)
        return fuse_score(dists, detections)

    def multi_predict(self, tracks):
        STrack.multi_predict(tracks)

    def update(self, boxes: np.ndarray, scores: np.ndarray, cls: np.ndarray,
               img=None) -> np.ndarray:
        """Advance one frame.

        Args:
            boxes: (n, 4) xyxy detections in original-image pixels.
        Returns:
            (m, 7) array [x1, y1, x2, y2, track_id, score, cls] of activated
            tracks, plus column 7 = detection index (for Results reindexing).
        """
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []

        # strict inequalities like the reference (byte_tracker.py:195-197):
        # a score exactly AT track_high_thresh falls in NEITHER band there
        high = scores > self.args.track_high_thresh
        low = ((scores > self.args.track_low_thresh)
               & (scores < self.args.track_high_thresh))
        dets_h, dets_l = boxes[high], boxes[low]
        scores_h, scores_l = scores[high], scores[low]
        cls_h, cls_l = cls[high], cls[low]
        idx_all = np.arange(len(boxes))
        detections = self.init_track(dets_h, scores_h, cls_h, img)
        for t, i in zip(detections, idx_all[high]):
            t.idx = int(i)

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        strack_pool = joint_stracks(tracked, self.lost_stracks)

        # stage 1: high-confidence dets vs predicted pool
        self.multi_predict(strack_pool)
        dists = self.get_dists(strack_pool, detections)
        matches, u_track, u_det = linear_assignment(dists, self.args.match_thresh)
        for it, idet in matches:
            track, det = strack_pool[it], detections[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id)
                refind.append(track)

        # stage 2: low-confidence rescue for still-tracked leftovers
        detections_l = self.init_track(dets_l, scores_l, cls_l, img)
        for t, i in zip(detections_l, idx_all[low]):
            t.idx = int(i)
        r_tracks = [strack_pool[i] for i in u_track
                    if strack_pool[i].state == TrackState.Tracked]
        dists = iou_distance(r_tracks, detections_l)
        matches, u_track2, _ = linear_assignment(dists, 0.5)
        for it, idet in matches:
            track, det = r_tracks[it], detections_l[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id)
                refind.append(track)
        for i in u_track2:
            t = r_tracks[i]
            if t.state != TrackState.Lost:
                t.mark_lost()
                lost.append(t)

        # stage 3: unconfirmed tracks vs remaining high dets
        remaining = [detections[i] for i in u_det]
        dists = self.get_dists(unconfirmed, remaining)
        matches, u_unconfirmed, u_det2 = linear_assignment(dists, 0.7)
        for it, idet in matches:
            unconfirmed[it].update(remaining[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_unconfirmed:
            t = unconfirmed[i]
            t.mark_removed()
            removed.append(t)

        # new tracks
        for i in u_det2:
            det = remaining[i]
            if det.score >= self.args.new_track_thresh:
                det.activate(self.kalman_filter, self.frame_id)
                activated.append(det)

        # expire stale lost tracks
        for t in self.lost_stracks:
            if self.frame_id - t.end_frame > self.max_time_lost:
                t.mark_removed()
                removed.append(t)

        self.tracked_stracks = [t for t in self.tracked_stracks
                                if t.state == TrackState.Tracked]
        self.tracked_stracks = joint_stracks(self.tracked_stracks, activated)
        self.tracked_stracks = joint_stracks(self.tracked_stracks, refind)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.removed_stracks)
        self.tracked_stracks, self.lost_stracks = remove_duplicate_stracks(
            self.tracked_stracks, self.lost_stracks)
        self.removed_stracks.extend(removed)
        if len(self.removed_stracks) > 1000:
            self.removed_stracks = self.removed_stracks[-999:]

        out = [np.concatenate([t.tlbr, [t.track_id, t.score, t.cls, t.idx]])
               for t in self.tracked_stracks if t.is_activated]
        return np.asarray(out, np.float32).reshape(-1, 8)


def xyxy_to_tlwh(b):
    return np.array([b[0], b[1], b[2] - b[0], b[3] - b[1]], np.float32)


def joint_stracks(a: List[STrack], b: List[STrack]) -> List[STrack]:
    seen = {t.track_id for t in a}
    return a + [t for t in b if t.track_id not in seen]


def sub_stracks(a: List[STrack], b: List[STrack]) -> List[STrack]:
    drop = {t.track_id for t in b}
    return [t for t in a if t.track_id not in drop]


def remove_duplicate_stracks(a: List[STrack], b: List[STrack]):
    from .matching import iou_distance as _iou
    d = _iou(a, b)
    pairs = np.where(d < 0.15)
    dup_a, dup_b = set(), set()
    for ia, ib in zip(*pairs):
        if a[ia].frame_id - a[ia].start_frame > b[ib].frame_id - b[ib].start_frame:
            dup_b.add(ib)
        else:
            dup_a.add(ia)
    return ([t for i, t in enumerate(a) if i not in dup_a],
            [t for i, t in enumerate(b) if i not in dup_b])
