"""BoT-SORT: ByteTrack + XYWH Kalman + camera-motion compensation + optional
ReID feature fusion (reference tracker/trackers/bot_sort.py:12-200).
"""
from __future__ import annotations

from collections import deque
from typing import List

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState, xyxy_to_tlwh
from .gmc import GMC
from .kalman import KalmanFilterXYWH
from .matching import embedding_distance, fuse_score, iou_distance


class BOTrack(STrack):
    shared_kalman = KalmanFilterXYWH()

    def __init__(self, tlwh, score, cls, feat=None, feat_history: int = 50):
        super().__init__(tlwh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        self.features = deque(maxlen=feat_history)
        self.alpha = 0.9
        if feat is not None:
            self.update_features(feat)

    def update_features(self, feat):
        feat = feat / (np.linalg.norm(feat) + 1e-12)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else \
            self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.features.append(feat)
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-12

    def convert_coords(self, tlwh):
        return self.tlwh_to_xywh(tlwh)

    @staticmethod
    def tlwh_to_xywh(tlwh):
        x = np.asarray(tlwh, np.float32).copy()
        x[:2] += x[2:] / 2
        return x

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        x = self.mean[:4].copy()  # cx, cy, w, h
        x[:2] -= x[2:] / 2
        return x

    def predict(self):
        mean = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean[6] = 0
            mean[7] = 0
        self.mean, self.covariance = self.kalman_filter.predict(mean, self.covariance)

    @staticmethod
    def multi_predict(tracks: List["BOTrack"]):
        if not tracks:
            return
        means = np.stack([t.mean.copy() for t in tracks])
        covs = np.stack([t.covariance for t in tracks])
        for i, t in enumerate(tracks):
            if t.state != TrackState.Tracked:
                means[i][6] = 0
                means[i][7] = 0
        means, covs = BOTrack.shared_kalman.multi_predict(means, covs)
        for i, t in enumerate(tracks):
            t.mean, t.covariance = means[i], covs[i]

    @staticmethod
    def multi_gmc(tracks: List["BOTrack"], H: np.ndarray):
        """Warp predicted states by the camera-motion homography
        (reference bot_sort.py multi_gmc)."""
        if not tracks or H is None:
            return
        R = H[:2, :2]
        R8 = np.kron(np.eye(4), R)
        t = H[:2, 2]
        for trk in tracks:
            mean = R8 @ trk.mean
            mean[:2] += t
            trk.mean = mean
            trk.covariance = R8 @ trk.covariance @ R8.T


class BOTSORT(BYTETracker):
    def __init__(self, args=None, frame_rate: int = 30):
        from types import SimpleNamespace
        args = args or SimpleNamespace(
            track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.6,
            track_buffer=30, match_thresh=0.8, gmc_method="sparseOptFlow",
            proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False)
        super().__init__(args, frame_rate)
        self.proximity_thresh = args.proximity_thresh
        self.appearance_thresh = args.appearance_thresh
        self.with_reid = getattr(args, "with_reid", False)
        self.encoder = None  # ReID model slot
        self.gmc = GMC(method=getattr(args, "gmc_method", "sparseOptFlow"))

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, dets, scores, cls, img=None):
        if len(dets) == 0:
            return []
        if self.with_reid and self.encoder is not None:
            feats = self.encoder.inference(img, dets)
            return [BOTrack(xyxy_to_tlwh(d), s, c, f)
                    for d, s, c, f in zip(dets, scores, cls, feats)]
        return [BOTrack(xyxy_to_tlwh(d), s, c)
                for d, s, c in zip(dets, scores, cls)]

    def get_dists(self, tracks, detections):
        dists = iou_distance(tracks, detections)
        dists_mask = dists > self.proximity_thresh
        dists = fuse_score(dists, detections)
        if self.with_reid and self.encoder is not None and len(tracks) and len(detections):
            emb = embedding_distance(tracks, detections) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def multi_predict(self, tracks):
        BOTrack.multi_predict(tracks)

    def update(self, boxes, scores, cls, img=None):
        # GMC runs EVERY frame (reference byte_tracker.py:221-223 warps the
        # tracked+lost pool unconditionally): gating on live tracks would
        # leave lost tracks unwarped during full occlusion — exactly when
        # camera compensation decides re-association — and let gmc.prev_frame
        # go stale so optical flow resumes across a multi-frame gap
        if img is not None:
            H = self.gmc.apply(img)
            BOTrack.multi_gmc(self.tracked_stracks, H)
            BOTrack.multi_gmc(self.lost_stracks, H)
        return super().update(boxes, scores, cls, img)
