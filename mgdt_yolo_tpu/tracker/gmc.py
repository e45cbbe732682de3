"""Global motion compensation for BoT-SORT (reference tracker/utils/gmc.py).

Estimates the frame-to-frame camera homography with cv2 on a downscaled gray
frame: sparse optical flow (default), ORB feature matching, or ECC.
"""
from __future__ import annotations

import cv2
import numpy as np


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, downscale)
        self.prev_frame = None
        self.prev_kpts = None
        self.initialized = False
        if method in ("orb", "sift"):
            self.detector = cv2.ORB_create() if method == "orb" else \
                cv2.SIFT_create()
            self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING if method == "orb"
                                         else cv2.NORM_L2)

    def _prep(self, img: np.ndarray) -> np.ndarray:
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale,
                                     gray.shape[0] // self.downscale))
        return gray

    def apply(self, img: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3)
        if self.method in (None, "none"):
            return H
        frame = self._prep(img)
        if not self.initialized:
            self.prev_frame = frame.copy()
            if self.method == "sparseOptFlow":
                self.prev_kpts = cv2.goodFeaturesToTrack(
                    frame, maxCorners=1000, qualityLevel=0.01, minDistance=1,
                    blockSize=3)
            self.initialized = True
            return H
        try:
            if self.method == "sparseOptFlow":
                if self.prev_kpts is None or len(self.prev_kpts) < 4:
                    self.prev_kpts = cv2.goodFeaturesToTrack(
                        self.prev_frame, maxCorners=1000, qualityLevel=0.01,
                        minDistance=1, blockSize=3)
                if self.prev_kpts is not None and len(self.prev_kpts) >= 4:
                    nxt, status, _ = cv2.calcOpticalFlowPyrLK(
                        self.prev_frame, frame, self.prev_kpts, None)
                    ok = status.ravel() == 1
                    if ok.sum() >= 4:
                        M, _ = cv2.estimateAffinePartial2D(
                            self.prev_kpts[ok], nxt[ok], method=cv2.RANSAC)
                        if M is not None:
                            H = M
                self.prev_kpts = cv2.goodFeaturesToTrack(
                    frame, maxCorners=1000, qualityLevel=0.01, minDistance=1,
                    blockSize=3)
            elif self.method == "ecc":
                criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                            100, 1e-5)
                _, H = cv2.findTransformECC(self.prev_frame, frame,
                                            np.eye(2, 3, dtype=np.float32),
                                            cv2.MOTION_EUCLIDEAN, criteria)
            elif self.method in ("orb", "sift"):
                k1, d1 = self.detector.detectAndCompute(self.prev_frame, None)
                k2, d2 = self.detector.detectAndCompute(frame, None)
                if d1 is not None and d2 is not None and len(k1) >= 4 and len(k2) >= 4:
                    m = self.matcher.match(d1, d2)
                    if len(m) >= 4:
                        src = np.float32([k1[x.queryIdx].pt for x in m])
                        dst = np.float32([k2[x.trainIdx].pt for x in m])
                        M, _ = cv2.estimateAffinePartial2D(src, dst,
                                                           method=cv2.RANSAC)
                        if M is not None:
                            H = M
        except cv2.error:
            pass
        self.prev_frame = frame.copy()
        # undo the downscale on the translation part
        H = np.asarray(H, np.float64)
        H[0, 2] *= self.downscale
        H[1, 2] *= self.downscale
        return H
