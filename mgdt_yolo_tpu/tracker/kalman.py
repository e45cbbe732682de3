"""Kalman filters for multi-object tracking (numpy, vectorized).

Re-implementation of the reference's 8-state constant-velocity filters
(tracker/utils/kalman_filter.py:11-462): KalmanFilterXYAH (ByteTrack state
[x, y, aspect, h, vx, vy, va, vh]) and KalmanFilterXYWH (BoT-SORT state
[x, y, w, h, ...]). Same noise weights (1/20 position, 1/160 velocity) and
Cholesky-based update; `multi_predict` is vectorized over all live tracks.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg

# 0.95 quantile of chi-square distribution (used for gating distance)
chi2inv95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070,
             6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919}


class KalmanFilterXYAH:
    """State [cx, cy, a, h, vcx, vcy, va, vh]; measurement [cx, cy, a, h]."""

    ndim = 4

    def __init__(self):
        dt = 1.0
        self._F = np.eye(8)
        self._F[:4, 4:] = np.eye(4) * dt
        self._H = np.eye(4, 8)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    # -- per-variant noise scales (overridden by XYWH) ----------------------
    def _initiate_std(self, m):
        wp, wv = self._std_weight_position, self._std_weight_velocity
        return [2 * wp * m[3], 2 * wp * m[3], 1e-2, 2 * wp * m[3],
                10 * wv * m[3], 10 * wv * m[3], 1e-5, 10 * wv * m[3]]

    def _predict_std(self, mean):
        wp, wv = self._std_weight_position, self._std_weight_velocity
        return ([wp * mean[3], wp * mean[3], 1e-2, wp * mean[3]],
                [wv * mean[3], wv * mean[3], 1e-5, wv * mean[3]])

    def _project_std(self, mean):
        wp = self._std_weight_position
        return [wp * mean[3], wp * mean[3], 1e-1, wp * mean[3]]

    # -- filter ops ---------------------------------------------------------
    def initiate(self, measurement: np.ndarray):
        mean = np.concatenate([measurement, np.zeros(4)])
        cov = np.diag(np.square(self._initiate_std(measurement)))
        return mean, cov

    def predict(self, mean, covariance):
        sp, sv = self._predict_std(mean)
        Q = np.diag(np.square(np.concatenate([sp, sv])))
        mean = self._F @ mean
        covariance = self._F @ covariance @ self._F.T + Q
        return mean, covariance

    def multi_predict(self, means: np.ndarray, covariances: np.ndarray):
        """Vectorized predict over N tracks: (N,8), (N,8,8)."""
        if len(means) == 0:
            return means, covariances
        wp, wv = self._std_weight_position, self._std_weight_velocity
        h = means[:, 3]
        sp = np.stack([wp * h, wp * h, np.full_like(h, 1e-2), wp * h], 1)
        sv = np.stack([wv * h, wv * h, np.full_like(h, 1e-5), wv * h], 1)
        Q = np.square(np.concatenate([sp, sv], axis=1))
        means = means @ self._F.T
        covariances = self._F @ covariances @ self._F.T
        idx = np.arange(8)
        covariances[:, idx, idx] += Q  # add diag without per-track np.diag calls
        return means, covariances

    def project(self, mean, covariance):
        R = np.diag(np.square(self._project_std(mean)))
        return self._H @ mean, self._H @ covariance @ self._H.T + R

    def update(self, mean, covariance, measurement):
        pm, pc = self.project(mean, covariance)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True, check_finite=False)
        K = scipy.linalg.cho_solve((chol, lower),
                                   (covariance @ self._H.T).T,
                                   check_finite=False).T
        innovation = measurement - pm
        mean = mean + K @ innovation
        covariance = covariance - K @ pc @ K.T
        return mean, covariance

    def gating_distance(self, mean, covariance, measurements,
                        only_position: bool = False, metric: str = "maha"):
        pm, pc = self.project(mean, covariance)
        if only_position:
            pm, pc = pm[:2], pc[:2, :2]
            measurements = measurements[:, :2]
        d = measurements - pm
        if metric == "gaussian":
            return np.sum(d * d, axis=1)
        chol = np.linalg.cholesky(pc)
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True,
                                          check_finite=False, overwrite_b=True)
        return np.sum(z * z, axis=0)


class KalmanFilterXYWH(KalmanFilterXYAH):
    """State [cx, cy, w, h, ...]; noise scales use both w and h
    (reference kalman_filter.py:238-462, used by BoT-SORT)."""

    def _initiate_std(self, m):
        wp, wv = self._std_weight_position, self._std_weight_velocity
        return [2 * wp * m[2], 2 * wp * m[3], 2 * wp * m[2], 2 * wp * m[3],
                10 * wv * m[2], 10 * wv * m[3], 10 * wv * m[2], 10 * wv * m[3]]

    def _predict_std(self, mean):
        wp, wv = self._std_weight_position, self._std_weight_velocity
        return ([wp * mean[2], wp * mean[3], wp * mean[2], wp * mean[3]],
                [wv * mean[2], wv * mean[3], wv * mean[2], wv * mean[3]])

    def _project_std(self, mean):
        wp = self._std_weight_position
        return [wp * mean[2], wp * mean[3], wp * mean[2], wp * mean[3]]

    def multi_predict(self, means, covariances):
        if len(means) == 0:
            return means, covariances
        wp, wv = self._std_weight_position, self._std_weight_velocity
        w, h = means[:, 2], means[:, 3]
        sp = np.stack([wp * w, wp * h, wp * w, wp * h], 1)
        sv = np.stack([wv * w, wv * h, wv * w, wv * h], 1)
        Q = np.square(np.concatenate([sp, sv], axis=1))
        means = means @ self._F.T
        covariances = self._F @ covariances @ self._F.T
        idx = np.arange(8)
        covariances[:, idx, idx] += Q  # add diag without per-track np.diag calls
        return means, covariances
