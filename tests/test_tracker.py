"""Tracker unit tests: Kalman behavior, ByteTrack id stability on synthetic
linear motion, BoT-SORT GMC path."""
import numpy as np

from mgdt_yolo_tpu.tracker.bot_sort import BOTSORT
from mgdt_yolo_tpu.tracker.byte_tracker import BYTETracker
from mgdt_yolo_tpu.tracker.kalman import KalmanFilterXYAH, KalmanFilterXYWH


class TestKalman:
    def test_predict_moves_with_velocity(self):
        kf = KalmanFilterXYAH()
        mean, cov = kf.initiate(np.array([10.0, 10.0, 1.0, 20.0]))
        mean[4] = 2.0  # vx
        mean2, cov2 = kf.predict(mean, cov)
        assert np.isclose(mean2[0], 12.0)
        assert np.trace(cov2) > np.trace(cov)  # uncertainty grows

    def test_update_pulls_toward_measurement(self):
        kf = KalmanFilterXYAH()
        mean, cov = kf.initiate(np.array([10.0, 10.0, 1.0, 20.0]))
        mean, cov = kf.predict(mean, cov)
        mean2, _ = kf.update(mean, cov, np.array([14.0, 10.0, 1.0, 20.0]))
        assert 10.0 < mean2[0] <= 14.0

    def test_multi_predict_matches_single(self):
        for KF in (KalmanFilterXYAH, KalmanFilterXYWH):
            kf = KF()
            m1, c1 = kf.initiate(np.array([5.0, 6.0, 1.2, 30.0]))
            m2, c2 = kf.initiate(np.array([50.0, 60.0, 0.8, 10.0]))
            sm1, sc1 = kf.predict(m1.copy(), c1.copy())
            means, covs = kf.multi_predict(np.stack([m1, m2]), np.stack([c1, c2]))
            np.testing.assert_allclose(means[0], sm1, atol=1e-9)
            np.testing.assert_allclose(covs[0], sc1, atol=1e-9)


def _moving_boxes(t, n=2):
    """n boxes translating right at distinct speeds."""
    out = []
    for i in range(n):
        x = 20 + 50 * i + 3 * t * (i + 1)
        y = 30 + 40 * i
        out.append([x, y, x + 25, y + 25])
    return np.asarray(out, np.float32)


class TestByteTrack:
    def test_id_stability_linear_motion(self):
        tr = BYTETracker()
        ids_per_frame = []
        for t in range(10):
            boxes = _moving_boxes(t)
            res = tr.update(boxes, np.array([0.9, 0.85]), np.array([0.0, 1.0]))
            if t >= 1:  # activated from frame 2 on
                ids_per_frame.append(tuple(sorted(res[:, 4].astype(int))))
        assert len(ids_per_frame) >= 8
        assert len(set(ids_per_frame)) == 1, f"ids changed: {set(ids_per_frame)}"

    def test_low_conf_rescue(self):
        tr = BYTETracker()
        for t in range(5):
            tr.update(_moving_boxes(t, 1), np.array([0.9]), np.array([0.0]))
        # drop confidence into the low band; track should survive via stage 2
        res = tr.update(_moving_boxes(5, 1), np.array([0.3]), np.array([0.0]))
        assert len(res) == 1

    def test_track_lost_then_removed(self):
        tr = BYTETracker()
        for t in range(3):
            tr.update(_moving_boxes(t, 1), np.array([0.9]), np.array([0.0]))
        for _ in range(3):  # object disappears
            res = tr.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0))
        assert len(res) == 0
        assert len(tr.lost_stracks) >= 1


class TestBotSort:
    def test_update_with_image_runs_gmc(self):
        tr = BOTSORT()
        img = np.random.default_rng(0).integers(0, 255, (120, 160, 3),
                                                dtype=np.uint8)
        for t in range(4):
            res = tr.update(_moving_boxes(t), np.array([0.9, 0.8]),
                            np.array([0.0, 1.0]), img)
        assert len(res) == 2


class TestTrackerConfig:
    """The tracker YAML path (reference tracker/track.py:15-36): cfg files
    are actually loaded, overrides take effect, one tracker per slot."""

    def test_bundled_yaml_loads(self):
        from mgdt_yolo_tpu.tracker.track import load_tracker_cfg
        cfg = load_tracker_cfg("bytetrack")
        assert cfg.tracker_type == "bytetrack"
        assert cfg.track_high_thresh == 0.5
        cfg = load_tracker_cfg("botsort.yaml")
        assert cfg.tracker_type == "botsort"
        assert cfg.gmc_method == "sparseOptFlow"

    def test_custom_yaml_overrides_take_effect(self, tmp_path):
        from types import SimpleNamespace

        from mgdt_yolo_tpu.tracker.track import on_predict_start, tracker_for
        custom = tmp_path / "mytracker.yaml"
        custom.write_text(
            "tracker_type: bytetrack\ntrack_high_thresh: 0.9\n"
            "track_low_thresh: 0.2\nnew_track_thresh: 0.7\n"
            "track_buffer: 15\nmatch_thresh: 0.6\n")
        pred = SimpleNamespace(args=SimpleNamespace(tracker=str(custom)))
        on_predict_start(pred)
        tr = tracker_for(pred, "__frames__")
        assert isinstance(tr, BYTETracker)
        assert tr.args.track_high_thresh == 0.9
        assert tr.args.new_track_thresh == 0.7
        assert tr.max_time_lost == 15
        assert tracker_for(pred, "__frames__") is tr  # stable per stream

    def test_unknown_tracker_rejected(self, tmp_path):
        import pytest

        from mgdt_yolo_tpu.tracker.track import load_tracker_cfg
        bad = tmp_path / "bad.yaml"
        bad.write_text("tracker_type: deepsort\n")
        with pytest.raises(ValueError):
            load_tracker_cfg(str(bad))
        with pytest.raises(FileNotFoundError):
            load_tracker_cfg("no_such_tracker.yaml")

    def test_one_tracker_per_stream_with_isolation(self):
        """Two streams: each gets its own tracker; feeding them disjoint
        scenes must not cross-contaminate Kalman states/IDs."""
        from types import SimpleNamespace

        from mgdt_yolo_tpu.tracker.track import on_predict_start, tracker_for
        pred = SimpleNamespace(args=SimpleNamespace(tracker="bytetrack.yaml"))
        on_predict_start(pred)
        t0 = tracker_for(pred, "a.mp4")
        t1 = tracker_for(pred, "b.mp4")
        assert len(pred.trackers) == 2
        assert t0 is not t1
        for t in range(6):
            t0.update(_moving_boxes(t, 1), np.array([0.9]), np.array([0.0]))
            box1 = np.asarray([[300.0, 300 + 2 * t, 340, 340 + 2 * t]],
                              np.float32)
            t1.update(box1, np.array([0.9]), np.array([0.0]))
        assert len(t0.tracked_stracks) == 1 and len(t1.tracked_stracks) == 1
        # stream a's track follows stream a's motion only
        assert abs(t0.tracked_stracks[0].tlwh[1] - 30) < 10
        assert t1.tracked_stracks[0].tlwh[1] > 250

    def test_batched_video_frames_share_one_tracker(self):
        """A batch holds CONSECUTIVE frames of one video (this predictor
        chunks a sequential source): all of them must update the SAME
        tracker in frame order, not round-robin across per-index trackers
        (which would fragment IDs whenever batch > 1)."""
        from types import SimpleNamespace

        from mgdt_yolo_tpu.engine.results import Results
        from mgdt_yolo_tpu.tracker.track import (on_predict_postprocess_end,
                                                 on_predict_start)
        img = np.zeros((96, 96, 3), np.uint8)
        pred = SimpleNamespace(args=SimpleNamespace(tracker="bytetrack.yaml"))
        on_predict_start(pred)
        ids_per_frame = []
        frame = 0
        for _batch in range(4):  # 4 batches x batch-size 3 = 12 frames
            results, items = [], []
            for _ in range(3):
                det = np.concatenate(
                    [_moving_boxes(frame), [[0.9], [0.85]],
                     [[0.0], [1.0]]], axis=1).astype(np.float32)
                results.append(Results(img, "video.mp4", {0: "a", 1: "b"},
                                       det))
                items.append({"img": img, "path": "video.mp4",
                              "frame_idx": frame, "is_video": True})
                frame += 1
            pred.results = results
            pred.batch_items = items
            on_predict_postprocess_end(pred)
            for r in results:
                d = np.asarray(r.boxes.data)
                if len(d) == 2:
                    ids_per_frame.append(tuple(sorted(d[:, 4].astype(int))))
        assert len(pred.trackers) == 1  # one stream -> one tracker
        assert len(ids_per_frame) >= 9
        assert len(set(ids_per_frame)) == 1, \
            f"ids fragmented across batch slots: {set(ids_per_frame)}"
