"""Micro-batching inference server (engine/serve.py).

Covers: request coalescing into one static-shape dispatch, padded short
batches, result parity with the predictor path on identical images, and
clean shutdown with in-flight work drained.
"""
import numpy as np
import pytest

from mgdt_yolo_tpu import YOLO


@pytest.fixture(scope="module")
def served_model():
    m = YOLO("yolov8n.yaml")
    return m


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    # varied sizes exercise per-request letterbox + scale_boxes
    sizes = [(96, 80), (64, 96), (72, 72), (80, 64)]
    return [rng.integers(0, 255, (*sizes[i % len(sizes)], 3),
                         dtype=np.uint8) for i in range(n)]


def test_server_coalesces_and_matches_predictor(served_model):
    imgs = _images(8, seed=1)
    srv = served_model.serve(batch=4, max_wait_ms=200.0, imgsz=64,
                             conf=1e-3, iou=0.7, max_det=32)
    try:
        futs = [srv.submit(im) for im in imgs]
        results = [f.result(timeout=600) for f in futs]
    finally:
        srv.stop()

    assert len(results) == 8
    assert srv.stats["requests"] == 8
    # 8 requests submitted faster than the wait window must coalesce
    assert srv.stats["batches"] <= 4
    assert srv.mean_occupancy > 1.0
    lat = srv.latency_ms()
    assert lat["n"] == 8 and lat["p50"] > 0

    # parity vs the predictor path on the same images / thresholds
    ref = served_model.predict(imgs, imgsz=64, conf=1e-3, iou=0.7, max_det=32)
    assert len(ref) == 8
    for r_srv, r_ref in zip(results, ref):
        a = np.asarray(r_srv.boxes.data) if r_srv.boxes is not None else np.zeros((0, 6))
        b = np.asarray(r_ref.boxes.data) if r_ref.boxes is not None else np.zeros((0, 6))
        assert a.shape == b.shape
        if a.size:
            np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_cancelled_future_does_not_kill_drainer(served_model):
    """A caller may cancel() a pending Future; resolving it raises
    InvalidStateError, which must not take down the drain loop (every later
    request would then hang forever)."""
    srv = served_model.serve(batch=4, max_wait_ms=50.0, imgsz=64, conf=1e-3)
    try:
        imgs = _images(3, seed=3)
        f_cancel = srv.submit(imgs[0])
        f_keep = srv.submit(imgs[1])
        f_cancel.cancel()  # legal: never set_running_or_notify_cancel'd
        assert f_keep.result(timeout=600) is not None
        # the server must still serve brand-new requests afterwards
        assert srv.predict(imgs[2]) is not None
    finally:
        srv.stop()
    assert f_cancel.cancelled()


def test_server_short_batch_and_restartless_stop(served_model):
    srv = served_model.serve(batch=4, max_wait_ms=1.0, imgsz=64, conf=1e-3)
    try:
        r = srv.predict(_images(1, seed=2)[0])  # lone request -> padded batch
        assert r is not None
        assert srv.stats["batches"] == 1 and srv.stats["requests"] == 1
    finally:
        srv.stop()
    # double-stop is a no-op; submit after stop raises
    srv.stop()
    with pytest.raises(RuntimeError):
        srv.submit(_images(1)[0])
