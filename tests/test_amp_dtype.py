"""Mixed-precision wiring: BaseModel.with_dtype + the amp/half config keys.

The reference trains under AMP autocast (default.yaml amp: True, gated by
check_amp) and vals/predicts in half when half=True (default.yaml:49). Our
TPU analog is bf16 compute with fp32 params/BN stats (nn/tasks.py
BaseModel.with_dtype); these tests pin the swap's semantics on CPU.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mgdt_yolo_tpu.nn.tasks import DetectionModel


@pytest.fixture(scope="module")
def mh():
    return DetectionModel("yolov8n.yaml")


def test_with_dtype_swaps_compute_not_params(mh):
    assert mh.dtype == jnp.float32
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    ref, _ = mh.predict(x)
    vars_before = mh.variables
    mh.with_dtype(jnp.bfloat16)
    try:
        assert mh.dtype == jnp.bfloat16
        assert mh.model.dtype == jnp.bfloat16
        assert mh.variables is vars_before  # params untouched (stay fp32)
        out, _ = mh.predict(x)
        assert jnp.isfinite(out.astype(jnp.float32)).all()
        rel = float(jnp.abs(out.astype(jnp.float32) - ref).max()
                    / (jnp.abs(ref).max() + 1e-9))
        assert rel < 0.1  # bf16 vs fp32 forward agreement
        # strides preserved across the rebuild
        assert mh.model.strides == tuple(mh.stride)
    finally:
        mh.with_dtype(jnp.float32)
    assert mh.model.dtype == jnp.float32


def test_half_flag_routes_predictor_to_bf16(mh):
    from mgdt_yolo_tpu.engine.predictor import DetectionPredictor
    p = DetectionPredictor(overrides={"half": True, "imgsz": 64,
                                      "conf": 0.001})
    p.setup_model(mh)
    try:
        assert mh.dtype == jnp.bfloat16
        img = np.random.default_rng(1).integers(0, 255, (80, 96, 3),
                                                dtype=np.uint8)
        res = p(img)
        assert len(res) == 1
    finally:
        mh.with_dtype(jnp.float32)
