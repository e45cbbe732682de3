"""Conv+BN folding: eval outputs must be bit-close before/after fuse()."""
import numpy as np

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.fuse import fuse_conv_bn
from mgdt_yolo_tpu.nn.tasks import DetectionModel


class TestFuse:
    def test_outputs_unchanged(self, rng):
        mh = DetectionModel("gd_yolov8.yaml", nc=2)
        # give BN stats non-trivial values so the fold actually does work
        import jax
        mh.variables["batch_stats"] = jax.tree.map(
            lambda a: np.asarray(a) + rng.uniform(0.1, 0.5, np.shape(a)).astype(np.float32),
            mh.variables["batch_stats"])
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        before, _ = mh.predict(x)
        fused, n = fuse_conv_bn(mh.variables)
        assert n >= 40  # every Conv+BN pair in gd_yolov8-n folded (43)
        after, _ = mh.predict(x, fused)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=2e-4)

    def test_model_fuse_method(self, rng):
        mh = DetectionModel("gd_yolov8.yaml", nc=2)
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        before, _ = mh.predict(x)
        mh.fuse()
        after, _ = mh.predict(x)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=2e-4)
