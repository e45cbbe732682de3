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

    def test_conv2_parallel_branch_folded(self, rng):
        """Conv2's BN normalizes conv(x) + cv2(x): the fold must scale BOTH
        kernels by the BN gain, or fused output drifts by cv2(x)*(1-g)."""
        import jax

        from mgdt_yolo_tpu.nn import modules as M
        mod = M.Conv2(8, 3, 1)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 4)).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), x, train=False)
        variables = {
            "params": dict(variables["params"]),
            "batch_stats": jax.tree.map(
                lambda a: np.asarray(a)
                + rng.uniform(0.2, 0.8, np.shape(a)).astype(np.float32),
                dict(variables["batch_stats"]))}
        # wrap one level so the walker sees {block: {conv, cv2, norm}}
        wrapped = {"params": {"m": variables["params"]},
                   "batch_stats": {"m": variables["batch_stats"]}}
        fused, n = fuse_conv_bn(wrapped)
        assert n == 1
        before = mod.apply(variables, x, train=False)
        after = mod.apply({"params": fused["params"]["m"],
                           "batch_stats": fused["batch_stats"]["m"]},
                          x, train=False)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=1e-5)
