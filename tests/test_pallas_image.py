"""Fused augment correctness (XLA path on CPU; Pallas variant is TPU-only
and exercised by the TPU verification drives)."""
import numpy as np

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.ops.pallas_image import fused_augment, fused_augment_reference


class TestFusedAugment:
    def test_matches_reference(self, rng):
        imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
        gains = (1.0 + rng.uniform(-0.3, 0.3, (3, 3))).astype(np.float32)
        flips = rng.integers(0, 2, (3, 2)).astype(np.int32)
        got = np.asarray(fused_augment(jnp.asarray(imgs), jnp.asarray(gains),
                                       jnp.asarray(flips)))
        want = fused_augment_reference(imgs, gains, flips)
        np.testing.assert_allclose(got, want, atol=2e-2)

    def test_identity_gains_is_normalize(self, rng):
        imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(fused_augment(jnp.asarray(imgs),
                                       jnp.ones((2, 3), np.float32),
                                       jnp.zeros((2, 2), np.int32)))
        np.testing.assert_allclose(got, imgs.astype(np.float32) / 255.0,
                                   atol=2e-2)

    def test_flip_moves_pixels(self, rng):
        imgs = rng.integers(0, 255, (1, 8, 8, 3), dtype=np.uint8)
        lr = np.asarray(fused_augment(jnp.asarray(imgs),
                                      jnp.ones((1, 3), np.float32),
                                      jnp.asarray([[1, 0]], np.int32)))
        np.testing.assert_allclose(lr[0, :, ::-1] * 255, imgs[0], atol=1.0)
