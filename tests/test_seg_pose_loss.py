"""Segment/pose loss smoke: finite values, gradient flow, zero-gt stability."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.loss_seg_pose import PoseLoss, SegmentationLoss


@pytest.fixture(scope="module")
def seg_model():
    return DetectionModel("yolov8-seg.yaml", nc=2)


@pytest.fixture(scope="module")
def pose_model():
    return DetectionModel("yolov8-pose.yaml")


def _det_batch(rng, b, G, imgsz):
    xy = rng.uniform(10, imgsz - 60, (b, G, 2)).astype(np.float32)
    wh = rng.uniform(20, 50, (b, G, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    return {"gt_labels": jnp.asarray(rng.integers(0, 2, (b, G)).astype(np.int32)),
            "gt_bboxes": jnp.asarray(boxes),
            "mask_gt": jnp.asarray(np.ones((b, G), bool))}


class TestSegmentationLoss:
    def test_finite_and_grads(self, seg_model):
        mh = seg_model
        rng = np.random.default_rng(0)
        b, G, imgsz = 2, 4, 128
        x = jnp.asarray(rng.uniform(0, 1, (b, imgsz, imgsz, 3)).astype(np.float32))
        batch = _det_batch(rng, b, G, imgsz)
        mask_res = imgsz // 4
        batch["masks"] = jnp.asarray(
            rng.integers(0, 2, (b, G, mask_res, mask_res)).astype(np.float32))
        loss_fn = SegmentationLoss(mh.nc, mh.reg_max, mh.stride)

        def f(vs):
            (_, out), _ = mh.model.apply(vs, x, train=True, mutable=["batch_stats"])
            return loss_fn(out, batch, 0).total

        loss, g = jax.value_and_grad(f)(mh.variables)
        assert np.isfinite(float(loss))
        assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g["params"]))

    def test_zero_gt(self, seg_model):
        mh = seg_model
        b, G, imgsz = 1, 4, 128
        x = jnp.zeros((b, imgsz, imgsz, 3))
        batch = {"gt_labels": jnp.zeros((b, G), jnp.int32),
                 "gt_bboxes": jnp.zeros((b, G, 4)),
                 "mask_gt": jnp.zeros((b, G), bool),
                 "masks": jnp.zeros((b, G, imgsz // 4, imgsz // 4))}
        (_, out), _ = mh.model.apply(mh.variables, x, train=True,
                                     mutable=["batch_stats"])
        loss = SegmentationLoss(mh.nc, mh.reg_max, mh.stride)(out, batch, 0)
        assert np.isfinite(float(loss.total))


class TestPoseLoss:
    def test_finite_and_grads(self, pose_model):
        mh = pose_model
        rng = np.random.default_rng(1)
        b, G, imgsz = 2, 3, 128
        x = jnp.asarray(rng.uniform(0, 1, (b, imgsz, imgsz, 3)).astype(np.float32))
        batch = _det_batch(rng, b, G, imgsz)
        batch["gt_labels"] = jnp.zeros((b, G), jnp.int32)  # pose nc=1
        kpts = rng.uniform(10, imgsz - 10, (b, G, 17, 2)).astype(np.float32)
        vis = np.ones((b, G, 17, 1), np.float32)
        batch["keypoints"] = jnp.asarray(np.concatenate([kpts, vis], -1))
        loss_fn = PoseLoss(mh.nc, mh.reg_max, mh.stride)

        def f(vs):
            (_, out), _ = mh.model.apply(vs, x, train=True, mutable=["batch_stats"])
            return loss_fn(out, batch, 0).total

        loss, g = jax.value_and_grad(f)(mh.variables)
        assert np.isfinite(float(loss))
        assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g["params"]))
