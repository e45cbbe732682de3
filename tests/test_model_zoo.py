"""Cross-version model zoo (reference models/v3|v5|v6|rt-detr): every YAML
builds, forwards, discovers correct strides, and the representative members
match the torch reference forward bit-for-tolerance (covers the v5 padded
stem, v6 global ReLU activation + bare deconv upsampling, v3-tiny
MaxPool/ZeroPad path, and negative from-refs)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import build_reference_model

ZOO = [
    ("yolov8n-p2.yaml", (4, 8, 16, 32)),
    ("yolov8n-p6.yaml", (8, 16, 32, 64)),
    ("yolov5n.yaml", (8, 16, 32)),
    ("yolov5n-p6.yaml", (8, 16, 32, 64)),
    ("yolov3-tiny.yaml", (16, 32)),
    ("yolov3.yaml", (8, 16, 32)),
    ("yolov3-spp.yaml", (8, 16, 32)),
    ("yolov6n.yaml", (8, 16, 32)),
]


class TestZooBuilds:
    @pytest.mark.parametrize("cfg,stride", ZOO)
    def test_build_forward_stride(self, cfg, stride):
        m = DetectionModel(cfg)
        assert m.stride == stride, (cfg, m.stride)
        out, feats = m.predict(jnp.zeros((1, 128, 128, 3)))
        a = sum((128 // s) ** 2 for s in stride)
        assert out.shape == (1, 84, a)


def _zoo_parity(cfg, subdir, imgsz=64, atol=1e-2):  # decoded pixel boxes: house tolerance (test_model_parity uses atol*5)
    torch.manual_seed(0)
    ref = build_reference_model(cfg, subdir=subdir)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mine = DetectionModel(cfg)
    variables, rep = load_torch_state_dict(mine.variables, sd, verbose=False)
    assert not rep["name_missed"], rep["name_missed"][:8]
    assert not rep["shape_missed"], rep["shape_missed"][:8]
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, imgsz, imgsz)).astype(np.float32)
    with torch.no_grad():
        ty = ref(torch.from_numpy(x))[0]
    decoded, _ = mine.predict(jnp.asarray(x.transpose(0, 2, 3, 1)), variables)
    np.testing.assert_allclose(np.asarray(decoded), ty.numpy(), atol=atol)


class TestZooParity:
    def test_yolov5n(self):
        _zoo_parity("yolov5n.yaml", "v5")

    def test_yolov6n(self):
        """Covers the yaml-wide nn.ReLU() activation override and the bare
        nn.ConvTranspose2d upsampler."""
        _zoo_parity("yolov6n.yaml", "v6")

    def test_yolov3_tiny(self):
        """Covers nn.MaxPool2d / nn.ZeroPad2d and -2 from-refs."""
        _zoo_parity("yolov3-tiny.yaml", "v3")


class TestZooSpecialHeads:
    def test_pose_p6_builds(self):
        m = DetectionModel("yolov8n-pose-p6.yaml")
        assert m.stride == (8, 16, 32, 64)
        out, _ = m.predict(jnp.zeros((1, 128, 128, 3)))

    def test_rtdetr_x_builds(self):
        m = DetectionModel("rtdetr-x.yaml")
        out = m.predict(jnp.zeros((1, 160, 160, 3)))
        dec_bboxes = out[0][0]
        assert dec_bboxes.shape[-2:] == (300, 4)

    def test_p2_parity(self):
        """P2 4-scale head golden parity (reference models/v8/yolov8-p2.yaml)."""
        _zoo_parity("yolov8n-p2.yaml", "v8")
