"""Golden parity: full-model forward vs the reference torch implementation.

Builds the reference model (torch CPU, stubs from reference_harness), imports
its live state_dict into the flax model, and compares eval-mode outputs on the
same random input. This covers every module the YAML exercises: Conv/C2f/SPPF,
MSPA_C2f+SPR, GD neck (SimFusion/IFM/ConvNeXtV2/Injection), Detect decode
(DFL reg_max=4) and TOODHead (TaskDecomposition + DCNv2, reg_max=16).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import build_reference_model


def _run_parity(cfg_name: str, imgsz: int = 64, atol: float = 2e-3):
    torch.manual_seed(0)
    ref = build_reference_model(cfg_name)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    mine = DetectionModel(cfg_name)
    variables, report = load_torch_state_dict(mine.variables, sd, verbose=False)
    # every torch key must land except known skips
    assert not report["name_missed"], f"unmatched keys: {report['name_missed'][:8]}"
    assert not report["shape_missed"], f"shape misses: {report['shape_missed'][:8]}"

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, imgsz, imgsz)).astype(np.float32)
    with torch.no_grad():
        ty, tfeats = ref(torch.from_numpy(x))

    decoded, feats = mine.predict(jnp.asarray(x.transpose(0, 2, 3, 1)), variables)
    for i, (tf_, jf) in enumerate(zip(tfeats, feats)):
        want = tf_.numpy().transpose(0, 2, 3, 1)
        got = np.asarray(jf)
        np.testing.assert_allclose(got, want, atol=atol,
                                   err_msg=f"raw map {i} mismatch in {cfg_name}")
    np.testing.assert_allclose(np.asarray(decoded), ty.numpy(), atol=atol * 5,
                               err_msg=f"decoded output mismatch in {cfg_name}")
    return report


class TestTTAParity:
    def test_predict_augment_matches_reference(self):
        """TTA (3 scales + lr-flip + de-scale + tail clip) golden parity
        (reference _predict_augment, nn/tasks.py:256-291)."""
        torch.manual_seed(0)
        cfg = "yolov8.yaml"
        ref = build_reference_model(cfg)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        mine = DetectionModel(cfg)
        variables, _ = load_torch_state_dict(mine.variables, sd, verbose=False)

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (1, 3, 96, 96)).astype(np.float32)
        with torch.no_grad():
            ty = ref._predict_augment(torch.from_numpy(x))[0]
        got, _ = mine.predict_augment(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                      variables)
        got = np.asarray(got)
        assert got.shape == tuple(ty.shape), (got.shape, ty.shape)
        np.testing.assert_allclose(got, ty.numpy(), atol=2e-2)


class TestForwardParity:
    def test_yolov8n_detect(self):
        r = _run_parity("yolov8.yaml")
        assert r["matched"] >= 290  # 297 torch tensors map into the flax tree

    def test_mspa_c2f_backbone(self):
        _run_parity("mspa_c2f_yolov8.yaml")

    def test_gd_neck(self):
        _run_parity("gd_yolov8.yaml")

    def test_full_mgdt(self):
        """MSPA-C2f + GD neck + TOODHead, nc=2 — the paper's flagship model."""
        _run_parity("mspa_c2f_gd_tood_yolov8.yaml")


class TestModelBuild:
    @pytest.mark.parametrize("cfg,strides", [
        ("yolov8.yaml", (8, 16, 32)),
        ("thead_yolov8.yaml", (16,)),
        ("gd_yolov8.yaml", (8,)),
        ("mspa_c2f_gd_tood_yolov8.yaml", (8,)),
    ])
    def test_stride_discovery(self, cfg, strides):
        m = DetectionModel(cfg)
        assert m.stride == strides

    def test_param_count_matches_reference(self):
        """4-param delta = the reference's frozen DFL arange conv."""
        ref = build_reference_model("yolov8.yaml")
        n_ref = sum(p.numel() for p in ref.parameters())
        mine = DetectionModel("yolov8.yaml")
        assert n_ref - mine.num_params() == 4

    def test_all_ablation_yamls_build(self):
        for cfg in ("yolov8.yaml", "mspa_c2f_yolov8.yaml", "thead_yolov8.yaml",
                    "mspa_c2f_thead_yolov8.yaml", "gd_yolov8.yaml",
                    "mspa_c2f_gd_yolov8.yaml", "gd_thead_yolov8.yaml",
                    "mspa_c2f_gd_tood_yolov8.yaml"):
            m = DetectionModel(cfg)
            assert m.num_params() > 0, cfg
