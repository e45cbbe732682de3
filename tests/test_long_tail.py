"""Surface long-tail: Conv2/C3TR/DWConvTranspose2d golden parity, ensemble
loading, YOLO.tune facade reachability, LoadScreenshots gating
(reference conv.py:45-63, 89-94, block.py:476-483, nn/tasks.py:537-574,
engine/model.py:391-474, stream_loaders.py:109-148)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.nn import modules as M
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import import_reference


def _golden(flax_mod, torch_mod, c1, imgsz=16, atol=2e-4):
    torch_mod.eval()
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()}
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, c1, imgsz, imgsz)).astype(np.float32)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = flax_mod.init(jax.random.PRNGKey(0), xn, train=False)
    variables, rep = load_torch_state_dict(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables.get("batch_stats", {}))}, sd,
        verbose=False)
    assert not rep["name_missed"], rep["name_missed"][:6]
    assert not rep["shape_missed"], rep["shape_missed"][:6]
    with torch.no_grad():
        want = torch_mod(torch.from_numpy(x)).numpy()
    got = np.asarray(flax_mod.apply(variables, xn, train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=atol)


class TestModuleParity:
    def test_conv2(self):
        import_reference()
        from ultralytics.nn.modules.conv import Conv2 as TConv2
        torch.manual_seed(0)
        _golden(M.Conv2(8, 3, 1), TConv2(4, 8, 3, 1), c1=4, atol=2e-3)

    def test_c3tr(self):
        import_reference()
        from ultralytics.nn.modules.block import C3TR as TC3TR
        torch.manual_seed(0)
        _golden(M.C3TR(8, n=1), TC3TR(8, 8, n=1), c1=8, atol=1e-3)

    def test_c3x_cross_convs(self):
        """C3x must build the CROSS 1x3/3x1 convolutions (reference
        block.py:450-457 k=((1,3),(3,1))), not square 1x1/3x3 — the golden
        import fails on kernel shapes if the kernels are square."""
        import_reference()
        from ultralytics.nn.modules.block import C3x as TC3x
        torch.manual_seed(0)
        _golden(M.C3x(8, n=2), TC3x(8, 8, n=2), c1=8, atol=1e-3)

    def test_aifi_preserves_transposed_pos_embed_quirk(self):
        """The reference builds its 2D sincos rows W-major but adds them to
        H-major-flattened tokens (transformer.py:75-97) — the embedding is
        effectively transposed. Parity requires reproducing that, so this
        uses a NON-square map where any reordering of the rows diverges."""
        import_reference()
        from ultralytics.nn.modules.transformer import AIFI as TAIFI
        torch.manual_seed(0)
        tm = TAIFI(32, 64, 8)
        tm.eval()
        # torch AIFI subclasses TransformerEncoderLayer (attrs at top level);
        # our flax module nests the layer under name='enc'
        sd = {f"enc.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (1, 32, 8, 4)).astype(np.float32)  # H=8, W=4
        xn = jnp.asarray(x.transpose(0, 2, 3, 1))
        from mgdt_yolo_tpu.nn.modules.transformer import AIFI
        fm = AIFI(32, 64, 8)
        variables = fm.init(jax.random.PRNGKey(0), xn, train=False)
        variables, rep = load_torch_state_dict(
            {"params": dict(variables["params"]),
             "batch_stats": dict(variables.get("batch_stats", {}))}, sd,
            verbose=False)
        assert not rep["name_missed"], rep["name_missed"][:6]
        assert not rep["shape_missed"], rep["shape_missed"][:6]
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(fm.apply(variables, xn, train=False))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)

    def test_dwconv_transpose2d(self):
        import_reference()
        from ultralytics.nn.modules.conv import DWConvTranspose2d as TDW
        torch.manual_seed(0)
        _golden(M.DWConvTranspose2d(4, 2, 2), TDW(4, 4, 2, 2), c1=4)


class TestEnsemble:
    def test_two_model_ensemble_concats_anchors(self):
        from mgdt_yolo_tpu.nn.tasks import DetectionModel, Ensemble
        a = DetectionModel("yolov8.yaml", nc=2, seed=0)
        b = DetectionModel("yolov8.yaml", nc=2, seed=1)
        ens = Ensemble([a, b])
        assert len(ens) == 2 and ens.nc == 2
        x = jnp.zeros((1, 64, 64, 3))
        single, _ = a.predict(x)
        combo, _ = ens.predict(x)
        assert combo.shape[-1] == 2 * single.shape[-1]
        assert combo.shape[1] == single.shape[1]
        # NMS consumes the ensemble output directly
        from mgdt_yolo_tpu.ops.nms import non_max_suppression
        det, cnt = non_max_suppression(combo, conf_thres=0.5, max_det=10,
                                       pre_topk=64)
        assert det.shape == (1, 10, 6)

    def test_attempt_load_weights_single_yaml(self):
        from mgdt_yolo_tpu.nn.tasks import attempt_load_weights
        m = attempt_load_weights("yolov8.yaml")
        assert m.task == "detect" and hasattr(m, "variables")


class TestFacadeLongTail:
    def test_tune_facade_reaches_random_search(self, monkeypatch, tmp_path):
        """YOLO.tune must be callable and fall back to the built-in search
        when ray is absent (reference model.py:391-474)."""
        from mgdt_yolo_tpu.engine.model import YOLO
        calls = []

        class _Fake(YOLO):
            def train(self, **kw):
                calls.append(kw)
                return {"fitness": 0.5}

        y = _Fake("yolov8.yaml")
        best_cfg, best_fit, hist = y.tune(data="synthetic", max_samples=2,
                                          epochs_per_trial=1)
        assert len(calls) == 2 and best_fit == 0.5 and len(hist) == 2

    def test_screenshots_source_gated(self):
        from mgdt_yolo_tpu.data.loaders import load_inference_source
        try:
            import mss  # noqa: F401
            has_mss = True
        except ImportError:
            has_mss = False
        if has_mss:
            pytest.skip("mss installed; gating branch not reachable")
        with pytest.raises(ImportError, match="mss"):
            load_inference_source("screen 0")


class TestRepVGGBlock:
    def test_golden_parity(self):
        """RepVGGBlock (dense 3x3+BN + 1x1+BN + identity BN, ReLU) vs the
        reference rep_vgg_block.py:118-182."""
        import_reference()
        from ultralytics.nn.modules.rep_vgg_block import RepVGGBlock as TRep
        torch.manual_seed(3)
        t = TRep(8, 8, 3, 1)
        t.eval()
        # exercise live BN stats: push a forward in train mode first
        t.train()
        with torch.no_grad():
            t(torch.randn(4, 8, 16, 16))
        t.eval()
        _golden(M.RepVGGBlock(8, 3, 1), t, c1=8, atol=3e-3)

    def test_identity_branch_dropped_on_stride(self):
        import jax
        m = M.RepVGGBlock(16, 3, 2)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)), train=False)
        assert "rbr_identity" not in v["params"]
