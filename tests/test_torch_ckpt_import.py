"""End-to-end torch .pt checkpoint import: save a reference-style pickled
checkpoint (nn.Module graph, EMA-preferred dict layout, trainer.py:411-436
format) and load it through load_torch_pt + load_torch_state_dict, then
check forward parity with the live reference model.
"""
import numpy as np
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.torch_import import load_torch_pt, load_torch_state_dict
from reference_harness import build_reference_model


class TestPtImport:
    def test_reference_checkpoint_roundtrip(self, tmp_path):
        torch.manual_seed(7)
        ref = build_reference_model("yolov8.yaml")
        ckpt_path = tmp_path / "best.pt"
        torch.save({"model": ref, "ema": None, "epoch": 3,
                    "train_args": {"model": "yolov8.yaml", "imgsz": 640}},
                   ckpt_path)

        sd, train_args = load_torch_pt(str(ckpt_path))
        assert train_args.get("model") == "yolov8.yaml"
        assert len(sd) > 250  # full weight set recovered from the pickle

        mine = DetectionModel("yolov8.yaml")
        variables, report = load_torch_state_dict(mine.variables, sd, verbose=False)
        assert not report["shape_missed"]
        assert report["matched"] >= 290

        rng = np.random.default_rng(5)
        x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ty, _ = ref(torch.from_numpy(x))
        decoded, _ = mine.predict(jnp.asarray(x.transpose(0, 2, 3, 1)), variables)
        np.testing.assert_allclose(np.asarray(decoded), ty.numpy(), atol=1e-2)

    def test_ema_preferred(self, tmp_path):
        """ckpt['ema'] wins over ckpt['model'] (reference tasks.py:581)."""
        torch.manual_seed(0)
        ref = build_reference_model("yolov8.yaml")
        ema = build_reference_model("yolov8.yaml")
        with torch.no_grad():
            for p in ema.parameters():
                p.add_(1.0)
        ckpt_path = tmp_path / "last.pt"
        torch.save({"model": ref, "ema": ema, "train_args": {}}, ckpt_path)
        sd, _ = load_torch_pt(str(ckpt_path))
        ref_sd = {k: v.numpy() for k, v in ema.state_dict().items()}
        k = "model.0.conv.weight"
        np.testing.assert_allclose(sd[k], ref_sd[k])
