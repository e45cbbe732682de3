"""RT-DETR golden parity + pipeline smoke: full checkpoint import (485-key
state_dict, decoder layers / deformable attention / denoising embed /
query-selection heads) and eval forward agreement with the torch reference
(reference nn/tasks.py RTDETRDetectionModel + head.py:275-464)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import REFERENCE_ROOT, import_reference

IMGSZ = 160  # >= 300 encoder anchors so the top-300 query selection is valid


@pytest.fixture(scope="module")
def pair():
    import_reference()
    from ultralytics.nn.tasks import RTDETRDetectionModel
    torch.manual_seed(0)
    ref = RTDETRDetectionModel(
        cfg=str(REFERENCE_ROOT / "models" / "v8" / "yolov8-rtdetr.yaml"),
        verbose=False)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mine = DetectionModel("yolov8-rtdetr.yaml")
    variables, rep = load_torch_state_dict(mine.variables, sd, verbose=False)
    return ref, mine, variables, rep


class TestRTDETRImport:
    def test_every_key_lands(self, pair):
        _, _, _, rep = pair
        assert not rep["name_missed"], rep["name_missed"][:10]
        assert not rep["shape_missed"], rep["shape_missed"][:10]
        assert rep["matched"] >= 430, rep["matched"]


class TestRTDETRForwardParity:
    def test_eval_queries_match(self, pair):
        ref, mine, variables, _ = pair
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 3, IMGSZ, IMGSZ)).astype(np.float32)
        with torch.no_grad():
            out_t = ref(torch.from_numpy(x))
        # reference eval forward returns the raw head tuple:
        # (dec_bboxes (L,B,300,4), dec_scores (L,B,300,nc) LOGITS,
        #  enc_bboxes, enc_scores, dn_meta)
        want_boxes = out_t[0][-1].numpy()
        want_scores = out_t[1][-1].numpy()  # already sigmoided at eval (head.py:365)
        out, _ = mine.model.apply(variables,
                                  jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  train=False)
        got_boxes = np.asarray(out[0][-1])
        got_scores = np.asarray(out[1][-1])  # ours sigmoids at eval
        assert got_boxes.shape == want_boxes.shape
        # with random weights the encoder top-300 selection has near-ties,
        # so query ORDER differs between fp stacks; compare as a SET: each
        # of ours must have a reference query within tolerance (and vice
        # versa) over the concatenated (box, score) vector
        got = np.concatenate([got_boxes, got_scores], -1)[0]   # (300, 4+nc)
        want = np.concatenate([want_boxes, want_scores], -1)[0]
        d = np.abs(got[:, None, :] - want[None, :, :]).max(-1)  # (300, 300)
        fwd = (d.min(1) < 5e-3).mean()
        bwd = (d.min(0) < 5e-3).mean()
        assert fwd > 0.9 and bwd > 0.9, (fwd, bwd)


class TestRTDETRPipelineSmoke:
    def test_query_validator(self, pair):
        """No-NMS query validator end-to-end on synthetic data (reference
        vit/rtdetr/val.py). The full CDN train step is exercised on real
        hardware (too heavy for the CPU CI mesh)."""
        _, mine, variables, _ = pair
        from mgdt_yolo_tpu.cfg import get_cfg
        from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
        from mgdt_yolo_tpu.vit.rtdetr.val import RTDETRValidator
        args = get_cfg(overrides={"imgsz": 160, "batch": 4, "mode": "val"})
        v = RTDETRValidator(args=args)
        ds = SyntheticDetectionDataset(n=8, imgsz=160, nc=2, seed=1)
        res = v(mine, variables, dataset=ds)
        assert np.isfinite(res["map50"])
