"""Assigner + detection-loss parity vs the reference torch implementation."""
import numpy as np
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.loss import DetectionLoss, pad_targets
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import build_reference_model, import_reference


def _synthetic_targets(rng, batch_size, n_per_img, nc=80):
    batch_idx, cls, boxes = [], [], []
    for j in range(batch_size):
        for _ in range(n_per_img[j]):
            batch_idx.append(j)
            cls.append(rng.integers(0, nc))
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            boxes.append([cx, cy, w, h])
    return (np.array(batch_idx, np.float32), np.array(cls, np.float32),
            np.array(boxes, np.float32).reshape(-1, 4))


def _loss_parity(cfg_name, imgsz=64, step=0, atol=2e-3):
    import_reference()
    from ultralytics.yolo.utils.loss import v8DetectionLoss
    from types import SimpleNamespace

    torch.manual_seed(0)
    ref = build_reference_model(cfg_name)
    ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 3, imgsz, imgsz)).astype(np.float32)
    nc = int(getattr(ref, "yaml", {}).get("nc", 80)) if hasattr(ref, "yaml") else 80
    batch_idx, cls, boxes = _synthetic_targets(rng, 2, [3, 5], nc=nc)

    # ---- reference loss ----
    crit = v8DetectionLoss(ref)
    crit.epoch = step
    ref.train()
    feats_t = ref(torch.from_numpy(x))
    tbatch = {"batch_idx": torch.from_numpy(batch_idx),
              "cls": torch.from_numpy(cls),
              "bboxes": torch.from_numpy(boxes)}
    with torch.no_grad():
        total_t, parts_t = crit(feats_t, tbatch)

    # ---- ours ----
    mine = DetectionModel(cfg_name)
    variables, _ = load_torch_state_dict(mine.variables, sd, verbose=False)
    feats, _ = mine.forward_feats(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    gt_labels, gt_bboxes, mask_gt = pad_targets(batch_idx, cls, boxes, 2, 8,
                                                (imgsz, imgsz))
    loss_fn = DetectionLoss(mine.nc, mine.reg_max, mine.stride)
    out = loss_fn(feats, {"gt_labels": jnp.asarray(gt_labels),
                          "gt_bboxes": jnp.asarray(gt_bboxes),
                          "mask_gt": jnp.asarray(mask_gt)}, step)

    np.testing.assert_allclose(np.asarray(out.parts), parts_t.numpy(), atol=atol,
                               err_msg=f"loss parts mismatch for {cfg_name}")
    np.testing.assert_allclose(float(out.total), float(total_t), rtol=1e-3)
    return out


class TestLossParity:
    def test_yolov8n_loss(self):
        _loss_parity("yolov8.yaml")

    def test_mgdt_loss(self):
        """Flagship model: TOODHead reg_max=16, single stride-8 scale, nc=2."""
        _loss_parity("mspa_c2f_gd_tood_yolov8.yaml", atol=5e-3)

    def test_alpha_anneal_changes_assignment(self):
        """coff>0 anneals alpha down -> loss changes (reference tal.py:266-267)."""
        a = _loss_parity("yolov8.yaml", step=0)
        b = _loss_parity("yolov8.yaml", step=161 * 50)
        assert float(a.total) != float(b.total)

    def test_empty_image_is_finite(self):
        """All-padding gt (no objects) must produce finite loss, no NaNs."""
        mine = DetectionModel("yolov8.yaml")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        feats, _ = mine.forward_feats(mine.variables, x)
        G = 8
        batch = {"gt_labels": jnp.zeros((1, G), jnp.int32),
                 "gt_bboxes": jnp.zeros((1, G, 4), jnp.float32),
                 "mask_gt": jnp.zeros((1, G), bool)}
        out = DetectionLoss(mine.nc, mine.reg_max, mine.stride)(feats, batch, 0)
        assert np.isfinite(float(out.total))
