"""Seg/pose loss VALUE parity vs the reference torch implementation
(v8SegmentationLoss / v8PoseLoss, yolo/utils/loss.py:212-392): same imported
weights, same inputs/targets, loss parts must agree."""
from types import SimpleNamespace

import numpy as np
import torch

import jax.numpy as jnp

from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.loss_seg_pose import PoseLoss, SegmentationLoss
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import REFERENCE_ROOT, import_reference


def _build_ref(cls_name, cfg_name, nc=None):
    import_reference()
    import ultralytics.nn.tasks as T
    cfg = str(REFERENCE_ROOT / "models" / "v8" / cfg_name)
    model = getattr(T, cls_name)(cfg=cfg, verbose=False, nc=nc)
    model.eval()
    return model


def _shim_assigner_epoch(crit, epoch=0):
    """Reference quirk: v8SegmentationLoss/v8PoseLoss call self.assigner(...)
    WITHOUT the `epoch` argument the fork's HeuristicPositiveSampleAssigner_v1
    requires (loss.py:254-257 vs tal.py forward signature) — upstream seg/pose
    training crashes with a TypeError. Shim epoch in so the reference math can
    run; our losses thread `step` the same way the detect loss does."""
    inner = crit.assigner

    class _Epoch(torch.nn.Module):
        @torch.no_grad()
        def forward(self, *a):
            return inner(*a, epoch)

    crit.assigner = _Epoch()


def _targets(rng, b, n_per_img, nc, imgsz):
    batch_idx, cls, boxes = [], [], []
    for j in range(b):
        for _ in range(n_per_img[j]):
            batch_idx.append(j)
            cls.append(rng.integers(0, nc))
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.15, 0.3, 2)
            boxes.append([cx, cy, w, h])
    return (np.array(batch_idx, np.float32), np.array(cls, np.float32),
            np.array(boxes, np.float32).reshape(-1, 4))


def _pad_batch(batch_idx, cls, boxes_n, b, G, imgsz):
    """normalized xywh -> padded pixel-xyxy (b, G, ...) tensors."""
    gt_labels = np.zeros((b, G), np.int32)
    gt_bboxes = np.zeros((b, G, 4), np.float32)
    mask_gt = np.zeros((b, G), bool)
    slot = [0] * b
    for bi, c, (cx, cy, w, h) in zip(batch_idx.astype(int), cls, boxes_n):
        k = slot[bi]
        gt_labels[bi, k] = int(c)
        gt_bboxes[bi, k] = [(cx - w / 2) * imgsz, (cy - h / 2) * imgsz,
                            (cx + w / 2) * imgsz, (cy + h / 2) * imgsz]
        mask_gt[bi, k] = True
        slot[bi] += 1
    return gt_labels, gt_bboxes, mask_gt


class TestSegLossParity:
    def test_value_parity(self):
        imgsz, b, G = 64, 2, 8
        torch.manual_seed(0)
        ref = _build_ref("SegmentationModel", "yolov8-seg.yaml")
        ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, overlap_mask=False)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        rng = np.random.default_rng(5)
        x = rng.uniform(0, 1, (b, 3, imgsz, imgsz)).astype(np.float32)
        nc = int(ref.yaml.get("nc", 80))
        batch_idx, cls, boxes_n = _targets(rng, b, [2, 3], nc, imgsz)
        mh = mw = imgsz // 4
        n_inst = len(cls)
        inst_masks = np.zeros((n_inst, mh, mw), np.float32)
        for i, (cx, cy, w, h) in enumerate(boxes_n):
            x1, y1 = int((cx - w / 2) * mw), int((cy - h / 2) * mh)
            x2, y2 = int((cx + w / 2) * mw), int((cy + h / 2) * mh)
            inst_masks[i, y1:y2, x1:x2] = 1.0

        from ultralytics.yolo.utils.loss import v8SegmentationLoss
        crit = v8SegmentationLoss(ref)
        crit.epoch = 0
        _shim_assigner_epoch(crit, 0)
        ref.train()
        preds = ref(torch.from_numpy(x))
        tbatch = {"batch_idx": torch.from_numpy(batch_idx),
                  "cls": torch.from_numpy(cls),
                  "bboxes": torch.from_numpy(boxes_n),
                  "masks": torch.from_numpy(inst_masks)}
        with torch.no_grad():
            total_t, parts_t = crit(preds, tbatch)

        mine = DetectionModel("yolov8-seg.yaml")
        variables, rep = load_torch_state_dict(mine.variables, sd, verbose=False)
        assert not rep["name_missed"], rep["name_missed"][:8]
        (_, out), _ = mine.model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
            mutable=["batch_stats"])
        gt_labels, gt_bboxes, mask_gt = _pad_batch(batch_idx, cls, boxes_n,
                                                   b, G, imgsz)
        padded_masks = np.zeros((b, G, mh, mw), np.float32)
        slot = [0] * b
        for i, bi in enumerate(batch_idx.astype(int)):
            padded_masks[bi, slot[bi]] = inst_masks[i]
            slot[bi] += 1
        loss_fn = SegmentationLoss(mine.nc, mine.reg_max, mine.stride)
        got = loss_fn(out, {"gt_labels": jnp.asarray(gt_labels),
                            "gt_bboxes": jnp.asarray(gt_bboxes),
                            "mask_gt": jnp.asarray(mask_gt),
                            "masks": jnp.asarray(padded_masks)}, 0)
        np.testing.assert_allclose(np.asarray(got.parts), parts_t.numpy(),
                                   atol=5e-3)
        np.testing.assert_allclose(float(got.total), float(total_t), rtol=2e-3)


class TestPoseLossParity:
    def test_value_parity(self):
        imgsz, b, G = 64, 2, 8
        torch.manual_seed(0)
        ref = _build_ref("PoseModel", "yolov8-pose.yaml")
        ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, pose=12.0,
                                   kobj=1.0)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (b, 3, imgsz, imgsz)).astype(np.float32)
        batch_idx, cls, boxes_n = _targets(rng, b, [2, 2], 1, imgsz)
        cls[:] = 0
        n_inst = len(cls)
        nk = 17
        kpts_n = np.zeros((n_inst, nk, 3), np.float32)  # normalized xy + vis
        for i, (cx, cy, w, h) in enumerate(boxes_n):
            for k in range(5):  # 5 visible kpts inside the box
                kpts_n[i, k] = [cx + (k - 2) * w / 6, cy + (k - 2) * h / 6, 2.0]

        from ultralytics.yolo.utils.loss import v8PoseLoss
        crit = v8PoseLoss(ref)
        crit.epoch = 0
        _shim_assigner_epoch(crit, 0)
        ref.train()
        preds = ref(torch.from_numpy(x))
        tbatch = {"batch_idx": torch.from_numpy(batch_idx),
                  "cls": torch.from_numpy(cls),
                  "bboxes": torch.from_numpy(boxes_n),
                  "keypoints": torch.from_numpy(kpts_n)}
        with torch.no_grad():
            total_t, parts_t = crit(preds, tbatch)

        mine = DetectionModel("yolov8-pose.yaml")
        variables, rep = load_torch_state_dict(mine.variables, sd, verbose=False)
        assert not rep["name_missed"], rep["name_missed"][:8]
        (_, out), _ = mine.model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
            mutable=["batch_stats"])
        gt_labels, gt_bboxes, mask_gt = _pad_batch(batch_idx, cls, boxes_n,
                                                   b, G, imgsz)
        padded_k = np.zeros((b, G, nk, 3), np.float32)
        slot = [0] * b
        for i, bi in enumerate(batch_idx.astype(int)):
            k = kpts_n[i].copy()
            k[..., 0] *= imgsz
            k[..., 1] *= imgsz
            padded_k[bi, slot[bi]] = k
            slot[bi] += 1
        loss_fn = PoseLoss(mine.nc, mine.reg_max, mine.stride)
        got = loss_fn(out, {"gt_labels": jnp.asarray(gt_labels),
                            "gt_bboxes": jnp.asarray(gt_bboxes),
                            "mask_gt": jnp.asarray(mask_gt),
                            "keypoints": jnp.asarray(padded_k)}, 0)
        np.testing.assert_allclose(np.asarray(got.parts), parts_t.numpy(),
                                   atol=5e-3)
        np.testing.assert_allclose(float(got.total), float(total_t), rtol=2e-3)
