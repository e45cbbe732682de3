"""North-star e2e parity: the REFERENCE torch val pipeline (its LetterBox,
its non_max_suppression, its IoU matching, its ap_per_class) vs OUR full
DetectionValidator, on the same synthetic images with identical weights.

The torch reference is first overfit for a few dozen steps on the synthetic
set so confidences are informative (random weights make every metric
trivially zero); the trained state_dict is then imported into the flax model
and both validation pipelines must produce matching mAP50 / mAP50-95 and
per-image class counts.

Reference pipeline pieces: yolo/v8/detect/val.py:64-110 (update_metrics),
:152-175 (_process_batch), yolo/utils/ops.py:136-266 (NMS),
yolo/utils/metrics.py ap_per_class.
"""
import numpy as np
import pytest
import torch

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
from mgdt_yolo_tpu.engine.validator import DetectionValidator
from mgdt_yolo_tpu.nn.tasks import DetectionModel
from mgdt_yolo_tpu.utils.torch_import import load_torch_state_dict
from reference_harness import build_reference_model, import_reference

IMGSZ = 160
N_IMG = 12


def _train_reference(ref, dataset, imgsz, steps=200):
    """Overfit the torch reference on the synthetic set (Adam, its own loss
    + assigner with the detect-loss epoch threading)."""
    import_reference()
    from types import SimpleNamespace

    from ultralytics.yolo.utils.loss import v8DetectionLoss

    ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    crit = v8DetectionLoss(ref)
    crit.epoch = 0
    imgs, tgt_bi, tgt_cls, tgt_box = [], [], [], []
    for i in range(len(dataset)):
        item = dataset[i]
        im = item["img"]
        h, w = im.shape[:2]
        assert (h, w) == (imgsz, imgsz)  # synthetic images are square imgsz
        imgs.append(im[..., ::-1].copy().transpose(2, 0, 1) / 255.0)
        for box, c in zip(item["boxes"], item["cls"]):
            x1, y1, x2, y2 = box
            tgt_bi.append(i)
            tgt_cls.append(c)
            tgt_box.append([(x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                            (x2 - x1) / w, (y2 - y1) / h])
    x = torch.from_numpy(np.stack(imgs)).float()
    batch = {"batch_idx": torch.tensor(tgt_bi, dtype=torch.float32),
             "cls": torch.tensor(tgt_cls, dtype=torch.float32),
             "bboxes": torch.tensor(tgt_box, dtype=torch.float32)}
    ref.train()
    opt = torch.optim.Adam(ref.parameters(), lr=3e-3)
    for _ in range(steps):
        opt.zero_grad()
        loss, _ = crit(ref(x), batch)
        loss.backward()
        opt.step()
    ref.eval()


def _reference_val(ref, dataset, imgsz, conf=0.001, iou=0.7):
    """The reference validator's math, end-to-end on torch."""
    import_reference()
    from ultralytics.yolo.data.augment import LetterBox
    from ultralytics.yolo.utils import ops as ref_ops
    from ultralytics.yolo.utils.metrics import ap_per_class, box_iou

    iouv = torch.linspace(0.5, 0.95, 10)
    letterbox = LetterBox((imgsz, imgsz), scaleup=False)
    stats = []
    per_image = []
    for i in range(len(dataset)):
        item = dataset[i]
        im0 = item["img"]
        lb = letterbox(image=im0.copy())
        x = torch.from_numpy(
            lb[..., ::-1].copy().transpose(2, 0, 1)[None]).float() / 255.0
        with torch.no_grad():
            preds = ref(x)
        decoded = preds[0] if isinstance(preds, tuple) else preds
        dets = ref_ops.non_max_suppression(decoded, conf_thres=conf,
                                           iou_thres=iou, multi_label=True,
                                           max_det=300)[0]
        predn = dets.clone()
        ori_shape = im0.shape[:2]
        predn[:, :4] = ref_ops.scale_boxes((imgsz, imgsz), predn[:, :4],
                                           ori_shape)
        gt_boxes = torch.from_numpy(item["boxes"])
        gt_cls = torch.from_numpy(item["cls"]).float()
        # _process_batch (val.py:152-175)
        correct = np.zeros((len(predn), 10), bool)
        if len(predn) and len(gt_boxes):
            iou_m = box_iou(gt_boxes, predn[:, :4])
            correct_class = gt_cls[:, None] == predn[:, 5]
            for k in range(10):
                xidx = torch.where((iou_m >= iouv[k]) & correct_class)
                if xidx[0].shape[0]:
                    matches = torch.cat(
                        (torch.stack(xidx, 1),
                         iou_m[xidx[0], xidx[1]][:, None]), 1).numpy()
                    if xidx[0].shape[0] > 1:
                        matches = matches[matches[:, 2].argsort()[::-1]]
                        matches = matches[
                            np.unique(matches[:, 1], return_index=True)[1]]
                        matches = matches[
                            np.unique(matches[:, 0], return_index=True)[1]]
                    correct[matches[:, 1].astype(int), k] = True
        stats.append((torch.from_numpy(correct), predn[:, 4], predn[:, 5],
                      gt_cls))
        per_image.append((predn.numpy(), gt_cls.numpy()))
    flat = [torch.cat([s[j] for s in stats], 0).numpy() for j in range(4)]
    res = ap_per_class(*flat, names={0: "0", 1: "1"})
    ap = res[5]
    map50 = float(ap[:, 0].mean())
    mapall = float(ap.mean())
    return map50, mapall, per_image


class TestE2EMetricParity:
    def test_detect_val_pipeline_matches_reference(self):
        torch.manual_seed(0)
        ds = SyntheticDetectionDataset(n=N_IMG, imgsz=IMGSZ, nc=2, seed=4)
        ref = build_reference_model("yolov8.yaml", nc=2)
        _train_reference(ref, ds, IMGSZ)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        mine = DetectionModel("yolov8.yaml", nc=2)
        variables, rep = load_torch_state_dict(mine.variables, sd,
                                               verbose=False)
        assert not rep["name_missed"] and not rep["shape_missed"]

        map50_ref, map_ref, per_img_ref = _reference_val(ref, ds, IMGSZ)
        assert map50_ref > 0.2, f"reference overfit too weak ({map50_ref})"

        args = get_cfg(overrides={"imgsz": IMGSZ, "batch": 4, "conf": 0.001,
                                  "iou": 0.7, "mode": "val"})
        validator = DetectionValidator(args=args)
        results = validator(mine, variables, dataset=ds)

        assert abs(results["map50"] - map50_ref) < 0.02, \
            (results["map50"], map50_ref)
        assert abs(results["map"] - map_ref) < 0.03, (results["map"], map_ref)

        # count-MAE agreement at a realistic confidence (0.25): per-image
        # per-class detection counts from both pipelines
        ref_counts, ours_counts = [], []
        for (predn, _), det_s in zip(per_img_ref,
                                     validator._per_image_preds):
            for c in (0, 1):
                ref_counts.append(
                    int(((predn[:, 5] == c) & (predn[:, 4] > 0.25)).sum()))
                ours_counts.append(
                    int(((det_s[:, 5] == c) & (det_s[:, 4] > 0.25)).sum()))
        diff = np.abs(np.array(ref_counts) - np.array(ours_counts))
        assert diff.mean() <= 0.25, (ref_counts, ours_counts)
