"""Validation engine: jitted forward+NMS, host-side mAP accumulation.

Reference yolo/engine/validator.py:38-276 + yolo/v8/detect/val.py:19-278,
re-shaped for TPU: the model forward, DFL decode and batched NMS run as one
jit-compiled program per (static) batch shape; only the fixed-size (max_det,6)
detection tensors come back to host, where boxes are unletterboxed and fed to
the numpy ap_per_class pipeline (val NMS settings conf=0.001 iou=0.7
multi_label, val.py:63-71).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.build import build_dataloader
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.callbacks import CallbackMixin
from ..utils.metrics import ConfusionMatrix, DetMetrics, counting_agreement, match_predictions


class BaseValidator(CallbackMixin):
    def __init__(self, args=None, dataloader=None):
        self.args = args if args is not None else get_cfg()
        self.dataloader = dataloader
        self.init_callbacks()
        self._infer = None     # jit cache: per-epoch in-training validation
        self._infer_mh = None  # must not re-trace/re-compile the val graph

    def cached_infer(self, model_holder, build):
        """Return the jitted val step, rebuilding only when the model holder
        changes (a fresh closure per __call__ would miss jax's jit cache and
        pay tracing + compile-cache lookup every epoch)."""
        if self._infer is None or self._infer_mh is not model_holder:
            self._infer = build()
            self._infer_mh = model_holder
        return self._infer


def sharded_val_runner(infer, variables, batch_size: int):
    """Wrap a jitted `(variables, img) -> outputs` val step with SPMD data
    sharding when >1 local device is visible.

    Each val batch is padded to one static shape divisible by the mesh and
    sharded along the batch axis (params replicated). Every op in a val
    forward+NMS is per-image independent, so XLA partitions it with no
    collectives — val throughput scales with the mesh for free. The
    reference's DDP never shards validation (its validator runs on rank 0
    outside DistributedDataParallel); this is TPU-native headroom.
    MGDT_VAL_NO_SHARD=1 restores single-device execution.

    Returns run(batch) -> device_get'd outputs, sliced back to the batch's
    REAL rows (padded zero-images can still emit conf>0.001 detections, so
    they must never reach host accumulation).
    """
    from ..parallel.mesh import data_sharding_setup
    ndev, sharding, vs = data_sharding_setup(variables, "MGDT_VAL_NO_SHARD")
    if not ndev:
        def run(batch):
            return jax.device_get(infer(vs, batch["img"]))
        return run

    def run(batch):
        x = np.asarray(batch["img"])
        n_real = len(x)
        # pad to >= the loader batch, rounded to the mesh (one compiled
        # shape incl. the short final batch); labels stay host-side
        gb = -(-max(n_real, batch_size) // ndev) * ndev
        if gb != n_real:
            x = np.concatenate(
                [x, np.zeros((gb - n_real, *x.shape[1:]), x.dtype)])
        out = jax.device_get(infer(vs, jax.device_put(x, sharding)))
        return jax.tree.map(lambda a: a[:n_real], out)
    return run


def coco80_to_coco91_class():
    """80-index → 91-index COCO category ids (reference yolo/utils/ops.py):
    the val2017 annotation ids skip 11 removed categories."""
    return [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19,
            20, 21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38,
            39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
            56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75,
            76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90]


class DetectionValidator(BaseValidator):
    def __init__(self, args=None, dataloader=None):
        super().__init__(args, dataloader)
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.is_coco = False
        self.class_map = list(range(1000))
        self.jdict = []

    def pred_to_json(self, predn: np.ndarray, filename) -> None:
        """Append one image's detections in COCO json rows (reference
        yolo/v8/detect/val.py:240-252: xywh with the center→top-left corner
        shift, numeric stems become int image_ids, class_map indirection)."""
        from pathlib import Path
        stem = Path(str(filename)).stem
        image_id = int(stem) if stem.isnumeric() else stem
        box = predn[:, :4].astype(np.float64)
        box = np.stack([(box[:, 0] + box[:, 2]) / 2 - (box[:, 2] - box[:, 0]) / 2,
                        (box[:, 1] + box[:, 3]) / 2 - (box[:, 3] - box[:, 1]) / 2,
                        box[:, 2] - box[:, 0], box[:, 3] - box[:, 1]], axis=1)
        for p, b in zip(predn.tolist(), box.tolist()):
            self.jdict.append({
                "image_id": image_id,
                "category_id": self.class_map[int(p[5])],
                "bbox": [round(x, 3) for x in b],
                "score": round(p[4], 5)})

    def eval_json(self, results: Dict[str, float]) -> Dict[str, float]:
        """Write predictions.json and, when pycocotools is importable and
        COCO annotations exist, refresh mAP from COCOeval (reference
        val.py:253-278; offline envs get the json artifact + a warning)."""
        import json
        from pathlib import Path
        if not (getattr(self.args, "save_json", False) and self.jdict):
            return results
        save_dir = Path(str(getattr(self.args, "save_dir", None) or "."))
        save_dir.mkdir(parents=True, exist_ok=True)
        pred_json = save_dir / "predictions.json"
        with open(pred_json, "w") as f:
            json.dump(self.jdict, f)
        LOGGER.info(f"saved {len(self.jdict)} COCO-format predictions to "
                    f"{pred_json}")
        anno_json = getattr(self, "anno_json", None)
        if self.is_coco and anno_json and Path(anno_json).is_file():
            try:
                from pycocotools.coco import COCO
                from pycocotools.cocoeval import COCOeval
                anno = COCO(str(anno_json))
                pred = anno.loadRes(str(pred_json))
                ev = COCOeval(anno, pred, "bbox")
                ev.evaluate()
                ev.accumulate()
                ev.summarize()
                results["map"], results["map50"] = ev.stats[:2]
            except ImportError:
                LOGGER.warning("pycocotools not installed — predictions.json "
                               "written, COCOeval skipped")
            except Exception as e:
                LOGGER.warning(f"pycocotools unable to run: {e}")
        return results

    def _plot_val_batch(self, batch, dets, counts, model_holder):
        """val_batch0_labels.jpg / val_batch0_pred.jpg (reference
        val.py plot_val_samples/plot_predictions)."""
        try:
            from pathlib import Path

            from ..utils.plotting import plot_images
            sd = getattr(self.args, "save_dir", None)
            if not sd:
                return  # no run dir to land plots in (bare validator call)
            save_dir = Path(str(sd))
            names = getattr(model_holder, "names", {}) or {}
            imgs = np.asarray(batch["img"]).astype(np.float32) / 255.0
            gt = [np.concatenate(
                [np.asarray(batch["gt_bboxes"][j][batch["mask_gt"][j]]),
                 np.ones((int(batch["mask_gt"][j].sum()), 1)),
                 np.asarray(batch["gt_labels"][j][batch["mask_gt"][j]])[:, None]],
                1) for j in range(len(imgs))]
            plot_images(imgs, gt, names, str(save_dir / "val_batch0_labels.jpg"))
            pred = [np.asarray(dets[j][:int(counts[j])]) for j in range(len(imgs))]
            plot_images(imgs, pred, names, str(save_dir / "val_batch0_pred.jpg"))
        except Exception as e:  # plotting must never kill validation
            LOGGER.warning(f"val plots failed: {e}")

    def __call__(self, model_holder, variables=None, dataset=None,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        args = self.args
        if getattr(args, "half", False) and hasattr(model_holder, "with_dtype"):
            model_holder.with_dtype(jnp.bfloat16)  # reference val.py half (autocast)
        variables = variables or model_holder.variables
        conf = args.conf if args.conf else 0.001
        batch_size = args.batch
        if dataset is None:
            from .trainer import BaseTrainer
            t = BaseTrainer(overrides={**vars(args), "mode": "val"})
            t.model_holder = model_holder
            dataset = t.get_dataset(train=False)
        loader = self.dataloader or build_dataloader(
            dataset, batch_size, args.imgsz, train=False, seed=args.seed,
            rect=bool(getattr(args, "rect", False)),
            stride=int(max(model_holder.stride)))

        def build():
            from mgdt_yolo_tpu.utils.compile_opts import tpu_compiler_options

            @partial(jax.jit, static_argnames=(),
                     compiler_options=tpu_compiler_options())
            def infer(vs, img):
                if jnp.issubdtype(img.dtype, jnp.integer):
                    img = img.astype(jnp.float32) / 255.0
                decoded, _ = model_holder.model.apply(vs, img, train=False)
                # nc explicitly: segment/pose decodes append mask/kpt channels
                # val protocol: conf 0.001 + multi_label floods candidates —
                # use a deeper pre-NMS pool than the predict path (reference
                # caps at 30k, ops.py:213); 4096 is past the dense-head tail
                # block=1024: two-stage blocked fixpoint — same output as the
                # monolithic 4096² walk, 16× smaller peak IoU matrix
                return non_max_suppression(decoded, conf_thres=conf,
                                           iou_thres=args.iou,
                                           max_det=args.max_det,
                                           multi_label=True,
                                           agnostic=args.agnostic_nms,
                                           pre_topk=4096, block=1024,
                                           nc=model_holder.nc)
            return infer

        run_infer = sharded_val_runner(self.cached_infer(model_holder, build),
                                       variables, batch_size)

        metrics = DetMetrics()
        cm = ConfusionMatrix(model_holder.nc)
        per_image_preds, per_image_gts = [], []
        self.jdict = []
        # COCO protocol sniff (reference val.py:47-49): val2017-style split
        # gets the 91-id class_map and the standard annotation path
        data_str = str(getattr(args, "data", "") or "")
        img_path = str(getattr(dataset, "img_path", "") or "")
        self.is_coco = "coco" in (data_str + img_path) and \
            "val2017" in (data_str + img_path)
        self.class_map = (coco80_to_coco91_class() if self.is_coco
                          else list(range(1000)))
        if self.is_coco:
            from pathlib import Path
            # resolve() so short relative paths (cwd inside the dataset,
            # e.g. img_path='val2017') still have two parents to climb
            parents = Path(img_path).resolve().parents if img_path else []
            root = parents[1] if len(parents) > 1 else None
            self.anno_json = (root / "annotations/instances_val2017.json"
                              if root else None)
        self.run_callbacks("on_val_start")
        t0 = time.time()
        n_img = 0
        for bi, batch in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            dets, counts = run_infer(batch)
            if bi == 0 and getattr(args, "plots", False):
                self._plot_val_batch(batch, dets, counts, model_holder)
            in_shape = tuple(batch["img"].shape[1:3])  # rect: per-batch (h, w)
            metas = batch.get("metas") or [{}] * len(dets)
            for j in range(len(dets)):
                n = int(counts[j])
                det = np.asarray(dets[j][:n])  # input-space [x1,y1,x2,y2,conf,cls]
                m = metas[j] if j < len(metas) else {}
                gt_mask = batch["mask_gt"][j]
                gt_boxes = np.asarray(batch["gt_bboxes"][j][gt_mask])
                gt_cls = np.asarray(batch["gt_labels"][j][gt_mask]).astype(float)
                if m.get("ori_shape") is not None and m.get("ratio_pad"):
                    ori = m["ori_shape"]
                    det_s = det.copy()
                    det_s[:, :4] = scale_boxes(in_shape, det[:, :4],
                                               ori, m["ratio_pad"])
                    gt_s = scale_boxes(in_shape, gt_boxes.copy(), ori,
                                       m["ratio_pad"]) if len(gt_boxes) else gt_boxes
                else:
                    det_s, gt_s = det, gt_boxes
                tp = match_predictions(det_s[:, :4], det_s[:, 5], gt_s, gt_cls,
                                       self.iouv)
                metrics.update(tp, det_s[:, 4], det_s[:, 5], gt_cls)
                if getattr(args, "save_json", False):
                    self.pred_to_json(det_s, m.get("path", f"{n_img}"))
                cm.process_batch(det_s, gt_s, gt_cls)
                per_image_preds.append(det_s)
                per_image_gts.append((gt_s, gt_cls))
                n_img += 1
        results = metrics.process()
        self.confusion_matrix = cm
        if getattr(args, "plots", False) and getattr(args, "save_dir", None):
            try:
                cm.plot(save_dir=str(args.save_dir),
                        names=getattr(model_holder, "names", None))
            except Exception as e:
                LOGGER.warning(f"confusion-matrix plot failed: {e}")
        self.metrics = metrics
        self._per_image_preds = per_image_preds  # native-space, for parity
        self._per_image_gts = per_image_gts
        # fork counting metrics over the val set
        classes = list(range(model_holder.nc))
        self.counting_stats, self.count_r2 = counting_agreement(
            per_image_preds, per_image_gts, classes)
        results = self.eval_json(results)
        dt = time.time() - t0
        results["speed_ms_per_image"] = dt / max(n_img, 1) * 1000
        LOGGER.info(
            f"val: {n_img} images  P {results['precision']:.3f} R {results['recall']:.3f} "
            f"mAP50 {results['map50']:.3f} mAP50-95 {results['map']:.3f} "
            f"({results['speed_ms_per_image']:.1f} ms/img)")
        self.run_callbacks("on_val_end")
        return results
