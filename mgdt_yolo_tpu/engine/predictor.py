"""Prediction engine: stream generator over images/dirs/arrays.

Reference yolo/engine/predictor.py:59-350 re-shaped for TPU: preprocess
(letterbox) on host, one jit-compiled forward+NMS per static batch shape,
Results assembly on host. Sources: numpy arrays, file paths, directories,
globs, lists thereof (the video/webcam loaders arrive with the tracker
subsystem).
"""
from __future__ import annotations

import glob
import time
from functools import partial
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import cv2
import jax
import numpy as np

from ..cfg import get_cfg
from ..data.augment import letterbox
from ..data.dataset import IMG_FORMATS
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.callbacks import CallbackMixin
from .results import Results


def letterbox_batch(imgs: List[np.ndarray], imgsz: int):
    """Letterbox BGR images into one RGB uint8 batch + (ori_shape, ratio_pad)
    metas. Shared by the stream predictor and the micro-batching server so
    the two paths cannot diverge on letterbox/meta conventions."""
    out, meta = [], []
    for im in imgs:
        lb, ratio, pad = letterbox(im, (imgsz, imgsz), scaleup=True)
        out.append(lb[..., ::-1])  # BGR->RGB; normalized on device
        meta.append((im.shape[:2], (ratio, pad)))
    return np.stack(out), meta


def det_to_original(det: np.ndarray, imgsz: int, meta) -> np.ndarray:
    """Rescale one image's [x1,y1,x2,y2,...] rows from the letterboxed frame
    back to original-image coordinates (in place; returns det)."""
    ori_shape, ratio_pad = meta
    if len(det):
        det[:, :4] = scale_boxes((imgsz, imgsz), det[:, :4], ori_shape,
                                 ratio_pad)
    return det


def load_source(source) -> List[Dict]:
    """Resolve a predict source to a list of {img(BGR), path} dicts (images,
    videos, streams, arrays — via data/loaders.py source sniffing)."""
    from ..data.loaders import load_inference_source
    return list(load_inference_source(source))


class BasePredictor(CallbackMixin):
    def __init__(self, args=None, overrides: Optional[Dict] = None):
        self.args = get_cfg(args, overrides) if not hasattr(args, "imgsz") else args
        self.init_callbacks()
        self.model_holder = None
        self._infer = None

    def setup_model(self, model_holder, variables=None):
        if (getattr(self.args, "half", False)
                and hasattr(model_holder, "with_dtype")):
            import jax.numpy as jnp
            model_holder.with_dtype(jnp.bfloat16)  # reference `half` flag
        self.model_holder = model_holder
        self.variables = variables or model_holder.variables
        conf = self.args.conf if self.args.conf else 0.25

        augment = bool(getattr(self.args, "augment", False))

        from mgdt_yolo_tpu.utils.compile_opts import tpu_compiler_options

        @partial(jax.jit, compiler_options=tpu_compiler_options())
        def infer(vs, img):
            import jax.numpy as jnp
            if jnp.issubdtype(img.dtype, jnp.integer):
                img = img.astype(jnp.float32) / 255.0
            if augment:  # TTA: 3 scales + lr-flip (tasks.predict_augment)
                decoded, _ = model_holder.predict_augment(img, variables=vs)
            else:
                decoded, _ = model_holder.model.apply(vs, img, train=False)
            return non_max_suppression(decoded, conf_thres=conf,
                                       iou_thres=self.args.iou,
                                       max_det=self.args.max_det,
                                       agnostic=self.args.agnostic_nms)
        self._infer = infer

        # SPMD serving: with >1 local device, predict batches ride a 1-D
        # data mesh (params replicated, batch sharded; per-image ops need no
        # collectives) — same design as engine/validator.sharded_val_runner
        # but non-blocking, so the dispatch-overlap pipeline is preserved.
        # MGDT_PREDICT_NO_SHARD=1 restores single-device execution.
        from ..parallel.mesh import data_sharding_setup
        self._mesh_ndev, self._batch_sharding, self.variables = \
            data_sharding_setup(self.variables, "MGDT_PREDICT_NO_SHARD")

    def _to_device(self, x: np.ndarray) -> "np.ndarray":
        """Pad the batch to a mesh-divisible size and shard it (no-op on a
        single device). Extra zero-image rows may emit detections — callers
        index outputs by their real chunk length, never the padded one."""
        if self._mesh_ndev:
            from ..parallel.mesh import pad_to_multiple
            return jax.device_put(pad_to_multiple(x, self._mesh_ndev),
                                  self._batch_sharding)
        return x

    def preprocess(self, imgs: List[np.ndarray]):
        return letterbox_batch(imgs, self.args.imgsz)

    def stream_inference(self, source, batch: int = 1) -> Iterator[Results]:
        items = load_source(source)
        names = self.model_holder.names
        self._video_writers = {}
        self.dataset_bs = batch  # stream-slot count (reference dataset.bs)
        self.run_callbacks("on_predict_start")

        def dispatch(chunk):
            """Preprocess + enqueue one batch; jax dispatch is async, so the
            device computes batch i while the host preprocesses and uploads
            batch i+1 (the dispatch-overlap that hides h2d behind compute —
            the reference's CUDA streams get this implicitly)."""
            t0 = time.time()
            x, meta = self.preprocess([c["img"] for c in chunk])
            t1 = time.time()
            fut = self._infer(self.variables, self._to_device(x))  # async
            return chunk, meta, fut, t0, t1

        pending = None
        starts = list(range(0, len(items), batch))
        for bi, s in enumerate(starts):
            if pending is None:
                pending = dispatch(items[s:s + batch])
            chunk, meta, fut, t0, t1 = pending
            # enqueue the NEXT batch before draining this one
            pending = (dispatch(items[starts[bi + 1]:starts[bi + 1] + batch])
                       if bi + 1 < len(starts) else None)
            # Inference time = the wait for THIS batch's result. t1 (dispatch)
            # would also count the previous batch's host postprocess/save and
            # the stream consumer's work done since then — with overlap, the
            # blocked-on-device window is the honest marginal cost.
            t_get = time.time()
            dets, counts = jax.device_get(fut)
            t2 = time.time()
            self.results = []
            for j, c in enumerate(chunk):
                n = int(counts[j])
                det = det_to_original(np.asarray(dets[j][:n]).copy(),
                                      self.args.imgsz, meta[j])
                speed = {"preprocess": (t1 - t0) / len(chunk) * 1e3,
                         "inference": (t2 - t_get) / len(chunk) * 1e3,
                         "postprocess": 0.0}
                r = Results(c["img"], c["path"], names, det, speed=speed)
                self.results.append(r)
            self.batch_items = chunk  # per-result source items (tracker keys)
            self.run_callbacks("on_predict_postprocess_end")
            for r, c in zip(self.results, chunk):
                if (self.args.save or self.args.save_txt
                        or getattr(self.args, 'save_crop', False)):
                    self._save(r, c)
                yield r
        for vw in self._video_writers.values():
            vw.release()
        self.run_callbacks("on_predict_end")

    def _save(self, r: Results, frame_meta=None):
        from ..utils import increment_path
        save_dir = increment_path(Path(self.args.project or "runs/detect") /
                                  (self.args.name or "predict"), exist_ok=True,
                                  mkdir=True)
        stem = Path(r.path).stem
        if self.args.save:
            if frame_meta and frame_meta.get("is_video"):
                vw = self._video_writers.get(r.path)
                if vw is None:
                    h, w = r.orig_img.shape[:2]
                    out = str(save_dir / f"{stem}.mp4")
                    vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"),
                                         frame_meta.get("fps", 30), (w, h))
                    self._video_writers[r.path] = vw
                vw.write(r.plot())
            else:
                cv2.imwrite(str(save_dir / f"{stem}.jpg"), r.plot())
        if self.args.save_txt:
            r.save_txt(save_dir / "labels" / f"{stem}.txt", self.args.save_conf)
        if getattr(self.args, "save_crop", False) and r.boxes is not None:
            from ..utils.plotting import save_one_box
            names = r.names or {}
            for row in np.asarray(r.boxes.data):
                cname = str(names.get(int(row[5]), int(row[5])))
                save_one_box(row[:4], r.orig_img,  # BGR in, RGB crop out
                             file=save_dir / "crops" / cname / f"{stem}.jpg")

    def __call__(self, source, stream: bool = False, batch: int = 1):
        gen = self.stream_inference(source, batch)
        return gen if stream else list(gen)


class DetectionPredictor(BasePredictor):
    """Detect-task predictor (reference yolo/v8/detect/predict.py:10-29)."""
