"""RT-DETR predictor: score-threshold postprocess, no NMS
(reference vit/rtdetr/predict.py:11-40 — DETR decoders output a fixed query
set, so postprocess is a confidence filter over the top-300 queries).
"""
from __future__ import annotations

import numpy as np

import jax

from ...engine.predictor import BasePredictor
from ...engine.results import Results
from ...ops.boxes import xywh2xyxy


class RTDETRPredictor(BasePredictor):
    def setup_model(self, model_holder, variables=None):
        self.model_holder = model_holder
        self.variables = variables or model_holder.variables

        @jax.jit
        def infer(vs, img):
            (out, _) = model_holder.model.apply(vs, img, train=False)
            dec_bboxes, dec_scores = out[0], out[1]
            return dec_bboxes[-1], dec_scores[-1]  # final layer (b, nq, ...)
        self._infer = infer

    def stream_inference(self, source, batch: int = 1):
        from ...data.augment import letterbox
        from ...engine.predictor import load_source
        items = load_source(source)
        conf = self.args.conf if self.args.conf else 0.25
        names = self.model_holder.names
        for i in range(0, len(items), batch):
            chunk = items[i:i + batch]
            xs = []
            for c in chunk:
                # reference pre_transform STRETCHES to square (LetterBox
                # auto=False scaleFill=True, reference vit/rtdetr/predict.py:
                # 44) — the only geometry under which the bare [w0, h0]
                # multiply below maps normalized boxes back correctly; a
                # padded letterbox would offset/scale every box on
                # non-square images
                img, _, _ = letterbox(c["img"],
                                      (self.args.imgsz, self.args.imgsz),
                                      scale_fill=True)
                xs.append(img[..., ::-1].astype(np.float32) / 255.0)
            x = np.stack(xs)
            bboxes, scores = jax.device_get(self._infer(self.variables, x))
            for j, c in enumerate(chunk):
                bb = np.asarray(xywh2xyxy(bboxes[j]))  # normalized xyxy
                sc = np.asarray(scores[j])
                cls = sc.argmax(-1)
                val = sc.max(-1)
                keep = val > conf
                h0, w0 = c["img"].shape[:2]
                det = np.concatenate([
                    bb[keep] * [w0, h0, w0, h0], val[keep, None],
                    cls[keep, None].astype(np.float32)], axis=1)
                yield Results(c["img"], c["path"], names, det)

    def __call__(self, source, stream: bool = False, batch: int = 1):
        gen = self.stream_inference(source, batch)
        return gen if stream else list(gen)
