"""Classification task: trainer / validator / predictor.

Reference yolo/v8/classify/{train,val,predict}.py re-shaped for TPU: one
jitted CE train step, top1/top5 validator, softmax predictor.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cfg import get_cfg
from ..nn.tasks import ClassificationModel
from ..utils import LOGGER
from ..utils.callbacks import CallbackMixin


class ClassificationDataset:
    """root/<class_name>/*.jpg layout, or synthetic fallback."""

    def __init__(self, root: Optional[str], imgsz: int = 224, nc: int = 4,
                 n_synth: int = 64, seed: int = 0):
        import cv2
        self.imgsz = imgsz
        self.items: List = []
        if root and Path(root).is_dir():
            classes = sorted(d.name for d in Path(root).iterdir() if d.is_dir())
            self.names = {i: c for i, c in enumerate(classes)}
            for ci, c in enumerate(classes):
                for f in sorted((Path(root) / c).glob("*")):
                    self.items.append((str(f), ci))
            self._load = lambda f: cv2.resize(cv2.imread(f), (imgsz, imgsz))
        else:  # synthetic: solid-color-dominant images per class
            self.names = {i: str(i) for i in range(nc)}
            rng = np.random.default_rng(seed)
            hues = rng.uniform(0, 255, (nc, 3))
            for i in range(n_synth):
                ci = i % nc
                img = np.clip(hues[ci] + rng.normal(0, 30, (imgsz, imgsz, 3)),
                              0, 255).astype(np.uint8)
                self.items.append((img, ci))
            self._load = lambda x: x

    def __len__(self):
        return len(self.items)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0):
        idx = np.arange(len(self.items))
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        for s in range(0, len(idx) - batch_size + 1, batch_size):
            sel = idx[s:s + batch_size]
            imgs = np.stack([np.asarray(self._load(self.items[i][0]), np.float32)
                             / 255.0 for i in sel])
            labels = np.asarray([self.items[i][1] for i in sel], np.int32)
            yield {"img": imgs[..., ::-1].copy(), "label": labels}


class ClassificationTrainer(CallbackMixin):
    def __init__(self, cfg=None, overrides: Optional[Dict] = None, model=None):
        self.args = get_cfg(cfg, overrides)
        self.init_callbacks()
        self.model_holder = model

    def train(self):
        args = self.args
        mh = self.model_holder or ClassificationModel(args.model or "yolov8n-cls.yaml")
        self.model_holder = mh
        ds = ClassificationDataset(args.data if args.data not in (None, "synthetic")
                                   else None, imgsz=args.imgsz, nc=mh.nc)
        tx = optax.sgd(args.lr0, momentum=args.momentum, nesterov=True)
        params = mh.variables["params"]
        opt_state = tx.init(params)
        batch_stats = mh.variables.get("batch_stats", {})

        @jax.jit
        def step(params, batch_stats, opt_state, img, label):
            def loss_fn(p):
                logits, upd = mh.model.apply(
                    {"params": p, "batch_stats": batch_stats}, img, train=True,
                    mutable=["batch_stats"])
                # CE (reference v8ClassificationLoss, loss.py:395-401)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), label).mean()
                return ce, upd["batch_stats"]
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        for epoch in range(args.epochs):
            losses = []
            for batch in ds.batches(args.batch, seed=args.seed + epoch):
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state,
                    jnp.asarray(batch["img"]), jnp.asarray(batch["label"]))
                losses.append(float(loss))
            LOGGER.info(f"epoch {epoch + 1}/{args.epochs} "
                        f"loss {np.mean(losses):.4f}")
        mh.variables = {"params": jax.device_get(params),
                        "batch_stats": jax.device_get(batch_stats)}
        validator = ClassificationValidator(args=self.args)
        return validator(mh, dataset=ds)


class ClassificationValidator(CallbackMixin):
    def __init__(self, args=None, dataloader=None):
        self.args = args if args is not None else get_cfg()
        self.init_callbacks()

    def __call__(self, mh, dataset=None) -> Dict[str, float]:
        args = self.args
        ds = dataset or ClassificationDataset(
            args.data if args.data not in (None, "synthetic") else None,
            imgsz=args.imgsz, nc=mh.nc)

        @jax.jit
        def infer(vs, img):
            return mh.model.apply(vs, img, train=False)

        from .validator import sharded_val_runner
        run_infer = sharded_val_runner(infer, mh.variables, args.batch)
        top1 = top5 = n = 0
        for batch in ds.batches(args.batch, shuffle=False):
            probs = run_infer({"img": np.asarray(batch["img"])})
            order = np.argsort(-probs, axis=-1)
            top1 += (order[:, 0] == batch["label"]).sum()
            top5 += (order[:, :5] == batch["label"][:, None]).any(-1).sum()
            n += len(batch["label"])
        res = {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}
        LOGGER.info(f"classify val: top1 {res['top1']:.3f} top5 {res['top5']:.3f}")
        return res


class ClassificationPredictor(CallbackMixin):
    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()
        self.init_callbacks()

    def setup_model(self, mh, variables=None):
        self.mh = mh
        self.variables = variables or mh.variables
        self._infer = jax.jit(lambda vs, x: mh.model.apply(vs, x, train=False))

    def __call__(self, source, stream: bool = False):
        import cv2

        from .results import Results
        from ..data.loaders import load_inference_source
        out = []
        for item in load_inference_source(source):
            img = cv2.resize(item["img"], (self.args.imgsz, self.args.imgsz))
            x = img[..., ::-1].astype(np.float32)[None] / 255.0
            probs = jax.device_get(self._infer(self.variables, jnp.asarray(x)))[0]
            r = Results(item["img"], item["path"], self.mh.names, probs=probs)
            out.append(r)
        return out
