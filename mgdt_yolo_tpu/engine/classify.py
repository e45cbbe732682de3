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
                 n_synth: int = 64, seed: int = 0,
                 noise_seed: Optional[int] = None):
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
            # noise_seed draws a held-out split: same class hues (seed), new
            # noise instances — a genuine val set for the synthetic task
            nrng = (np.random.default_rng(noise_seed)
                    if noise_seed is not None else rng)
            for i in range(n_synth):
                ci = i % nc
                img = np.clip(hues[ci] + nrng.normal(0, 30, (imgsz, imgsz, 3)),
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
        """Full reference recipe (reference classify/train.py delegates to
        BaseTrainer, engine/trainer.py:259-360): build_optimizer's warmup +
        per-epoch lr decay + decoupled weight decay + grouped bias lr, EMA
        with the ramped decay, per-epoch EMA validation with best tracking,
        and last/best orbax checkpoints when a save_dir is configured."""
        args = self.args
        mh = self.model_holder or ClassificationModel(args.model or "yolov8n-cls.yaml")
        self.model_holder = mh
        # train/val split: folder datasets use the reference's root/train +
        # root/val layout when present; synthetic draws a held-out noise
        # split so best-epoch selection measures generalization, not the
        # training images themselves
        data = args.data if args.data not in (None, "synthetic") else None
        if data and (Path(data) / "train").is_dir():
            ds = ClassificationDataset(str(Path(data) / "train"),
                                       imgsz=args.imgsz, nc=mh.nc)
            vroot = Path(data) / "val"
            val_ds = (ClassificationDataset(str(vroot), imgsz=args.imgsz,
                                            nc=mh.nc)
                      if vroot.is_dir() else ds)
        elif data:
            ds = ClassificationDataset(data, imgsz=args.imgsz, nc=mh.nc)
            val_ds = ds
        else:
            ds = ClassificationDataset(None, imgsz=args.imgsz, nc=mh.nc,
                                       seed=args.seed)
            val_ds = ClassificationDataset(None, imgsz=args.imgsz, nc=mh.nc,
                                           seed=args.seed,
                                           noise_seed=args.seed + 9991)
        from .trainer import build_optimizer
        steps_per_epoch = max(len(ds) // args.batch, 1)
        tx = build_optimizer(
            mh.variables["params"], getattr(args, "optimizer", "auto") or "auto",
            lr0=args.lr0, lrf=args.lrf, momentum=args.momentum,
            weight_decay=args.weight_decay,
            warmup_steps=int(args.warmup_epochs * steps_per_epoch),
            total_steps=steps_per_epoch * args.epochs,
            steps_per_epoch=steps_per_epoch, epochs=args.epochs,
            cos_lr=bool(getattr(args, "cos_lr", False)),
            warmup_momentum=args.warmup_momentum, nc=mh.nc,
            warmup_bias_lr=args.warmup_bias_lr)
        params = mh.variables["params"]
        opt_state = tx.init(params)
        batch_stats = mh.variables.get("batch_stats", {})
        ema = params
        n_upd = jnp.zeros((), jnp.int32)

        @jax.jit
        def step(params, batch_stats, opt_state, ema, n_upd, img, label):
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
            new_params = optax.apply_updates(params, updates)
            # EMA with the reference's ramped decay (torch_utils ModelEMA)
            n = n_upd + 1
            d = 0.9999 * (1 - jnp.exp(-n.astype(jnp.float32) / 2000.0))
            new_ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                                   ema, new_params)
            return new_params, new_bs, new_opt, new_ema, n, loss

        best_top1, best_vars, best_res = -1.0, None, None
        validator = ClassificationValidator(args=self.args)
        for epoch in range(args.epochs):
            losses = []
            for batch in ds.batches(args.batch, seed=args.seed + epoch):
                params, batch_stats, opt_state, ema, n_upd, loss = step(
                    params, batch_stats, opt_state, ema, n_upd,
                    jnp.asarray(batch["img"]), jnp.asarray(batch["label"]))
                losses.append(float(loss))
            mh.variables = {"params": jax.device_get(ema),
                            "batch_stats": jax.device_get(batch_stats)}
            res = validator(mh, dataset=val_ds)
            LOGGER.info(f"epoch {epoch + 1}/{args.epochs} "
                        f"loss {np.mean(losses):.4f} top1 {res['top1']:.3f}")
            if res["top1"] >= best_top1:
                best_top1, best_vars, best_res = res["top1"], mh.variables, res
                self._save_ckpt(best_vars, "best")
        self._save_ckpt(mh.variables, "last")
        if best_vars is not None:  # final weights = best, like the reference
            mh.variables = best_vars
        res = dict(best_res or {"top1": 0.0, "top5": 0.0})
        res["best_top1"] = best_top1
        return res

    def _save_ckpt(self, variables, name: str):
        save_dir = getattr(self.args, "save_dir", None)
        if not save_dir:
            return
        import shutil
        import orbax.checkpoint as ocp
        path = (Path(str(save_dir)) / "weights" / name).absolute()
        if path.exists():
            shutil.rmtree(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        ocp.PyTreeCheckpointer().save(path, variables)


class ClassificationValidator(CallbackMixin):
    def __init__(self, args=None, dataloader=None):
        self.args = args if args is not None else get_cfg()
        self.init_callbacks()
        self._infer = None      # jit cache: stable across per-epoch calls
        self._infer_mh = None   # ...but keyed to the model holder it closed
                                # over (a different mh must rebuild, not
                                # silently run the first model)

    def __call__(self, mh, dataset=None) -> Dict[str, float]:
        args = self.args
        ds = dataset or ClassificationDataset(
            args.data if args.data not in (None, "synthetic") else None,
            imgsz=args.imgsz, nc=mh.nc)

        if self._infer is None or self._infer_mh is not mh:
            self._infer = jax.jit(
                lambda vs, img: mh.model.apply(vs, img, train=False))
            self._infer_mh = mh

        from .validator import sharded_val_runner
        run_infer = sharded_val_runner(self._infer, mh.variables, args.batch)
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
