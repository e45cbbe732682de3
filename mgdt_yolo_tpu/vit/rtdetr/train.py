"""RT-DETR trainer: DetectionTrainer body with the DETR loss stack
(reference vit/rtdetr/train.py:23-57 — no-mosaic dataset, gt preprocessing
to normalized xywh).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...engine.trainer import DetectionTrainer
from ...ops.boxes import xyxy2xywh
from ...utils.loss import LossOutputs
from ..utils.loss import RTDETRDetectionLoss


class _DETRCriterion:
    """Adapts RTDETRDetectionLoss to the trainer's (out, batch, step) call.

    Normalizes padded pixel-space gt boxes to xywh in [0,1] (the DETR target
    convention) using the static train image size.
    """

    def __init__(self, nc: int, imgsz: int):
        self.loss = RTDETRDetectionLoss(nc=nc)
        self.imgsz = float(imgsz)

    def __call__(self, head_out, batch, step) -> LossOutputs:
        gt_norm = xyxy2xywh(batch["gt_bboxes"].astype(jnp.float32)) / self.imgsz
        b = {"gt_bboxes_norm": gt_norm, "gt_labels": batch["gt_labels"],
             "mask_gt": batch["mask_gt"]}
        dn_meta = head_out[4] if len(head_out) > 4 else None
        total, parts = self.loss(head_out[:4], b, dn_meta=dn_meta)
        main = jnp.stack([parts.get("loss_bbox", 0.0), parts.get("loss_class", 0.0),
                          parts.get("loss_giou", 0.0)])
        import jax
        # NO batch-size factor: the reference backprops the unscaled sum for
        # RT-DETR (nn/tasks.py:453 returns sum(loss.values()); the *bsz
        # convention belongs to the YOLO DetectionLoss only). Scaling here
        # would multiply every gradient by the batch size, tying the
        # effective lr to batch size against reference hyperparameters.
        return LossOutputs(total, jax.lax.stop_gradient(main))


class RTDETRTrainer(DetectionTrainer):
    task = "detect"

    def get_criterion(self, mh):
        return _DETRCriterion(mh.nc, self.args.imgsz)

    def get_loss_call(self):
        # RTDETRDecoder returns (tuple5, None): feed the tuple to the loss
        return lambda crit, out, batch, step: crit(out[0], batch, step)

    def get_model_kwargs_fn(self):
        """Thread denoising targets into the decoder head (train only)."""
        imgsz = float(self.args.imgsz)

        def fn(batch, step):
            import jax
            gt_norm = xyxy2xywh(batch["gt_bboxes"].astype(jnp.float32)) / imgsz
            dn = {"gt_labels": batch["gt_labels"], "gt_bboxes_norm": gt_norm,
                  "mask_gt": batch["mask_gt"], "key": jax.random.PRNGKey(0)}
            # fold the step into the noise key so each batch gets fresh noise
            dn["key"] = jax.random.fold_in(dn["key"], step)
            return {"head_kwargs": {"dn": dn}}
        return fn

    def get_dataset(self, train: bool = True):
        if train:  # reference disables mosaic for rt-detr (train.py:23-41)
            self.args.mosaic = 0.0
        return super().get_dataset(train)

    def validate(self, state):
        import jax
        from .val import RTDETRValidator
        validator = RTDETRValidator(args=self.args)
        variables = {"params": jax.device_get(state.ema_params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        return validator(self.model_holder, variables,
                         dataset=self.get_dataset(train=False))
