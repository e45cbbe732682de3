"""SAM composite model + facade + automatic mask generation.

Reference vit/sam/{model,build,predict}.py + modules/{sam,mask_generator}.py:
`SAM('sam_b')` builds the ViT-B/L/H encoder (build.py:20-129 dims), and
calling it on an image runs prompt-based or automatic (point-grid) mask
generation. Inference-only, like the reference (predict.py:17-35 wraps
everything in SamAutomaticMaskGenerator, batch size 1).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils import LOGGER
from .modules import ImageEncoderViT, MaskDecoder, PromptEncoder

SAM_ARCHS = {
    # encoder_dim, depth, heads, global_attn_indexes
    "sam_b": (768, 12, 12, (2, 5, 8, 11)),
    "sam_l": (1024, 24, 16, (5, 11, 17, 23)),
    "sam_h": (1280, 32, 16, (7, 15, 23, 31)),
}


class Sam(nn.Module):
    """Composite image-encoder + prompt-encoder + mask-decoder
    (reference modules/sam.py:19-173)."""
    arch: str = "sam_b"
    img_size: int = 1024
    dtype: Any = jnp.float32
    pixel_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, ...] = (58.395, 57.12, 57.375)

    def setup(self):
        dim, depth, heads, gidx = SAM_ARCHS[self.arch]
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, embed_dim=dim, depth=depth, num_heads=heads,
            global_attn_indexes=gidx, dtype=self.dtype)
        emb = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=256, image_embedding_size=(emb, emb),
            input_image_size=(self.img_size, self.img_size), dtype=self.dtype)
        self.mask_decoder = MaskDecoder(transformer_dim=256, dtype=self.dtype)

    def preprocess(self, x):
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        return (x - mean) / std

    def encode_image(self, x):
        """x: (B, S, S, 3) raw 0-255 RGB -> (B, S/16, S/16, 256)."""
        return self.image_encoder(self.preprocess(x))

    def decode(self, image_embeddings, points, labels,
               multimask_output: bool = True):
        sparse, dense = self.prompt_encoder(points=points, labels=labels)
        image_pe = self.prompt_encoder.get_dense_pe()[None]
        return self.mask_decoder(image_embeddings, image_pe, sparse, dense,
                                 multimask_output)

    def __call__(self, x, points, labels):
        emb = self.encode_image(x)
        return self.decode(emb, points, labels)


class SAM:
    """SAM facade (reference vit/sam/model.py:13-59).

    SAM('sam_b')(image) -> automatic point-grid masks;
    .predict(image, points=..., labels=...) -> prompted masks.
    """

    def __init__(self, model: str = "sam_b", img_size: int = 1024,
                 dtype=jnp.float32, seed: int = 0, weights: Optional[str] = None):
        from pathlib import Path
        ckpt = None
        name = str(model)
        if name.endswith(".pt"):
            if not Path(name).is_file():
                # a silent random-weight fallback would "work" and generate
                # garbage masks; the reference's checkpoint load raises
                raise FileNotFoundError(f"SAM checkpoint {name!r} not found")
            ckpt = name  # reference usage: SAM('sam_b.pt') loads the ckpt
        arch = Path(name).stem.replace("-", "_")
        if arch not in SAM_ARCHS:
            raise ValueError(f"unknown SAM variant {model!r}; "
                             f"choose from {list(SAM_ARCHS)}")
        self.arch = arch
        self.img_size = img_size
        self.module = Sam(arch=arch, img_size=img_size, dtype=dtype)
        from ...nn.tasks import fast_init
        dummy_x = jnp.zeros((1, img_size, img_size, 3), dtype)
        dummy_p = jnp.zeros((1, 1, 2), jnp.float32)
        dummy_l = jnp.ones((1, 1), jnp.int32)
        self.variables = jax.device_get(fast_init_sam(
            self.module, jax.random.PRNGKey(seed), dummy_x, dummy_p, dummy_l))
        self._encode = jax.jit(lambda vs, x: self.module.apply(
            vs, x, method=Sam.encode_image))
        self._decode = jax.jit(lambda vs, emb, p, l: self.module.apply(
            vs, emb, p, l, method=Sam.decode))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.variables))
        LOGGER.info(f"SAM {arch}: {n:,} parameters @ {img_size}px")
        for w in (ckpt, weights):
            if w is not None:
                self.load(w)

    def load(self, weights) -> dict:
        """Import a torch SAM checkpoint (path to .pt, or a flat numpy
        state_dict) — reference build.py:105-129 loads the pickled
        state_dict into the torch modules; this maps it into the flax tree
        (vit/sam/weights.py)."""
        from ...utils.torch_import import load_torch_pt
        from .weights import load_sam_state_dict
        sd = weights
        if isinstance(sd, (str, bytes)) or hasattr(sd, "__fspath__"):
            sd, _ = load_torch_pt(str(sd))
        self.variables, report = load_sam_state_dict(self.variables, sd)
        return report

    # ---- prompted prediction --------------------------------------------
    def predict(self, image: np.ndarray, points=None, labels=None,
                multimask: bool = True):
        """image: HxWx3 BGR uint8. points in original pixels."""
        x, scale, (h0, w0) = self._prep(image)
        if points is None:  # center point default
            points = np.array([[[w0 / 2, h0 / 2]]], np.float32)
        if labels is None:  # foreground by default (points without labels
            labels = np.ones(np.shape(points)[:2], np.int32)  # is the
        pts = np.asarray(points, np.float32) * scale  # natural prompted call
        masks, iou = jax.device_get(self._decode(
            self.variables, self._encode(self.variables, x),
            jnp.asarray(pts), jnp.asarray(labels)))
        masks = self._postprocess_masks(masks, scale, (h0, w0))
        return masks, np.asarray(iou)

    def __call__(self, image: np.ndarray, points_per_side: int = 8,
                 pred_iou_thresh: float = 0.7):
        return self.generate(image, points_per_side, pred_iou_thresh)

    # ---- automatic mask generation --------------------------------------
    def generate(self, image: np.ndarray, points_per_side: int = 8,
                 pred_iou_thresh: float = 0.7, mask_threshold: float = 0.0,
                 stability_score_thresh: float = 0.0,
                 stability_score_offset: float = 1.0) -> List[Dict]:
        """Point-grid automatic mask generation with predicted-IoU and
        stability-score filtering (reference modules/mask_generator.py:23-353
        + amg.py; single-crop layer)."""
        from .amg import build_point_grid, calculate_stability_score
        x, scale, (h0, w0) = self._prep(image)
        emb = self._encode(self.variables, x)
        grid = build_point_grid(points_per_side)  # (N, 2) in [0,1]^2
        pts = (grid * np.array([w0, h0], np.float32))[:, None, :]  # (N, 1, 2)
        results = []
        B = pts.shape[0]
        emb_rep = jnp.broadcast_to(emb, (B, *emb.shape[1:]))
        masks, ious = jax.device_get(self._decode(
            self.variables, emb_rep, jnp.asarray(pts * scale, jnp.float32),
            jnp.ones((B, 1), jnp.int32)))
        masks = masks.reshape(-1, *masks.shape[2:])  # (N*3, h, w)
        ious = ious.reshape(-1)
        stability = calculate_stability_score(masks, mask_threshold,
                                              stability_score_offset)
        keep = (ious > pred_iou_thresh) & \
            (stability >= stability_score_thresh)
        masks, ious, stability = masks[keep], ious[keep], stability[keep]
        bin_masks = []
        for m, s, st in zip(masks, ious, stability):
            full = self._postprocess_masks(m[None, None], scale, (h0, w0))[0, 0]
            bm = full > mask_threshold
            if bm.sum() < 16:
                continue
            ys, xs = np.where(bm)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min()), int(ys.max() - ys.min())]
            bin_masks.append({"segmentation": bm, "area": int(bm.sum()),
                              "bbox": bbox, "predicted_iou": float(s),
                              "stability_score": float(st)})
        # dedup by mask-bbox NMS
        bin_masks.sort(key=lambda r: -r["predicted_iou"])
        kept: List[Dict] = []
        for r in bin_masks:
            dup = False
            for kr in kept:
                inter = np.logical_and(r["segmentation"], kr["segmentation"]).sum()
                union = np.logical_or(r["segmentation"], kr["segmentation"]).sum()
                if union and inter / union > 0.7:
                    dup = True
                    break
            if not dup:
                kept.append(r)
        return kept

    # ---- helpers ---------------------------------------------------------
    def _prep(self, image: np.ndarray):
        import cv2
        h0, w0 = image.shape[:2]
        scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        resized = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        # pad with the pixel MEAN: Sam.preprocess normalizes the whole
        # canvas, so mean-filled pads land at exactly 0 after (x-mean)/std —
        # the reference normalizes first and zero-pads after
        # (vit/sam/modules/sam.py:164-173); raw-zero pads would sit at
        # ~-2.1 sigma and leak into border windows of the ViT attention
        canvas = np.empty((self.img_size, self.img_size, 3), np.float32)
        canvas[:] = np.asarray(self.module.pixel_mean, np.float32)
        canvas[:nh, :nw] = resized
        return jnp.asarray(canvas[None]), scale, (h0, w0)

    def _postprocess_masks(self, masks, scale, orig_hw):
        """(B, N, h, w) low-res logits -> (B, N, H0, W0) in original pixels."""
        import cv2
        h0, w0 = orig_hw
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        out = np.zeros((masks.shape[0], masks.shape[1], h0, w0), np.float32)
        lowres = np.asarray(masks, np.float32)
        for b in range(masks.shape[0]):
            for n in range(masks.shape[1]):
                up = cv2.resize(lowres[b, n], (self.img_size, self.img_size),
                                interpolation=cv2.INTER_LINEAR)
                out[b, n] = cv2.resize(up[:nh, :nw], (w0, h0),
                                       interpolation=cv2.INTER_LINEAR)
        return out


def fast_init_sam(module: nn.Module, key, x, points, labels):
    """Shape-based param materialization for SAM (same scheme as
    nn.tasks.fast_init, with normal(0.02) for embeddings/tokens)."""
    import math

    shapes = jax.eval_shape(lambda k: module.init(k, x, points, labels), key)
    seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1))

    def materialize(path, sds):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dtype = sds.shape, sds.dtype
        pathstr = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        rng = np.random.default_rng((seed * 1000003 + hash(pathstr)) % (2 ** 63))
        if name == "kernel" and len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            bound = math.sqrt(1.0 / fan_in)  # torch kaiming_uniform_(a=sqrt(5))
            return rng.uniform(-bound, bound, shape).astype(dtype)
        if name in ("scale", "weight", "var"):
            return np.ones(shape, dtype)
        if "embed" in name or "token" in name or name == "pe_gaussian":
            return (rng.standard_normal(shape) *
                    (1.0 if name == "pe_gaussian" else 0.02)).astype(dtype)
        return np.zeros(shape, dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
