"""SAM torch-checkpoint import: official/naming-compatible state_dicts ->
this package's flax SAM tree (reference vit/sam/build.py:105-129 loads the
pickled state_dict; modules/{encoders,decoders,transformer}.py define the
names mapped here)."""
from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

from ...utils import LOGGER
from ...utils.torch_import import _conv_w, _convT_w, _linear_w

# mask-prompt downscaling tower: the mask-input prompt path is not built
# (points/boxes prompts only, like the fork's usage)
_SAM_SKIPS = (r"\bmask_downscaling\.", r"\.num_batches_tracked$")

# torch LayerNorm modules whose weight maps to flax 'scale'; SAM's custom
# LayerNorm2d keeps torch naming (weight/bias) in our modules
_LN_SCALE = ("norm1", "norm2", "norm3", "norm4", "norm_final")
_LN2D = ("neck_ln1", "neck_ln2", "upscale_ln")


def translate_sam_key(tkey: str):
    """Map one torch SAM state_dict key to (flax_path, transform_kind)."""
    for pat in _SAM_SKIPS:
        if re.search(pat, tkey):
            return None
    k = tkey
    k = re.sub(r"\bblocks\.(\d+)\.", r"blocks_\1.", k)
    k = re.sub(r"\blayers\.(\d+)\.", r"layers_\1.", k)  # TwoWay layers
    k = k.replace("patch_embed.proj.", "patch_embed.")
    k = k.replace("pe_layer.positional_encoding_gaussian_matrix", "pe_gaussian")
    k = re.sub(r"point_embeddings\.(\d+)\.weight", r"point_embed_\1", k)
    k = k.replace("not_a_point_embed.weight", "not_a_point_embed")
    k = k.replace("no_mask_embed.weight", "no_mask_embed")
    k = k.replace("iou_token.weight", "iou_token")
    k = k.replace("mask_tokens.weight", "mask_tokens")
    k = k.replace("neck.0.", "neck_conv1.")
    k = k.replace("neck.1.", "neck_ln1.")
    k = k.replace("neck.2.", "neck_conv2.")
    k = k.replace("neck.3.", "neck_ln2.")
    k = k.replace("mlp.lin1.", "mlp_lin1.")
    k = k.replace("mlp.lin2.", "mlp_lin2.")
    k = k.replace("cross_attn_token_to_image.", "cross_attn_t2i.")
    k = k.replace("cross_attn_image_to_token.", "cross_attn_i2t.")
    k = k.replace("final_attn_token_to_image.", "final_attn.")
    k = k.replace("norm_final_attn.", "norm_final.")
    k = k.replace("output_upscaling.0.", "upscale_conv1.")
    k = k.replace("output_upscaling.1.", "upscale_ln.")
    k = k.replace("output_upscaling.3.", "upscale_conv2.")
    # MLP towers: last layer -> *_out, earlier -> *_linN (iou depth 3,
    # hypernetwork depth 3 — decoders.py:52-55)
    k = re.sub(r"output_hypernetworks_mlps\.(\d+)\.layers_2\.",
               r"hyper_\1_out.", k)
    k = re.sub(r"output_hypernetworks_mlps\.(\d+)\.layers_(\d)\.",
               r"hyper_\1_lin\2.", k)
    k = re.sub(r"iou_prediction_head\.layers_2\.", "iou_head_out.", k)
    k = re.sub(r"iou_prediction_head\.layers_(\d)\.", r"iou_head_\1.", k)

    parts = k.split(".")
    leaf = parts[-1]
    base = tuple(parts[:-1])
    if leaf in ("pos_embed", "rel_pos_h", "rel_pos_w", "pe_gaussian",
                "not_a_point_embed", "no_mask_embed", "iou_token",
                "mask_tokens") or leaf.startswith("point_embed_"):
        return tuple(parts), "direct"
    mod = parts[-2] if len(parts) >= 2 else ""
    if leaf == "weight":
        if mod in _LN2D:
            return base + ("weight",), "direct"
        if mod in _LN_SCALE:
            return base + ("scale",), "direct"
        if mod.startswith("upscale_conv"):
            return base + ("kernel",), "convT"
        if mod in ("patch_embed", "neck_conv1", "neck_conv2"):
            return base + ("kernel",), "conv"
        return base + ("kernel",), "linear"  # Dense
    if leaf == "bias":
        return base + ("bias",), "direct"
    return None


_TF = {"direct": lambda a: a, "linear": _linear_w, "conv": _conv_w,
       "convT": _convT_w}


def load_sam_state_dict(variables: Dict, state_dict: Mapping[str, np.ndarray],
                        verbose: bool = True) -> Tuple[Dict, Dict]:
    """Non-strict merge of a torch SAM state_dict into the flax tree."""
    import copy
    out = copy.deepcopy(variables)
    matched, shape_miss, name_miss = [], [], []

    def _get(tree, path):
        for p in path:
            if not isinstance(tree, dict) or p not in tree:
                return None
            tree = tree[p]
        return tree

    def _set(tree, path, value):
        for p in path[:-1]:
            tree = tree.setdefault(p, {})
        tree[path[-1]] = value

    params = out.get("params", out)
    for tkey, arr in state_dict.items():
        arr = np.asarray(arr)
        tr = translate_sam_key(tkey)
        if tr is None:
            continue
        path, kind = tr
        val = _TF[kind](arr)
        dst = _get(params, path)
        if dst is None:
            name_miss.append(tkey)
            continue
        if tuple(np.shape(dst)) != tuple(val.shape):
            # embeddings stored (1, D) in torch vs (1, D) here; squeeze cases
            if val.ndim == np.ndim(dst) + 1 and val.shape[0] == 1:
                val = val[0]
            if tuple(np.shape(dst)) != tuple(val.shape):
                shape_miss.append((tkey, tuple(val.shape), tuple(np.shape(dst))))
                continue
        _set(params, path, val.astype(np.asarray(dst).dtype))
        matched.append(tkey)
    report = {"matched": len(matched), "shape_missed": shape_miss,
              "name_missed": name_miss}
    if verbose:
        LOGGER.info(f"SAM import: {len(matched)} matched, "
                    f"{len(shape_miss)} shape-missed, {len(name_miss)} "
                    f"name-missed")
        for k in name_miss[:10]:
            LOGGER.info(f"  unmatched: {k}")
    return out, report
