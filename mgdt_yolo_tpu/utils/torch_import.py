"""Torch checkpoint import: reference state_dict names -> flax variable tree.

Re-implements the reference's transfer-learning loader (`intersect_dicts` +
non-strict load, nn/tasks.py:190-202, 577-601) for the TPU stack: a torch
state_dict (flat name -> numpy array, OIHW/out-in conventions) is translated
into this framework's flax params/batch_stats tree (HWIO/in-out). Unmatched
keys are collected, not fatal — warm-starting MGDT variants from yolov8n
checkpoints relies on that.

Pure numpy; no torch dependency (state_dicts arrive as numpy mappings, e.g.
via the pickle-walking extractor in `load_torch_pt`).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

from . import LOGGER


def _conv_w(a: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO (works for depthwise too)."""
    return np.transpose(a, (2, 3, 1, 0))


def _linear_w(a: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense (in, out)."""
    return np.transpose(a, (1, 0))


def _convT_w(a: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out) with SPATIALLY FLIPPED taps: flax's fractionally-
    strided formulation correlates where torch's deconv convolves
    (verified numerically against nn.ConvTranspose2d)."""
    return np.transpose(a, (2, 3, 0, 1))[::-1, ::-1].copy()


# leaf-name mapping inside a Conv(+BN) block
_CONV_LEAVES = {
    "conv.weight": (("conv", "kernel"), _conv_w, "params"),
    "conv.bias": (("conv", "bias"), None, "params"),
    "bn.weight": (("norm", "bn", "scale"), None, "params"),
    "bn.bias": (("norm", "bn", "bias"), None, "params"),
    "bn.running_mean": (("norm", "bn", "mean"), None, "batch_stats"),
    "bn.running_var": (("norm", "bn", "var"), None, "batch_stats"),
}

_SKIP_PATTERNS = (
    r"\.dfl\.conv\.weight$",        # deterministic arange projection
    r"\.num_batches_tracked$",
    r"\.scale\.\d+\.scale$",        # TOODHead unused Scale modules
    r"^model\.\d+\.anchors$",
    r"^model\.\d+\.strides$",
)


def translate_key(tkey: str) -> Tuple[Tuple[str, ...], object, str] | None:
    """Map one torch state_dict key to (flax_path, transform, collection).

    Returns None for keys that are intentionally skipped.
    """
    for pat in _SKIP_PATTERNS:
        if re.search(pat, tkey):
            return None
    k = tkey
    # 'model.12.' -> 'model_12.'
    k = re.sub(r"^model\.(\d+)\.", r"model_\1.", k)
    # indexed module lists -> underscore names
    k = re.sub(r"\b(cv2|cv3|cv4)\.(\d+)\.(\d+)\.", r"\1_\2_\3.", k)   # head towers
    k = re.sub(r"\b(cv2|cv3|cv4)\.(\d+)\.(\d+)$", r"\1_\2_\3", k)
    k = re.sub(r"\bm\.(\d+)\.", r"m_\1.", k)                           # CSP bottlenecks
    k = re.sub(r"\btr\.(\d+)\.", r"tr_\1.", k)                         # TransformerBlock layers
    # ---- RT-DETR decoder head (reference head.py:275-464) ----
    k = re.sub(r"\bdecoder\.layers\.(\d+)\.", r"decoder_layer_\1.", k)
    k = re.sub(r"\binput_proj\.(\d+)\.0\.", r"input_proj_\1.", k)      # 1x1 conv
    m_ipbn = re.search(r"\binput_proj\.(\d+)\.1\.(\w+)$", k)
    if m_ipbn:  # input_proj BatchNorm (Sequential slot 1)
        base = tuple(k[:m_ipbn.start()].rstrip(".").split(".")) if \
            m_ipbn.start() else ()
        base = base + (f"input_proj_bn_{m_ipbn.group(1)}", "bn")
        leaf = m_ipbn.group(2)
        lut = {"weight": ("scale", "params"), "bias": ("bias", "params"),
               "running_mean": ("mean", "batch_stats"),
               "running_var": ("var", "batch_stats")}
        if leaf in lut:
            nm_, coll_ = lut[leaf]
            return base + (nm_,), None, coll_
        return None
    k = re.sub(r"\b(dec_bbox_head|dec_score_head)\.(\d+)\.", r"\1_\2.", k)
    k = re.sub(r"\blayers\.(\d+)\.", r"layers_\1.", k)                 # MLP towers
    k = k.replace("enc_output.0.", "enc_output_dense.")
    k = k.replace("enc_output.1.", "enc_output_norm.")
    if k.endswith("denoising_class_embed.weight"):
        return tuple(k.split(".")[:-1]), None, "params"
    if k.endswith("tgt_embed.weight"):
        return tuple(k.split(".")[:-1]), None, "params"
    k = re.sub(r"\bconvs\.(\d+)\.", r"convs_\1.", k)                   # MSPA convs
    k = re.sub(r"\bbottleneck\.(\d+)\.", r"bottleneck_\1.", k)         # MSPA bottlenecks
    k = re.sub(r"\bshare_conv\.(\d+)\.", r"share_conv_\1.", k)         # TOOD tower
    # IFM sequential: conv.0 -> conv_in, conv.{1..n} -> block_{i-1}, last -> conv_out
    m = re.search(r"\bconv\.(\d+)\.", k)
    if m and ("block_" not in k):
        # determine arity lazily: conv.0 => conv_in; conv.4 => conv_out for
        # fuse_block_num=3; treat indices 1..3 as blocks, 4 as out
        idx = int(m.group(1))
        if idx == 0:
            k = k.replace(f"conv.{idx}.", "conv_in.", 1)
        elif idx == 4:
            k = k.replace(f"conv.{idx}.", "conv_out.", 1)
        else:
            k = k.replace(f"conv.{idx}.", f"block_{idx - 1}.", 1)

    parts = k.split(".")
    # ---- leaf handling ----
    tail2 = ".".join(parts[-2:])
    head = parts[:-2]

    # ConvTranspose2d weights need the IOHW->HWIO + spatial-flip mapping
    # (Proto.upsample, ConvTranspose.conv_transpose)
    if tail2 in ("upsample.weight", "conv_transpose.weight"):
        return tuple(head) + (parts[-2], "kernel"), _convT_w, "params"
    if tail2 in ("upsample.bias", "conv_transpose.bias"):
        return tuple(head) + (parts[-2], "bias"), None, "params"
    # bare nn.ConvTranspose2d graph layer (v6 head): model.11.weight/bias
    if re.fullmatch(r"model_\d+\.(weight|bias)", k):
        leaf = parts[-1]
        if leaf == "weight":
            return (parts[0], "conv_transpose", "kernel"), _convT_w, "params"
        return (parts[0], "conv_transpose", "bias"), None, "params"

    # TaskDecomposition reduction conv
    if "reduction_conv" in parts:
        i = parts.index("reduction_conv")
        base = tuple(parts[:i])
        if tail2 == "conv.weight":
            return base + ("reduction_weight",), lambda a: np.transpose(a, (2, 3, 1, 0)), "params"
        if tail2 == "conv.bias":
            return base + ("reduction_bias",), None, "params"

    # DyDCNv2: conv.weight -> weight (HWIO); norm -> gn
    if "DyDCNV2" in parts or "DyDCNv2" in parts:
        i = [p for p in ("DyDCNV2", "DyDCNv2") if p in parts][0]
        base = tuple(parts[:parts.index(i) + 1])
        if tail2 == "conv.weight":
            return base + ("weight",), _conv_w, "params"
        if tail2 == "conv.bias":
            return base + ("bias",), None, "params"
        if tail2 == "norm.weight":
            return base + ("gn", "scale"), None, "params"
        if tail2 == "norm.bias":
            return base + ("gn", "bias"), None, "params"

    # ConvNeXtV2 internals
    if any(p.startswith("block_") for p in parts) or "grn" in parts:
        base = tuple(parts[:-2])
        leaf = parts[-1]
        mod = parts[-2]
        if mod == "dwconv":
            return base + ("dwconv", "kernel" if leaf == "weight" else "bias"), \
                (_conv_w if leaf == "weight" else None), "params"
        if mod == "norm":
            return base + ("norm", "scale" if leaf == "weight" else "bias"), None, "params"
        if mod in ("pwconv1", "pwconv2"):
            return base + (mod, "kernel" if leaf == "weight" else "bias"), \
                (_linear_w if leaf == "weight" else None), "params"
        if mod == "grn":
            return base + ("grn", leaf), None, "params"

    # RepVGGBlock identity branch: a bare BatchNorm2d (rep_vgg_block.py:168)
    if "rbr_identity" in parts:
        i = parts.index("rbr_identity")
        base = tuple(parts[:i + 1])
        leaf = parts[-1]
        mapping = {"weight": ("bn", "scale"), "bias": ("bn", "bias"),
                   "running_mean": ("bn", "mean"), "running_var": ("bn", "var")}
        if leaf in mapping:
            coll = "batch_stats" if leaf.startswith("running") else "params"
            return base + mapping[leaf], None, coll

    # Conv(+BN) leaves
    if tail2 in _CONV_LEAVES:
        path, tf, coll = _CONV_LEAVES[tail2]
        return tuple(head) + path, tf, coll

    # GroupNorm blocks (Conv_GN)
    if tail2 in ("gn.weight", "gn.bias"):
        return tuple(head) + ("gn", "scale" if parts[-1] == "weight" else "bias"), None, "params"

    # plain nn.LayerNorm leaves (RT-DETR decoder norm1..3, AIFI norms,
    # enc_output_norm): weight -> flax 'scale'
    if len(parts) >= 2 and parts[-1] in ("weight", "bias") and (
            re.fullmatch(r"norm\d+", parts[-2]) or
            parts[-2] == "enc_output_norm"):
        leaf = "scale" if parts[-1] == "weight" else "bias"
        return tuple(parts[:-1]) + (leaf,), None, "params"

    # plain conv2d / linear leaves (head 1x1s, SPR fc, la_conv, offset convs)
    leaf = parts[-1]
    base = tuple(parts[:-1])
    if leaf == "weight":
        return base + ("kernel",), lambda a: _conv_w(a) if a.ndim == 4 else _linear_w(a), "params"
    if leaf == "bias":
        return base + ("bias",), None, "params"
    return None


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


def load_torch_state_dict(variables: Dict, state_dict: Mapping[str, np.ndarray],
                          verbose: bool = True) -> Tuple[Dict, Dict]:
    """Non-strict merge of a torch state_dict into a flax variables tree.

    Returns (new_variables, report) where report counts matched / shape-missed
    / name-missed keys (the intersect_dicts semantics of tasks.py:190-202).
    """
    import copy
    out = copy.deepcopy(variables)
    matched, shape_miss, name_miss = [], [], []
    for tkey, arr in state_dict.items():
        arr = np.asarray(arr)
        # torch nn.MultiheadAttention packs qkv into in_proj_*: split thirds
        # into our q_proj/k_proj/v_proj Dense params
        if tkey.endswith(("in_proj_weight", "in_proj_bias")):
            base = tkey.rsplit(".", 1)[0]
            anchor = translate_key(base + ".out_proj.weight")
            if anchor is not None:
                ma_path = anchor[0][:-2]
                third = arr.shape[0] // 3
                is_w = tkey.endswith("weight")
                ok_all = True
                for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
                    part = arr[i * third:(i + 1) * third]
                    val = _linear_w(part) if is_w else part
                    leaf = "kernel" if is_w else "bias"
                    dst = _get(out.get("params", {}), ma_path + (nm, leaf))
                    if dst is None or tuple(np.shape(dst)) != tuple(val.shape):
                        ok_all = False
                        break
                    _set(out["params"], ma_path + (nm, leaf),
                         val.astype(np.asarray(dst).dtype))
                if ok_all:
                    matched.append(tkey)
                else:
                    name_miss.append(tkey)
                continue
        tr = translate_key(tkey)
        if tr is None:
            continue
        path, tf, coll = tr
        dst = _get(out.get(coll, {}), path)
        if dst is None and path and path[0].startswith("model_"):
            # Segment/Pose heads nest their Detect tower under 'detect'
            # (head.py Segment/Pose contain a Detect flax submodule), while
            # the torch modules inherit Detect flat — retry one level down.
            alt = (path[0], "detect") + path[1:]
            alt_dst = _get(out.get(coll, {}), alt)
            if alt_dst is not None:
                path, dst = alt, alt_dst
        if dst is None:
            # n>1 repeat blocks: reference nn.Sequential child 'model.2.R.*'
            # -> our 'model_2' (R=0) / 'model_2_repR' (R>0)
            m_rep = re.match(r"^model\.(\d+)\.(\d+)\.(.*)$", tkey)
            if m_rep:
                n_, r_, rest = m_rep.group(1), int(m_rep.group(2)), m_rep.group(3)
                alt_tr = translate_key(f"model.{n_}.{rest}")
                if alt_tr is not None:
                    alt_path, tf, coll = alt_tr
                    if r_ > 0:
                        alt_path = (f"model_{n_}_rep{r_}",) + alt_path[1:]
                    alt_dst = _get(out.get(coll, {}), alt_path)
                    if alt_dst is not None:
                        path, dst = alt_path, alt_dst
        if dst is None:
            name_miss.append(tkey)
            continue
        val = tf(arr) if tf else arr
        if tuple(np.shape(dst)) != tuple(val.shape):
            # 4D mismatch fallback: a ConvTranspose2d weight reached the
            # generic conv rule (torch layout (in, out, kh, kw), needs the
            # transpose+flip mapping) — e.g. grouped DWConvTranspose2d
            if arr.ndim == 4 and tuple(np.shape(dst)) == tuple(
                    _convT_w(arr).shape):
                val = _convT_w(arr)
            else:
                shape_miss.append((tkey, tuple(val.shape), tuple(np.shape(dst))))
                continue
        _set(out[coll], path, val.astype(np.asarray(dst).dtype
                                         if hasattr(dst, "dtype") else np.float32))
        matched.append(tkey)
    report = {"matched": len(matched), "shape_missed": shape_miss,
              "name_missed": name_miss}
    if verbose:
        LOGGER.info(f"torch import: {len(matched)} matched, "
                    f"{len(shape_miss)} shape-missed, {len(name_miss)} name-missed")
        for k in name_miss[:10]:
            LOGGER.info(f"  unmatched: {k}")
    return out, report


def load_torch_pt(path: str):
    """Extract a flat name->numpy state dict from a torch .pt checkpoint.

    Reference checkpoints pickle whole nn.Module graphs (trainer.py:411-436),
    whose classes (ultralytics fork, mmcv) aren't importable here. We unpickle
    with a forgiving Unpickler that synthesizes placeholder classes for any
    missing module type, then walk `_parameters`/`_buffers`/`_modules` to
    recover the flat state dict (EMA preferred, like tasks.py:581).

    Returns (state_dict, train_args).
    """
    import io
    import pickle

    import torch

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)

    class _ForgivingUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    def _pickle_load(f, **kw):
        return _ForgivingUnpickler(f, **{k: v for k, v in kw.items()
                                         if k in ("fix_imports", "encoding", "errors")}).load()

    pickle_shim = type("shim", (), {"Unpickler": _ForgivingUnpickler,
                                    "load": staticmethod(_pickle_load)})
    ckpt = torch.load(path, map_location="cpu", pickle_module=pickle_shim,
                      weights_only=False)

    model_obj = None
    train_args = {}
    if isinstance(ckpt, dict):
        model_obj = ckpt.get("ema") or ckpt.get("model") or ckpt
        train_args = dict(ckpt.get("train_args") or {})
    else:
        model_obj = ckpt

    flat: Dict[str, np.ndarray] = {}

    def walk(obj, prefix=""):
        d = getattr(obj, "__dict__", None)
        if d is None:
            return
        for coll in ("_parameters", "_buffers"):
            for k, v in (d.get(coll) or {}).items():
                if v is not None and hasattr(v, "numpy"):
                    flat[prefix + k] = v.detach().float().numpy() \
                        if hasattr(v, "detach") else np.asarray(v)
        for k, child in (d.get("_modules") or {}).items():
            if child is not None:
                walk(child, prefix + k + ".")

    if hasattr(model_obj, "state_dict") and not isinstance(model_obj, dict) \
            and callable(getattr(model_obj, "state_dict", None)) \
            and not isinstance(getattr(model_obj, "state_dict"), dict):
        try:
            flat = {k: v.detach().float().numpy()
                    for k, v in model_obj.state_dict().items()}
        except Exception:
            walk(model_obj)
    elif isinstance(model_obj, dict):  # already a state dict
        flat = {k: np.asarray(v.float() if hasattr(v, "float") else v)
                for k, v in model_obj.items() if hasattr(v, "shape")}
    else:
        walk(model_obj)
    return flat, train_args
