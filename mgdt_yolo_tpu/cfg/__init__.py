"""Config system: typed flat-namespace configuration with override cascade.

Mirrors the behavior of the reference `yolo/cfg/__init__.py:67-185` (typed
validation buckets, cascade default < ckpt train_args < overrides) with the
same key surface, re-implemented for the TPU stack.
"""
from __future__ import annotations

import contextlib
from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Union

from ..utils import (DEFAULT_CFG_DICT, DEFAULT_CFG_KEYS, IterableSimpleNamespace, LOGGER,
                     colorstr, yaml_load)

# Typed validation buckets (same partitioning as reference yolo/cfg/__init__.py:67-76)
CFG_FLOAT_KEYS = ("warmup_epochs", "box", "cls", "dfl", "degrees", "shear")
CFG_FRACTION_KEYS = (
    "dropout", "iou", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum",
    "warmup_bias_lr", "label_smoothing", "hsv_h", "hsv_s", "hsv_v", "translate",
    "scale", "perspective", "flipud", "fliplr", "mosaic", "mosaic9", "mixup",
    "copy_paste", "conf", "fraction")
CFG_INT_KEYS = ("epochs", "patience", "batch", "workers", "seed", "close_mosaic",
                "mask_ratio", "max_det", "vid_stride", "line_width", "workspace",
                "nbs", "save_period")
CFG_BOOL_KEYS = (
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "overlap_mask", "val", "save_json", "save_hybrid", "half", "dnn", "plots", "show",
    "save_txt", "save_conf", "save_crop", "show_labels", "show_conf", "visualize",
    "augment", "device_augment", "agnostic_nms", "retina_masks", "boxes", "keras", "optimize", "int8",
    "dynamic", "simplify", "nms", "profile", "v5loader")

TASKS = ("detect", "segment", "classify", "pose")
MODES = ("train", "val", "predict", "export", "track", "benchmark")


def cfg2dict(cfg: Union[str, Path, Dict, SimpleNamespace]) -> Dict:
    """Convert any accepted config carrier into a plain dict."""
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    return cfg


def check_cfg_types(cfg: Dict) -> None:
    """Validate and coerce config value types in place."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            raise TypeError(f"'{k}={v}' must be a number (got {type(v).__name__})")
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                raise TypeError(f"'{k}={v}' must be a number (got {type(v).__name__})")
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            raise TypeError(f"'{k}={v}' must be an int (got {type(v).__name__})")
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            raise TypeError(f"'{k}={v}' must be a bool (got {type(v).__name__})")


def check_dict_alignment(base: Dict, custom: Dict):
    """Raise with fuzzy-match suggestions when an override key is unknown."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        import difflib
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, list(base))
            hint = f"Similar keys: {matches}. " if matches else ""
            msgs.append(f"'{k}' is not a valid config key. {hint}")
        raise SyntaxError("\n".join(msgs))


def get_cfg(cfg: Union[str, Path, Dict, SimpleNamespace] = None,
            overrides: Dict = None) -> IterableSimpleNamespace:
    """Load and merge configuration, returning a validated namespace.

    Cascade: package default.yaml < cfg < overrides (reference model.py:358-363).
    """
    cfg = cfg2dict(cfg) if cfg is not None else dict(DEFAULT_CFG_DICT)
    merged = dict(DEFAULT_CFG_DICT)
    merged.update({k: v for k, v in cfg.items() if k in DEFAULT_CFG_KEYS or k in ("save_dir",)})
    if overrides:
        overrides = cfg2dict(overrides)
        check_dict_alignment(dict(merged, save_dir=None), overrides)
        merged.update(overrides)
    # numeric-string and name coercions
    for k in ("project", "name"):
        if k in merged and isinstance(merged[k], (int, float)):
            merged[k] = str(merged[k])
    check_cfg_types(merged)
    return IterableSimpleNamespace(**merged)


def entrypoint(argv=None):
    """CLI entry: ``yolo TASK MODE k=v ...`` — minimal parity CLI."""
    import sys
    args = list(argv if argv is not None else sys.argv[1:])
    if not args:
        LOGGER.info("usage: yolo TASK MODE key=value ...")
        return
    overrides = {}
    task = mode = None
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            with contextlib.suppress(ValueError, SyntaxError):
                import ast
                v = ast.literal_eval(v)
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            LOGGER.warning(f"{colorstr('yellow', 'WARNING')} ignoring unrecognized argument {a!r}")
    mode = mode or overrides.pop("mode", "predict")
    if task:
        overrides["task"] = task
    from ..engine.model import YOLO
    model = YOLO(overrides.pop("model", None) or "yolov8n.yaml")
    out = getattr(model, mode)(**overrides)
    if mode == "predict" and isinstance(out, list):
        for r in out:
            LOGGER.info(f"{r.path}: {len(r)} detections {r.counts()} "
                        f"({r.speed['inference']:.1f} ms inference)")
    elif isinstance(out, dict):
        LOGGER.info(str(out))
    return out
