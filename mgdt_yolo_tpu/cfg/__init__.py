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


CLI_HELP_MSG = f"""usage: yolo TASK MODE key=value ...

    TASK (optional): one of {TASKS}
    MODE (required): one of {MODES}
    key=value: any config override, e.g. imgsz=320 model=yolov8n.yaml

    Special commands:
        yolo help               show this message
        yolo checks             environment / device report
        yolo version            package version
        yolo settings           show persistent settings (reset | k=v to edit)
        yolo cfg                print the default config
        yolo copy-cfg           copy default.yaml here for customizing
"""


def merge_equals_args(args):
    """Merge fragments around isolated '=' signs (reference cfg utils):
    ['imgsz', '=', '640'], ['imgsz=', '640'], ['imgsz', '=640'] all become
    ['imgsz=640']."""
    merged = []
    for a in args:
        if a == "=" and merged:
            merged[-1] += "="
        elif a.startswith("=") and merged:
            merged[-1] += a
        elif merged and merged[-1].endswith("="):
            merged[-1] += a
        else:
            merged.append(a)
    return merged


def handle_yolo_settings(args) -> None:
    """`yolo settings [reset | key=value ...]` (reference
    cfg/__init__.py:239-257 + yolo/utils get_settings/set_settings)."""
    from ..utils import SETTINGS_YAML, get_settings, set_settings, yaml_print
    if args and args[0] == "reset":
        Path(SETTINGS_YAML).unlink(missing_ok=True)
        settings = get_settings()
        LOGGER.info("settings reset to defaults")
    elif args:
        kv = {}
        for a in merge_equals_args(args):
            if "=" not in a:
                raise SyntaxError(
                    f"settings argument {a!r} needs 'key=value' form, e.g. "
                    f"'yolo settings {a}=/path' ('yolo settings' alone prints "
                    f"current values, 'yolo settings reset' restores defaults)")
            k, v = a.split("=", 1)
            # smart-value coercion like the main k=v parser (reference
            # smart_value): lowercase true/false/none must not persist as
            # truthy strings in settings.yaml
            low = v.lower()
            if low in ("true", "false"):
                v = low == "true"
            elif low in ("none", "null"):
                v = None
            else:
                with contextlib.suppress(ValueError, SyntaxError):
                    import ast
                    v = ast.literal_eval(v)
            kv[k] = v
        settings = set_settings(kv)
    else:
        settings = get_settings()
    yaml_print(settings)


def copy_default_cfg() -> Path:
    """Copy default.yaml to CWD as default_copy.yaml (reference
    cfg/__init__.py:409-414)."""
    import shutil

    from ..utils import DEFAULT_CFG_PATH
    new_file = Path.cwd() / Path(DEFAULT_CFG_PATH).name.replace(
        ".yaml", "_copy.yaml")
    shutil.copy2(DEFAULT_CFG_PATH, new_file)
    LOGGER.info(f"{DEFAULT_CFG_PATH} copied to {new_file} — use with "
                f"'yolo cfg={new_file} imgsz=320'")
    return new_file


def entrypoint(argv=None):
    """CLI entry: ``yolo TASK MODE k=v ...`` plus the special commands
    (reference yolo/cfg/__init__.py:260-339)."""
    import sys
    args = list(argv if argv is not None else sys.argv[1:])
    if not args:
        LOGGER.info(CLI_HELP_MSG)
        return

    from .. import __version__
    from ..utils import DEFAULT_CFG_DICT as _DCD
    from ..utils import yaml_print
    from ..utils.checks import check_yolo
    special = {
        "help": lambda: LOGGER.info(CLI_HELP_MSG),
        "checks": check_yolo,
        "version": lambda: LOGGER.info(__version__),
        "settings": lambda: handle_yolo_settings(args[1:]),
        "cfg": lambda: yaml_print(_DCD),
        "copy-cfg": copy_default_cfg}
    full_args_dict = {**_DCD, **{k: None for k in TASKS},
                      **{k: None for k in MODES}, **special}
    # singular and dashed aliases: -h, --help, check, setting, ...
    special.update({k[0]: v for k, v in special.items()})
    special.update({k[:-1]: v for k, v in special.items()
                    if len(k) > 1 and k.endswith("s")})
    special = {**special, **{f"-{k}": v for k, v in special.items()},
               **{f"--{k}": v for k, v in special.items()}}

    overrides = {}
    task = mode = None
    for a in merge_equals_args(args):
        if a.startswith("--"):
            LOGGER.warning(f"'{a}' does not need leading dashes, "
                           f"using '{a[2:]}'")
            a = a[2:]
        if a.endswith(","):
            a = a[:-1]
        if "=" in a:
            k, v = a.split("=", 1)
            if not v:
                raise SyntaxError(f"missing value for '{k}='")
            if k == "cfg":  # custom yaml replaces the override set
                LOGGER.info(f"overriding defaults with {v}")
                overrides.update({kk: vv for kk, vv in yaml_load(v).items()
                                  if kk != "cfg"})
                continue
            if isinstance(v, str):
                low = v.lower()
                if low == "none":
                    v = None
                elif low == "true":
                    v = True
                elif low == "false":
                    v = False
                else:
                    with contextlib.suppress(ValueError, SyntaxError):
                        import ast
                        v = ast.literal_eval(v)
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a.lower() in special:
            special[a.lower()]()
            return
        elif a in _DCD and isinstance(_DCD[a], bool):
            overrides[a] = True  # bare bool key: 'yolo show' -> show=True
        elif a in _DCD:
            raise SyntaxError(
                f"'{a}' is a valid key but needs an '=' sign, "
                f"e.g. '{a}={_DCD[a]}'")
        else:
            check_dict_alignment(full_args_dict, {a: ""})
    check_dict_alignment(full_args_dict, {k: v for k, v in overrides.items()
                                          if k not in ("save_dir",)})

    mode = mode or overrides.pop("mode", "predict")
    if task:
        overrides["task"] = task
    from ..engine.model import YOLO
    model = YOLO(overrides.pop("model", None) or "yolov8n.yaml")
    if mode in ("predict", "track") and "source" not in overrides:
        # reference substitutes a default asset with a warning
        # (cfg/__init__.py:330-333) rather than raising TypeError
        import numpy as np
        LOGGER.warning(f"'source' is missing — using a synthetic gray "
                       f"image for {mode} (pass source=path)")
        overrides["source"] = np.full((640, 640, 3), 114, np.uint8)
    if mode == "benchmark":
        # benchmark() has a fixed signature (imgsz/batch/data/formats);
        # cfg-wide keys like task/half/conf would TypeError
        allowed = {"imgsz", "batch", "data", "formats"}
        overrides = {k: v for k, v in overrides.items() if k in allowed}
    out = getattr(model, mode)(**overrides)
    if mode == "predict" and isinstance(out, list):
        for r in out:
            LOGGER.info(f"{r.path}: {len(r)} detections {r.counts()} "
                        f"({r.speed['inference']:.1f} ms inference)")
    elif isinstance(out, dict):
        LOGGER.info(str(out))
    return out
