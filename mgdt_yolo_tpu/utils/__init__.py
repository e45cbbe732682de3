"""Core utilities: logging, config namespaces, YAML IO.

TPU-native rebuild of the reference's `yolo/utils/__init__.py` (see
/root/reference/yolo/utils/__init__.py:109-304 for the behaviors mirrored here:
SimpleClass / IterableSimpleNamespace semantics, yaml_load/yaml_save, LOGGER).
"""
from __future__ import annotations

import logging
import os
import re
import sys
from pathlib import Path
from types import SimpleNamespace

import yaml

# Repo root of the installed package
PKG_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_CFG_PATH = PKG_ROOT / "cfg" / "default.yaml"
NUM_THREADS = min(8, max(1, os.cpu_count() - 1))

LOGGING_NAME = "mgdt_yolo_tpu"


def set_logging(name: str = LOGGING_NAME, verbose: bool = True) -> logging.Logger:
    """Configure a stream logger for the framework."""
    level = logging.INFO if verbose else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging()


def colorstr(*input):
    """Colorize a string for terminal output, e.g. colorstr('blue', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
        "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


class SimpleClass:
    """Base class giving readable reprs and friendly attribute errors."""

    def __str__(self):
        attr = []
        skip = getattr(self, "_deprecated", ())  # alias properties log a
        for a in dir(self):                      # warning when read — don't
            if a in skip:                        # fire it from every repr()
                continue
            v = getattr(self, a)
            if not callable(v) and not a.startswith("_"):
                attr.append(f"{a}: {v.__class__.__module__}.{v.__class__.__name__} object")
        return f"{self.__module__}.{self.__class__.__name__} object with attributes:\n\n" + "\n".join(attr)

    def __repr__(self):
        return self.__str__()

    def __getattr__(self, attr):
        name = self.__class__.__name__
        raise AttributeError(f"'{name}' object has no attribute '{attr}'. See valid attributes below.\n{self.__doc__}")


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that iterates over (key, value) pairs and supports .get()."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def yaml_load(file, append_filename: bool = False) -> dict:
    """Load a YAML file to dict, sanitizing any non-printable characters."""
    with open(file, errors="ignore", encoding="utf-8") as f:
        s = f.read()
        if not s.isprintable():
            s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-퟿-�\U00010000-\U0010ffff]+", "", s)
        data = yaml.safe_load(s) or {}
        if append_filename:
            data["yaml_file"] = str(file)
        return data


def yaml_save(file, data: dict | None = None):
    """Save dict to a YAML file, creating parent directories as needed."""
    data = data or {}
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(data):
    """Pretty-print a YAML-able dict or namespace."""
    d = vars(data) if isinstance(data, SimpleNamespace) else data
    LOGGER.info(yaml.dump(d, sort_keys=False, allow_unicode=True))


DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG_KEYS = DEFAULT_CFG_DICT.keys()
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)

RANK = int(os.getenv("RANK", -1))

USER_CONFIG_DIR = Path(os.getenv("MGDT_CONFIG_DIR",
                                 Path.home() / ".config" / "mgdt_yolo_tpu"))
SETTINGS_YAML = USER_CONFIG_DIR / "settings.yaml"


def get_settings(file=None, version: str = "0.0.3") -> dict:
    """Persistent machine settings, created on first use (reference
    yolo/utils/__init__.py:686-735: datasets/weights/runs dirs + uuid;
    invalid or stale files reset to defaults).
    """
    import hashlib
    import uuid as uuid_mod
    file = Path(file) if file else SETTINGS_YAML
    root = Path.cwd()
    defaults = {
        "datasets_dir": str(root / "datasets"),
        "weights_dir": str(root / "weights"),
        "runs_dir": str(root / "runs"),
        "uuid": hashlib.sha256(str(uuid_mod.getnode()).encode()).hexdigest(),
        "sync": False,  # no telemetry in the zero-egress TPU build
        "api_key": "",
        "settings_version": version}
    if not file.exists():
        yaml_save(file, defaults)
        return defaults
    settings = yaml_load(file)
    # type-check BY KEY: zipping .values() pairs positionally, so a
    # hand-edited file with reordered keys would spuriously reset
    correct = (settings and settings.keys() == defaults.keys()
               and all(type(settings[k]) is type(defaults[k])
                       for k in defaults))
    if not correct:
        LOGGER.warning(f"settings reset to defaults — view/update with "
                       f"'yolo settings' or at '{file}'")
        settings = defaults
        yaml_save(file, settings)
    return settings


def set_settings(kwargs: dict, file=None):
    """Update and persist machine settings (reference set_settings)."""
    file = Path(file) if file else SETTINGS_YAML
    settings = get_settings(file)
    unknown = set(kwargs) - set(settings)
    if unknown:
        raise KeyError(f"unknown settings keys {sorted(unknown)}; "
                       f"valid keys: {sorted(settings)}")
    settings.update(kwargs)
    yaml_save(file, settings)
    return settings


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """Increment a path, e.g. runs/exp -> runs/exp2, runs/exp3, ..."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path
