"""Runtime self-checks (reference yolo/utils/checks.py, TPU-shaped).

No auto-pip-install (this environment is hermetic — the reference's
check_requirements auto-installer at checks.py:200-252 is intentionally a
no-op check here), no AMP GradScaler probe (bf16 needs none); what remains:
imgsz validation, version parsing, bf16 numerics sanity (the TPU analog of
check_amp at checks.py:350-397).
"""
from __future__ import annotations

import re
from typing import List, Union

from . import LOGGER


def parse_version(v: str) -> tuple:
    return tuple(int(x) for x in re.findall(r"\d+", str(v))[:3] or [0])


def check_version(current: str, minimum: str, name: str = "version",
                  hard: bool = False) -> bool:
    ok = parse_version(current) >= parse_version(minimum)
    if not ok:
        msg = f"{name} {minimum} required, found {current}"
        if hard:
            raise AssertionError(msg)
        LOGGER.warning(f"WARNING {msg}")
    return ok


def check_imgsz(imgsz: Union[int, List[int]], stride: int = 32,
                min_dim: int = 1, floor: int = 0) -> Union[int, List[int]]:
    """Round image size up to a stride multiple (reference checks.py:48-95)."""
    stride = int(stride)
    sizes = [imgsz] if isinstance(imgsz, int) else list(imgsz)
    new = [max(int(-(-x // stride) * stride), floor) for x in sizes]
    if new != sizes:
        LOGGER.warning(f"WARNING imgsz {sizes} not multiple of stride {stride}, "
                       f"updated to {new}")
    return new[0] if isinstance(imgsz, int) else new


def check_suffix(file: str, suffix: Union[str, tuple] = (".yaml",), msg: str = ""):
    from pathlib import Path
    suffix = (suffix,) if isinstance(suffix, str) else tuple(suffix)
    s = Path(str(file)).suffix.lower()
    if s and s not in suffix:
        raise ValueError(f"{msg}{file} has unsupported suffix {s}; expected {suffix}")


def check_requirements(requirements=(), install: bool = False) -> bool:
    """Verify imports exist; never installs (hermetic environment)."""
    import importlib
    missing = []
    for r in ([requirements] if isinstance(requirements, str) else requirements):
        name = re.split(r"[<>=!~]", r)[0].strip()
        try:
            importlib.import_module(name)
        except ImportError:
            missing.append(r)
    if missing:
        LOGGER.warning(f"WARNING missing requirements {missing} "
                       f"(auto-install disabled in this environment)")
    return not missing


def check_bf16(model_holder=None) -> bool:
    """bf16 numerics sanity: fp32 vs bf16 forward agreement on a small conv
    (the TPU replacement for check_amp, reference checks.py:350-397)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 8)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 8, 8)) * 0.1,
                    jnp.float32)

    def conv(xx, ww):
        return jax.lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = conv(x, w)
    b = conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)).astype(jnp.float32)
    rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    ok = rel < 0.1
    if not ok:
        LOGGER.warning(f"bf16 check failed (rel err {rel:.3f}); training in fp32")
    return ok


def check_yolo(verbose: bool = True) -> str:
    """Environment summary for the `yolo checks` CLI command (reference
    checks.check_yolo: device/python/package report, TPU-shaped)."""
    import platform
    import sys

    import jax

    from .. import __version__
    try:
        devices = ", ".join(f"{d.platform}:{d.id}" for d in jax.devices())
    except Exception as e:  # no backend reachable
        devices = f"unavailable ({e})"
    lines = [
        f"mgdt_yolo_tpu {__version__}",
        f"python {sys.version.split()[0]} on {platform.platform()}",
        f"jax {jax.__version__} devices: {devices}",
        f"default backend: {jax.default_backend()}",
    ]
    msg = "\n".join(lines)
    if verbose:
        LOGGER.info(msg)
    return msg
