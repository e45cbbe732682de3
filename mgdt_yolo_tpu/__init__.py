"""mgdt_yolo_tpu — TPU-native (JAX/XLA/Pallas) rebuild of MGDT-YOLO.

A from-scratch framework with the capabilities of zzuiekongning/MGDT-YOLO
(Ultralytics 8.0.120 fork: MSPA-C2f backbone, Gather-and-Distribute neck,
TOOD head, task-aligned assignment, piglet counting metrics), re-designed for
TPU: NHWC/bfloat16 compute on the MXU, jit-compiled graphs, pjit data
parallelism over device meshes, and Pallas kernels for the hot paths.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compilation cache — first MGDT compile on the TPU costs
    ~1-2 min; cached reloads are sub-second. Opt out with MGDT_NO_JIT_CACHE=1."""
    if _os.environ.get("MGDT_NO_JIT_CACHE") == "1":
        return
    try:
        import jax
        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                    _os.path.expanduser("~/.cache/mgdt_jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


_setup_compilation_cache()

from .nn.tasks import DetectionModel  # noqa: F401

__all__ = ["DetectionModel", "YOLO", "NAS", "__version__"]


def __getattr__(name):  # lazy: engine pulls in the full stack
    if name == "YOLO":
        from .engine.model import YOLO
        return YOLO
    if name == "NAS":  # reference __init__.py:9 exports NAS at top level
        from .nas import NAS
        return NAS
    raise AttributeError(f"module 'mgdt_yolo_tpu' has no attribute {name!r}")
