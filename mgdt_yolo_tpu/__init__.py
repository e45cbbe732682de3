"""mgdt_yolo_tpu — TPU-native (JAX/XLA/Pallas) rebuild of MGDT-YOLO.

A from-scratch framework with the capabilities of zzuiekongning/MGDT-YOLO
(Ultralytics 8.0.120 fork: MSPA-C2f backbone, Gather-and-Distribute neck,
TOOD head, task-aligned assignment, piglet counting metrics), re-designed for
TPU: NHWC/bfloat16 compute on the MXU, jit-compiled graphs, pjit data
parallelism over device meshes, and Pallas kernels for the hot paths.
"""

__version__ = "0.1.0"

from .nn.tasks import DetectionModel  # noqa: F401

__all__ = ["DetectionModel", "YOLO", "__version__"]


def __getattr__(name):  # lazy: engine pulls in the full stack
    if name == "YOLO":
        from .engine.model import YOLO
        return YOLO
    raise AttributeError(f"module 'mgdt_yolo_tpu' has no attribute {name!r}")
