"""Native (C++) host runtime for the data pipeline.

The reference feeds its accelerator through torch's C++ DataLoader workers
plus cv2's native decode/resize (yolo/data/build.py:93-109, base.py:146-160).
This package is the TPU build's equivalent: ``src/host_loader.cpp`` holds a
std::thread-pooled libjpeg/libpng ingest (decode -> long-side bilinear resize
-> paste into the 114-filled uint8 RGB canvas of ``collate_raw``), compiled
on demand with the system g++ and bound via ctypes.

Everything degrades gracefully: if g++/libjpeg are unavailable or a given
file is something the native path does not handle (EXIF-rotated JPEG, CMYK,
bmp/tiff/webp, corrupt), per-image status codes let the caller redo exactly
those images through the cv2 path.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..utils import LOGGER

_SRC = Path(__file__).parent / "src" / "host_loader.cpp"
_BUILD = Path(__file__).parent / "_build"

# status codes (keep in sync with host_loader.cpp)
OK = 0
ERR_OPEN = -1
ERR_EXIF = -2
ERR_DECODE = -3
ERR_FORMAT = -4
ERR_COLORSPACE = -5

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile(so_path: Path) -> bool:
    so_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = so_path.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(tmp), "-ljpeg", "-lpng", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        LOGGER.warning(f"native loader: g++ unavailable ({e}); using cv2 path")
        return False
    if proc.returncode != 0:
        LOGGER.warning(
            f"native loader: compile failed; using cv2 path\n{proc.stderr[-800:]}")
        return False
    os.replace(tmp, so_path)
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed) and load the native library."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.is_file():
            return None
        tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
        so = _BUILD / f"libmgdt_host-{tag}.so"
        if not so.is_file() and not _compile(so):
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError as e:
            LOGGER.warning(f"native loader: dlopen failed ({e}); using cv2 path")
            return None
        lib.mgdt_version.restype = ctypes.c_int
        lib.mgdt_load_one.restype = ctypes.c_int
        lib.mgdt_load_one.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
        lib.mgdt_load_batch.restype = None
        lib.mgdt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_batch(paths: List[str], imgsz: int, fill: int = 114,
               nthreads: int = 8
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded native ingest of a batch of image files.

    Returns ``(imgs, hw, status)``: imgs ``(n, imgsz, imgsz, 3)`` uint8 RGB
    canvases (fill-padded, image pasted top-left after the reference
    load_image long-side resize), hw ``(n, 2)`` float32 pasted (h, w), and
    status ``(n,)`` int32 — 0 for success, a negative MGDT_ERR_* for images
    the caller must re-ingest via the cv2 fallback.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    imgs = np.empty((n, imgsz, imgsz, 3), np.uint8)
    hw = np.zeros((n, 2), np.float32)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mgdt_load_batch(
        arr, n, imgsz, fill,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(nthreads))
    return imgs, hw, status
