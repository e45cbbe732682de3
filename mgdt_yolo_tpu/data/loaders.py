"""Inference source loaders: images, videos, streams, arrays, PIL.

Reference yolo/data/dataloaders/stream_loaders.py:31-371 re-shaped: each
loader yields {img (BGR ndarray), path, frame_idx}; video/webcam decoding via
cv2.VideoCapture on the host feeding the jitted device pipeline.
"""
from __future__ import annotations

import glob
from pathlib import Path
from typing import Dict, Iterator, List, Union

import cv2
import numpy as np

from ..utils import LOGGER
from .utils import IMG_FORMATS  # canonical set lives in data/utils.py

VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg",
               "ts", "wmv", "webm"}


class LoadImagesAndVideos:
    """Files/dirs/globs of images and videos (stream_loaders.py:151-253)."""

    def __init__(self, source: Union[str, Path], vid_stride: int = 1):
        p = Path(str(source))
        if p.is_dir():
            files = sorted(str(f) for f in p.rglob("*"))
        elif p.is_file():
            files = [str(p)]
        else:
            files = sorted(glob.glob(str(source), recursive=True))
        self.files = [f for f in files
                      if Path(f).suffix[1:].lower() in IMG_FORMATS | VID_FORMATS]
        if not self.files:
            raise FileNotFoundError(f"no images/videos found in {source!r}")
        self.vid_stride = vid_stride

    def __iter__(self) -> Iterator[Dict]:
        for f in self.files:
            suffix = Path(f).suffix[1:].lower()
            if suffix in VID_FORMATS:
                cap = cv2.VideoCapture(f)
                frame_idx = 0
                while True:
                    for _ in range(self.vid_stride):
                        ok = cap.grab()
                        if not ok:
                            break
                    if not ok:
                        break
                    ok, img = cap.retrieve()
                    if not ok:
                        break
                    yield {"img": img, "path": f, "frame_idx": frame_idx,
                           "is_video": True,
                           "fps": cap.get(cv2.CAP_PROP_FPS) or 30}
                    frame_idx += 1
                cap.release()
            else:
                img = cv2.imread(f)
                if img is None:
                    LOGGER.warning(f"unreadable image {f}")
                    continue
                yield {"img": img, "path": f, "frame_idx": 0, "is_video": False}


class LoadStreams:
    """Webcam / RTSP / HTTP streams (stream_loaders.py:31-108), synchronous
    single-stream variant."""

    def __init__(self, source: str = "0", vid_stride: int = 1):
        self.source = int(source) if str(source).isdigit() else source
        self.vid_stride = vid_stride

    def __iter__(self) -> Iterator[Dict]:
        cap = cv2.VideoCapture(self.source)
        if not cap.isOpened():
            raise ConnectionError(f"failed to open stream {self.source!r}")
        i = 0
        try:
            while True:
                for _ in range(self.vid_stride):
                    ok = cap.grab()
                if not ok:
                    break
                ok, img = cap.retrieve()
                if not ok:
                    break
                yield {"img": img, "path": f"stream_{self.source}",
                       "frame_idx": i, "is_video": True,
                       "fps": cap.get(cv2.CAP_PROP_FPS) or 30}
                i += 1
        finally:
            cap.release()


class LoadScreenshots:
    """`source='screen [screen] [left top width height]'` capture via mss
    (reference stream_loaders.py:109-148). mss is not baked into this image;
    the loader raises a clear error at construction when it is absent."""

    def __init__(self, source: str, max_frames: int = 0):
        try:
            import mss
        except ImportError as e:
            raise ImportError(
                "screenshot capture requires the 'mss' package") from e
        _, *params = str(source).split()
        self.screen, left, top, width, height = 0, None, None, None, None
        if len(params) == 1:
            self.screen = int(params[0])
        elif len(params) == 4:
            left, top, width, height = (int(x) for x in params)
        elif len(params) == 5:
            self.screen, left, top, width, height = (int(x) for x in params)
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen]
        self.monitor = {
            "left": mon["left"] if left is None else mon["left"] + left,
            "top": mon["top"] if top is None else mon["top"] + top,
            "width": width or mon["width"],
            "height": height or mon["height"]}
        self.max_frames = max_frames  # 0 = endless, like the reference

    def __iter__(self) -> Iterator[Dict]:
        i = 0
        while not self.max_frames or i < self.max_frames:
            im = np.array(self.sct.grab(self.monitor))[:, :, :3]  # BGRA->BGR
            yield {"img": im, "path": f"screen_{self.screen}", "frame_idx": i,
                   "is_video": True, "fps": 30}
            i += 1


class LoadPilAndNumpy:
    """In-memory arrays / PIL images (stream_loaders.py:254-294)."""

    def __init__(self, source):
        items = source if isinstance(source, (list, tuple)) else [source]
        self.items = []
        for i, it in enumerate(items):
            if hasattr(it, "mode"):  # PIL
                arr = np.asarray(it.convert("RGB"))[..., ::-1]
            else:
                arr = np.asarray(it)
            self.items.append({"img": arr, "path": f"array{i}.jpg",
                               "frame_idx": 0, "is_video": False})

    def __iter__(self):
        return iter(self.items)


def load_inference_source(source, vid_stride: int = 1):
    """Sniff the source type (reference yolo/data/build.py:112-170)."""
    if isinstance(source, (np.ndarray,)) or hasattr(source, "mode") or \
            (isinstance(source, (list, tuple)) and source and
             (isinstance(source[0], np.ndarray) or hasattr(source[0], "mode"))):
        return LoadPilAndNumpy(source)
    s = str(source)
    if s.startswith("screen"):
        return LoadScreenshots(s)
    if s.isdigit() or s.startswith(("rtsp://", "rtmp://", "http://", "https://")):
        return LoadStreams(s, vid_stride)
    return LoadImagesAndVideos(source, vid_stride)
