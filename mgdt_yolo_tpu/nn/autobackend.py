"""AutoBackend: uniform forward() over live models and exported artifacts.

Reference nn/autobackend.py:41 multiplexes 11 runtime formats behind one
interface; the TPU-native set is: live flax model, orbax checkpoint dir,
serialized StableHLO artifact, npz weight archive. All expose
`forward(img_nhwc) -> (B, 4+nc, A)` plus stride/names metadata.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils import LOGGER


def load_npz_model(path):
    """Rebuild a live model holder from an Exporter npz weight archive.

    Reads the exporter's ``*_metadata.json`` beside the archive for the
    model yaml / nc / names, and pins the holder to the recorded
    `deform_semantics` (a bare rebuild would dispatch 'auto' → windowed,
    the measured 0.626→0.557 mAP50-95 failure on exact-trained weights).
    Shared by AutoBackend's npz leg and `YOLO('weights.npz')` (the
    reference facade likewise accepts its exported artifacts,
    yolo/engine/model.py:104 via nn/autobackend.py:41).

    Returns (model_holder, metadata_dict).
    """
    p = Path(str(path))
    meta_file = p.parent / f"{p.stem}_metadata.json"
    m = json.loads(meta_file.read_text()) if meta_file.is_file() else {}
    yaml_file = m.get("model_yaml")
    if not yaml_file:
        raise ValueError(
            f"npz backend needs the exporter's *_metadata.json "
            f"(with model_yaml) beside {p}")
    from .tasks import DetectionModel
    mh = DetectionModel(yaml_file, nc=m.get("nc"))
    sem = m.get("deform_semantics")
    if sem in ("exact", "windowed"):
        mh.set_deform_semantics(sem)
    flat = np.load(str(p))
    variables = {}
    for key in flat.files:  # "coll.a.b.kernel" -> nested dict
        parts = key.split(".")
        node = variables
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = flat[key]
    mh.variables = variables
    if m.get("names"):
        mh.names = {int(k): v for k, v in m["names"].items()}
    return mh, m


class AutoBackend:
    def __init__(self, model, imgsz: int = 640):
        """model: DetectionModel | path to .stablehlo | orbax ckpt dir | .npz."""
        self.imgsz = imgsz
        self.kind = None
        self.stride = (32,)
        self.names = {}
        if hasattr(model, "model") and hasattr(model, "variables"):
            self.kind = "flax"
            self.mh = model
            self.stride = model.stride
            self.names = model.names
            import jax

            def fwd(vs, img):
                decoded, _ = model.model.apply(vs, img, train=False)
                return decoded
            from ..utils.compile_opts import tpu_compiler_options
            self._fn = jax.jit(fwd,
                               compiler_options=tpu_compiler_options())
            self._vs = model.variables
        else:
            p = Path(str(model))
            meta = p.parent / f"{p.stem.replace('_saved_model', '')}_metadata.json"
            if meta.is_file():
                m = json.loads(meta.read_text())
                self.stride = tuple(m.get("stride", [32]))
                self.names = {int(k): v for k, v in m.get("names", {}).items()}
            if p.suffix == ".stablehlo":
                self.kind = "stablehlo"
                from ..engine.exporter import load_stablehlo
                self._fn = load_stablehlo(str(p))
            elif p.suffix == ".tflite":
                # reference AutoBackend's tflite leg (nn/autobackend.py:177)
                self.kind = "tflite"
                import tensorflow as tf
                interp = tf.lite.Interpreter(model_path=str(p))
                interp.allocate_tensors()
                inp = interp.get_input_details()[0]
                out = interp.get_output_details()[0]

                def run_tflite(img):
                    img = np.asarray(img, np.float32)
                    if list(img.shape) != list(inp["shape"]):
                        interp.resize_tensor_input(inp["index"], img.shape)
                        interp.allocate_tensors()
                    interp.set_tensor(inp["index"], img)
                    interp.invoke()
                    return interp.get_tensor(out["index"])
                self._fn = run_tflite
            elif p.is_dir() and (p / "saved_model.pb").is_file():
                # reference AutoBackend's saved_model leg (autobackend.py:169)
                self.kind = "saved_model"
                import tensorflow as tf
                module = tf.saved_model.load(str(p))

                def run_sm(img):
                    return module.f(np.asarray(img, np.float32)).numpy()
                self._fn = run_sm
            elif p.suffix == ".npz":  # Exporter.export_npz weight archive
                mh, _ = load_npz_model(p)
                self.__init__(mh, imgsz)  # runs as a flax backend from here
                return
            elif p.is_dir():  # orbax checkpoint
                self.kind = "orbax"
                from ..engine.model import YOLO
                y = YOLO(str(p))
                self.__init__(y.model, imgsz)
                return
            else:
                raise ValueError(f"unsupported backend source: {model!r}")
        LOGGER.info(f"AutoBackend: {self.kind} backend ready")

    def forward(self, img: np.ndarray):
        """img: (B, H, W, 3) float32 0-1 NHWC -> (B, 4+nc, A) numpy."""
        import jax
        if self.kind == "flax":
            return np.asarray(jax.device_get(self._fn(self._vs, img)))
        return np.asarray(self._fn(img))

    def forward_device(self, img):
        """Jit-nestable forward: returns the device array, no host copy —
        use when embedding the backend inside another jitted program."""
        if self.kind == "flax":
            return self._fn(self._vs, img)
        return self._fn(img)

    __call__ = forward

    def warmup(self, batch: int = 1):
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32))
        return self
