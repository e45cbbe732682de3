"""Model export: StableHLO (the TPU-native deployment artifact), flat-weights
npz, and gated TF-family formats.

The reference's 12-format table (yolo/engine/exporter.py:77-91) is CUDA/edge
oriented (TensorRT, CoreML, NCNN...); the TPU-native equivalents are:
- stablehlo: `jax.export` serialized artifact of the jitted eval forward
  (decode included) — loadable by any XLA runtime, the analog of
  torchscript/pnnx in the fork's deploy path (nn/pnnx_conver.py).
- npz: flat name->array weights for interop.
- saved_model / tflite: via jax2tf (TF 2.21 is present; both legs are
  executed + reload-parity-tested in tests/test_export.py).

Each export writes a metadata.json (imgsz, nc, stride, names) mirroring the
reference's metadata attachment (exporter.py yaml_save of args).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..cfg import get_cfg
from ..utils import LOGGER, colorstr
from ..utils.callbacks import CallbackMixin

EXPORT_FORMATS = {
    # name: (suffix, needs_tf)
    "stablehlo": (".stablehlo", False),
    "npz": (".npz", False),
    "saved_model": ("_saved_model", True),
    "tflite": (".tflite", True),
}


def try_export(fn):
    """Decorator logging success/failure + timing (reference exporter.py:103)."""
    def wrapper(self, *args, **kwargs):
        name = fn.__name__.replace("export_", "")
        t0 = time.time()
        try:
            out = fn(self, *args, **kwargs)
            LOGGER.info(f"{colorstr('export:')} {name} OK "
                        f"({time.time() - t0:.1f}s) -> {out}")
            return out
        except Exception as e:
            LOGGER.error(f"export {name} FAILED: {e}")
            raise
    return wrapper


class Exporter(CallbackMixin):
    def __init__(self, args=None, overrides=None):
        self.args = args if hasattr(args, "imgsz") else get_cfg(args, overrides)
        self.init_callbacks()

    def __call__(self, model_holder, fmt: Optional[str] = None) -> List[str]:
        fmt = (fmt or self.args.format or "stablehlo").lower()
        if fmt not in EXPORT_FORMATS:
            raise ValueError(f"unknown export format {fmt!r}; "
                             f"available: {list(EXPORT_FORMATS)}")
        self.run_callbacks("on_export_start")
        self.model_holder = model_holder
        imgsz = self.args.imgsz
        self.out_dir = Path(self.args.project or "runs/export")
        self.out_dir.mkdir(parents=True, exist_ok=True)
        stem = Path(str(getattr(model_holder, "yaml", {}).get("yaml_file",
                                                              "model"))).stem
        self.stem = stem
        _, needs_tf = EXPORT_FORMATS[fmt]
        if needs_tf:
            try:
                import tensorflow  # noqa: F401
            except ImportError:
                raise RuntimeError(
                    f"format {fmt!r} needs TensorFlow (jax2tf), which is not "
                    f"installed in this environment; use 'stablehlo' or 'npz'")
        out = getattr(self, f"export_{fmt}")(imgsz)
        self._write_metadata()
        self.run_callbacks("on_export_end")
        return [str(out)]

    @try_export
    def export_stablehlo(self, imgsz: int) -> Path:
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        mh = self.model_holder
        variables = jax.tree.map(jnp.asarray, mh.variables)

        def forward(img):
            decoded, _ = mh.model.apply(variables, img, train=False)
            return decoded

        try:
            # batch-polymorphic artifact: one export serves every batch size
            (b,) = jexport.symbolic_shape("b")
            x = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.float32)
            exported = jexport.export(jax.jit(forward))(x)
        except Exception:  # model not symbolic-batch traceable: pin batch 1
            # (NOT args.batch, whose default of 16 would break every
            # downstream batch-1 consumer — AutoBackend.warmup, benchmark)
            LOGGER.warning("stablehlo export: symbolic batch failed, "
                           "pinning batch=1")
            x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
            exported = jexport.export(jax.jit(forward))(x)
        blob = exported.serialize()
        out = self.out_dir / f"{self.stem}.stablehlo"
        out.write_bytes(blob)
        return out

    @try_export
    def export_npz(self, imgsz: int) -> Path:
        flat = {}

        def walk(tree, prefix):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, f"{prefix}{k}.")
                else:
                    flat[prefix + k] = np.asarray(v)
        for coll, tree in self.model_holder.variables.items():
            walk(tree, f"{coll}.")
        out = self.out_dir / f"{self.stem}.npz"
        np.savez(out, **flat)
        return out

    @try_export
    def export_saved_model(self, imgsz: int) -> Path:
        import jax
        import tensorflow as tf
        from jax.experimental import jax2tf

        mh = self.model_holder
        variables = mh.variables

        def forward(img):
            decoded, _ = mh.model.apply(variables, img, train=False)
            return decoded

        tf_fn = tf.function(jax2tf.convert(jax.jit(forward)),
                            input_signature=[tf.TensorSpec((1, imgsz, imgsz, 3),
                                                           tf.float32)])
        out = self.out_dir / f"{self.stem}_saved_model"
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, str(out))
        return out

    @try_export
    def export_tflite(self, imgsz: int) -> Path:
        import tensorflow as tf
        saved = self.export_saved_model(imgsz)
        converter = tf.lite.TFLiteConverter.from_saved_model(str(saved))
        blob = converter.convert()
        out = self.out_dir / f"{self.stem}.tflite"
        out.write_bytes(blob)
        return out

    def _write_metadata(self):
        from ..ops.deform import eval_semantics
        mh = self.model_holder
        meta = {"imgsz": self.args.imgsz, "nc": mh.nc,
                "stride": list(getattr(mh, "stride", (32,))),
                "names": getattr(mh, "names", {}),
                # architecture pointer: lets AutoBackend rebuild the model
                # around an .npz weight archive
                "model_yaml": getattr(mh, "yaml", {}).get("yaml_file", ""),
                # which DCNv2 semantics the exported program was traced
                # under / a rebuilt npz model must pin (windowed vs exact
                # kernels are NOT interchangeable on trained weights:
                # measured -0.07..-0.26 mAP50-95, README results table) —
                # AutoBackend pins the rebuilt model's dispatch from this
                "deform_semantics": eval_semantics(
                    getattr(mh, "deform_semantics", "auto")),
                "layout": "NHWC", "output": "(1, 4+nc, A) xywh+scores"}
        (self.out_dir / f"{self.stem}_metadata.json").write_text(
            json.dumps(meta, indent=1))


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns a callable(img)->decoded."""
    from jax import export as jexport
    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call
