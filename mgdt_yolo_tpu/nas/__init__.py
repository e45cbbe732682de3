"""YOLO-NAS facade (reference yolo/nas/, exported at __init__.py:9).

The reference wraps Deci's `super_gradients` YOLO-NAS models in its
predictor/validator stack; the models themselves come from that external
package (never trained here). This port keeps the same gating: the `NAS`
facade imports `super_gradients` lazily and raises a clear ImportError when
it is absent, while the postprocess + predictor/validator plumbing (the part
the reference actually implements) is package-independent and unit-tested
against fake raw outputs.
"""
from .model import NAS
from .predict import NASPredictor, nas_postprocess, nas_raw_to_pred
from .val import NASValidator

__all__ = ["NAS", "NASPredictor", "NASValidator", "nas_postprocess",
           "nas_raw_to_pred"]
