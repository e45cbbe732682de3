from .model import RTDETR
from .predict import RTDETRPredictor

__all__ = ["RTDETR", "RTDETRPredictor"]
