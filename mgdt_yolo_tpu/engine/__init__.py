from .model import TASK_MAP, YOLO
from .predictor import BasePredictor, DetectionPredictor
from .results import Boxes, Results
from .serve import InferenceServer
from .trainer import BaseTrainer, DetectionTrainer, EarlyStopping, TrainState
from .validator import BaseValidator, DetectionValidator

__all__ = ["YOLO", "TASK_MAP", "BaseTrainer", "DetectionTrainer", "TrainState",
           "EarlyStopping", "BaseValidator", "DetectionValidator",
           "BasePredictor", "DetectionPredictor", "InferenceServer",
           "Results", "Boxes"]
