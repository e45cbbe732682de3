from .tasks import (BaseModel, ClassificationModel, DetectionModel, GraphModel,
                    LayerSpec, PoseModel, SegmentationModel, guess_model_task,
                    parse_model, yaml_model_load)

__all__ = ["BaseModel", "DetectionModel", "SegmentationModel", "PoseModel",
           "ClassificationModel", "GraphModel", "LayerSpec", "parse_model",
           "yaml_model_load", "guess_model_task"]
