from .augment import augment_hsv, letterbox, mosaic4, random_perspective, train_transform
from .build import DataLoader, build_dataloader, collate
from .dataset import DetItem, SyntheticDetectionDataset, YOLODataset

__all__ = ["letterbox", "augment_hsv", "mosaic4", "random_perspective",
           "train_transform", "DataLoader", "build_dataloader", "collate",
           "YOLODataset", "SyntheticDetectionDataset", "DetItem"]
