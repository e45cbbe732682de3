"""TPU-native compute ops: resampling, box math, NMS, deformable conv."""
from .boxes import (bbox2dist, bbox_iou, box_iou, clip_boxes, dist2bbox, make_anchors,
                    scale_boxes, xywh2xyxy, xywhn2xyxy, xyxy2xywh)
from .common import (adaptive_avg_pool2d, h_sigmoid, interpolate_bilinear,
                     max_pool2d_same, upsample_nearest)
from .deform import modulated_deform_conv2d
from .nms import nms_single, nms_single_fixpoint, non_max_suppression

__all__ = [
    "adaptive_avg_pool2d", "interpolate_bilinear", "upsample_nearest", "max_pool2d_same",
    "h_sigmoid", "bbox_iou", "box_iou", "xywh2xyxy", "xyxy2xywh", "xywhn2xyxy",
    "clip_boxes", "scale_boxes", "make_anchors", "dist2bbox", "bbox2dist",
    "modulated_deform_conv2d", "nms_single", "non_max_suppression",
]
