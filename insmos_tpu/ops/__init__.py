from .box_utils import boxes_to_corners_bev, decode_center_boxes  # noqa: F401
from .iou3d import boxes_iou3d, boxes_iou_bev, rotated_overlap_bev  # noqa: F401
from .nms import greedy_nms  # noqa: F401
from .points_in_boxes import (  # noqa: F401
    box_class_features,
    points_in_instance_boxes,
    points_in_rotated_boxes,
    points_in_rotated_boxes_np,
)
