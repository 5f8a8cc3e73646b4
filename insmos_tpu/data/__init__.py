from .kitti import (  # noqa: F401
    KittiWindowDataset,
    lidar_poses_from_files,
    load_calib,
    load_files,
    load_poses,
    read_bounding_box_label,
    read_labels,
    read_point_cloud,
    transform_point_cloud,
)
from .sample import WindowSample, pad_points, stack_samples  # noqa: F401
