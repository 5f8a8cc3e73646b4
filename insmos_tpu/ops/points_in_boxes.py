"""Point-in-rotated-box tests, fully on-device.

Replaces the reference's host-side OpenMP op
(models/utils/src/Array_Index.cpp): the 4 device->host->device round-trips
per forward in the decoder fusion (spconv_unet.py:333-394) become one
vectorized (N_points x M_boxes) test that XLA fuses on the VPU.

Geometry (Array_Index.cpp:53-61): translate by the box center, rotate into
the box frame with rx = dx*cos + dy*sin, ry = -dx*sin + dy*cos, then test
|rx| <= dx_extent/2, |ry| <= dy_extent/2, |dz| <= dz_extent/2 (inclusive).

Tie-breaks: the reference's OpenMP loop writes instance ids from concurrent
box threads — last-writer-wins, a data race when same-class boxes overlap.
We define the result deterministically as the MAX box index (documented
deviation; for the 0/1 one-hot variant results are identical).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _in_box(points, boxes):
    """(N, 3) points x (M, >=7) boxes -> (N, M) bool membership."""
    d = points[:, None, :3] - boxes[None, :, :3]
    cos = jnp.cos(boxes[:, 6])[None]
    sin = jnp.sin(boxes[:, 6])[None]
    rx = d[..., 0] * cos + d[..., 1] * sin
    ry = -d[..., 0] * sin + d[..., 1] * cos
    half = boxes[None, :, 3:6] * 0.5
    return (
        (jnp.abs(rx) <= half[..., 0])
        & (jnp.abs(ry) <= half[..., 1])
        & (jnp.abs(d[..., 2]) <= half[..., 2])
    )


def points_in_rotated_boxes(points, boxes, box_valid=None):
    """(N, M) bool: point n inside rotated box m.

    points: (N, 3+) float; boxes: (M, 7+) [x,y,z,dx,dy,dz,yaw,...];
    box_valid: optional (M,) bool mask for padded boxes.
    """
    inside = _in_box(jnp.asarray(points), jnp.asarray(boxes))
    if box_valid is not None:
        inside = inside & box_valid[None, :]
    return inside


def box_class_features(coords, boxes, num_classes: int, box_valid=None):
    """One-hot per-class membership — Array_Index.find_features_by_bbox_with_yaw.

    coords: (N, 3) positions (the reference passes integer voxel coords as
    x,y,z); boxes: (M, 8) [x,y,z,dx,dy,dz,yaw,class] with 1-indexed class;
    class <= 0 rows are ignored (Array_Index.cpp:63-66).
    Returns (N, num_classes) float {0,1}.
    """
    boxes = jnp.asarray(boxes)
    cls = boxes[:, 7].astype(jnp.int32)
    valid = cls > 0
    if box_valid is not None:
        valid = valid & box_valid
    inside = points_in_rotated_boxes(coords, boxes, valid)  # (N, M)
    onehot = jnp.where(
        (cls[:, None] - 1) == jnp.arange(num_classes)[None, :], 1.0, 0.0
    )  # (M, C)
    feat = jnp.einsum(
        "nm,mc->nc", inside.astype(jnp.float32), onehot, precision="highest"
    )
    return jnp.minimum(feat, 1.0)


def points_in_instance_boxes(
    points, boxes, num_classes: int, ground_offset: float = 0.0, box_valid=None
):
    """Per-class instance ids — Array_Index.find_point_in_instance_bbox_with_yaw.

    Box centers are lifted by `ground_offset` (Array_Index.cpp:106) to shed
    ground points. Returns (N, num_classes) int32 of (box_index + 1), 0 when
    the point is in no box of that class; overlapping same-class boxes
    resolve to the max index (see module docstring).
    """
    boxes = jnp.asarray(boxes)
    lifted = boxes.at[:, 2].add(ground_offset)
    cls = lifted[:, 7].astype(jnp.int32)
    valid = cls > 0
    if box_valid is not None:
        valid = valid & box_valid
    inside = points_in_rotated_boxes(points, lifted, valid)  # (N, M)
    ids = jnp.arange(1, boxes.shape[0] + 1, dtype=jnp.int32)  # (M,)
    per_class = (cls[:, None] - 1) == jnp.arange(num_classes)[None, :]  # (M, C)
    contrib = inside[:, :, None] * (ids[None, :, None] * per_class[None])
    return jnp.max(contrib, axis=1).astype(jnp.int32)


def points_in_rotated_boxes_np(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Numpy oracle for tests: (N, M) bool membership (same math)."""
    d = points[:, None, :3] - boxes[None, :, :3]
    cos = np.cos(boxes[:, 6])[None]
    sin = np.sin(boxes[:, 6])[None]
    rx = d[..., 0] * cos + d[..., 1] * sin
    ry = -d[..., 0] * sin + d[..., 1] * cos
    half = boxes[None, :, 3:6] * 0.5
    return (
        (np.abs(rx) <= half[..., 0])
        & (np.abs(ry) <= half[..., 1])
        & (np.abs(d[..., 2]) <= half[..., 2])
    )
