"""Training augmentations applied jointly to the whole scan window + boxes.

The reference applies flip / rotate / scale once to the concatenated window
and re-splits (dataloader/datasets.py:158-170, dataloader/augmentation.py).
Host-side numpy with np.random, matching the reference's sampling.
"""

from __future__ import annotations

import numpy as np

from .processor import rotate_points_z


def random_flip_x(
    points: np.ndarray, boxes: np.ndarray, rng: np.random.Generator | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Flip about the x axis (negate y) with p=0.5; boxes flip y and heading."""
    rng = rng or np.random.default_rng()
    if rng.random() < 0.5:
        points[:, 1] = -points[:, 1]
        boxes[:, 1] = -boxes[:, 1]
        boxes[:, 6] = -boxes[:, 6]
    return points, boxes


def random_rotation(
    points: np.ndarray,
    boxes: np.ndarray,
    rot_range=(-np.pi / 4, np.pi / 4),
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    rng = rng or np.random.default_rng()
    angle = rng.uniform(rot_range[0], rot_range[1])
    points[:, 0:3] = rotate_points_z(points[:, 0:3], angle)
    boxes[:, 0:3] = rotate_points_z(boxes[:, 0:3], angle)
    boxes[:, 6] += angle
    return points, boxes


def random_scaling(
    points: np.ndarray,
    boxes: np.ndarray,
    scale_range=(0.95, 1.05),
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    rng = rng or np.random.default_rng()
    if scale_range[1] - scale_range[0] < 1e-3:
        return points, boxes
    s = rng.uniform(scale_range[0], scale_range[1])
    points[:, 0:3] *= s
    boxes[:, 0:6] *= s
    return points, boxes


def augment_window(
    points: np.ndarray, boxes7: np.ndarray, rng: np.random.Generator | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """flip(x) -> rotate(±π/4) -> scale(0.95–1.05), reference order."""
    rng = rng or np.random.default_rng()
    points, boxes7 = random_flip_x(points, boxes7, rng)
    points, boxes7 = random_rotation(points, boxes7, rng=rng)
    points, boxes7 = random_scaling(points, boxes7, rng=rng)
    return points, boxes7
