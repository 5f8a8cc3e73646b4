"""Box encode/decode for the CenterPoint-style head.

Code layout (reference center_head.py:239-276): the 8-channel regression is
[dx, dy, z, log dx_dim, log dy_dim, log dz_dim, sin yaw, cos yaw] on a
stride-`out_size_factor` BEV grid.
"""

from __future__ import annotations

import jax.numpy as jnp

from .iou3d import boxes_to_corners_bev  # noqa: F401  (re-export)


def decode_center_boxes(box_preds, voxel_size, pc_range, out_size_factor: int):
    """Dense (H, W, 8) regression map -> (H*W, 7) world-frame boxes.

    Matches generate_predicted_boxes (center_head.py:251-276): grid cell
    (x=w, y=h) plus the predicted offset, scaled to metres; dims through exp;
    yaw via atan2(sin, cos).
    """
    H, W, _ = box_preds.shape
    flat = box_preds.reshape(H * W, 8)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    xs = xs.reshape(-1) + flat[:, 0]
    ys = ys.reshape(-1) + flat[:, 1]
    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]
    dims = jnp.exp(flat[:, 3:6])
    yaw = jnp.arctan2(flat[:, 6], flat[:, 7])
    return jnp.concatenate(
        [jnp.stack([xs, ys, flat[:, 2]], -1), dims, yaw[:, None]], axis=-1
    )
