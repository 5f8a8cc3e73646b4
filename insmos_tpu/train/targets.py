"""CenterHead target assignment, vectorized over all boxes at once.

Reference: center_head.py get_targets_single (171-249) — per-GT gaussian on
the stride-4 BEV heatmap, box code [dx, dy, z, log dims, sin, cos], flat
index y*W + x, validity mask. The python loop becomes a masked splat.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..ops.gaussian import gaussian_radius, splat_gaussians


def assign_targets(cfg: Config, gt_boxes, num_boxes):
    """gt_boxes (M, 8) [x,y,z,dx,dy,dz,yaw,class], class 1-indexed, zero-pad.

    Returns dict(heatmap (C, H, W), anno (M, 8), inds (M,), mask (M,)).
    """
    h = cfg.model.head
    vx, vy = cfg.data.voxel_size[:2]
    gx, gy, _ = cfg.data.grid_size
    W, H = gx // h.out_size_factor, gy // h.out_size_factor
    rng = cfg.data.point_cloud_range
    M = gt_boxes.shape[0]

    cls_id = gt_boxes[:, 7].astype(jnp.int32) - 1
    row_ok = jnp.arange(M) < num_boxes
    # width/length in heatmap cells (reference swaps names; dims stay dx, dy)
    width = gt_boxes[:, 3] / vx / h.out_size_factor
    length = gt_boxes[:, 4] / vy / h.out_size_factor
    ok = row_ok & (width > 0) & (length > 0) & (cls_id > -1)

    radius = gaussian_radius(length, width, h.gaussian_overlap)
    radius = jnp.maximum(h.min_radius, radius.astype(jnp.int32))

    coor_x = (gt_boxes[:, 0] - rng[0]) / vx / h.out_size_factor
    coor_y = (gt_boxes[:, 1] - rng[1]) / vy / h.out_size_factor
    cx = coor_x.astype(jnp.int32)  # trunc toward zero, like torch .to(int32)
    cy = coor_y.astype(jnp.int32)
    in_map = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
    ok = ok & in_map

    heatmap = splat_gaussians(
        (h.num_class, H, W),
        jnp.stack([cx, cy], axis=-1),
        radius,
        jnp.clip(cls_id, 0, h.num_class - 1),
        ok,
        max_radius=h.max_gaussian_radius,
    )

    anno = jnp.concatenate(
        [
            (coor_x - cx)[:, None],
            (coor_y - cy)[:, None],
            gt_boxes[:, 2:3],
            jnp.log(jnp.clip(gt_boxes[:, 3:6], 1e-12, None)),
            jnp.sin(gt_boxes[:, 6:7]),
            jnp.cos(gt_boxes[:, 6:7]),
        ],
        axis=-1,
    )
    inds = jnp.clip(cy * W + cx, 0, H * W - 1)
    return {
        "heatmap": heatmap,
        "anno": jnp.where(ok[:, None], anno, 0.0),
        "inds": jnp.where(ok, inds, 0),
        "mask": ok,
    }
