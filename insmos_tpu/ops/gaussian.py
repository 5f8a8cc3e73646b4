"""Gaussian heatmap targets, vectorized.

Replaces the reference's per-object python loop
(center_head.py:171-249, draw_heatmap_gaussian:365-394,
gaussian_radius:396-425) with a scatter-max of fixed-size gaussian patches —
one compiled op over all (max_objs) boxes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_radius(height, width, min_overlap: float):
    """CornerNet-style radius (center_head.py:396-425). height/width in cells."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.clip(b1**2 - 4 * a1 * c1, 0.0, None))) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.clip(b2**2 - 4 * a2 * c2, 0.0, None))) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.clip(b3**2 - 4 * a3 * c3, 0.0, None))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def splat_gaussians(
    heatmap_shape: tuple[int, int, int],
    centers_int,  # (M, 2) int32 (x, y)
    radii,  # (M,) int32
    class_ids,  # (M,) int32 in [0, C)
    valid,  # (M,) bool
    max_radius: int,
):
    """Scatter-max gaussian patches into a (C, H, W) heatmap.

    The gaussian matches reference gaussian_2d: sigma = (2r+1)/6, values below
    float32 eps * peak zeroed; patch cropped at the map border
    (draw_heatmap_gaussian:377-393).
    """
    C, H, W = heatmap_shape
    M = centers_int.shape[0]
    R = max_radius
    P = 2 * R + 1

    dy, dx = jnp.meshgrid(
        jnp.arange(-R, R + 1), jnp.arange(-R, R + 1), indexing="ij"
    )  # (P, P)
    r = jnp.clip(radii, 0, R).astype(jnp.float32)  # (M,)
    sigma = (2.0 * r + 1.0) / 6.0
    val = jnp.exp(
        -(dx[None] ** 2 + dy[None] ** 2) / (2.0 * sigma[:, None, None] ** 2)
    )  # (M, P, P)
    in_radius = (jnp.abs(dx)[None] <= r[:, None, None]) & (
        jnp.abs(dy)[None] <= r[:, None, None]
    )
    val = jnp.where(in_radius, val, 0.0)
    val = jnp.where(val < np.finfo(np.float32).eps * 1.0, 0.0, val)

    px = centers_int[:, 0, None, None] + dx[None]  # (M, P, P)
    py = centers_int[:, 1, None, None] + dy[None]
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & valid[:, None, None]
    flat_idx = (
        class_ids[:, None, None] * (H * W) + py * W + px
    )  # (M, P, P)
    flat_idx = jnp.where(inb, flat_idx, C * H * W)  # out-of-range -> dropped

    heat = jnp.zeros((C * H * W,), jnp.float32)
    heat = heat.at[flat_idx.reshape(-1)].max(val.reshape(-1), mode="drop")
    return heat.reshape(C, H, W)
