"""Rotated-box overlap / IoU, fully on-device.

Replaces the CUDA polygon-clipping kernels
(models/bbox_post_process/src/iou3d_nms_kernel.cu). The CUDA code clips by
explicit segment-intersection + vertex-angle sorting; we compute the exact
same convex intersection with Sutherland–Hodgman clipping (rect A clipped by
the 4 half-planes of rect B), which vectorizes cleanly: fixed 8-vertex
polygon buffers, no sorting, no data-dependent shapes.

3D IoU composes BEV overlap with z-extent overlap exactly like the reference
shim (models/bbox_post_process/iou3d_nms_utils.py:28-61).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
_MAX_VERTS = 8  # 4 rect corners + <=1 new vertex per clip edge


def boxes_to_corners_bev(boxes):
    """(M, 7) -> (M, 4, 2) CCW BEV corners. yaw rotates box frame -> world."""
    half = boxes[:, 3:5] * 0.5
    local = jnp.stack(
        [
            jnp.stack([half[:, 0], half[:, 1]], -1),
            jnp.stack([-half[:, 0], half[:, 1]], -1),
            jnp.stack([-half[:, 0], -half[:, 1]], -1),
            jnp.stack([half[:, 0], -half[:, 1]], -1),
        ],
        axis=1,
    )  # (M, 4, 2)
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return jnp.stack([x, y], -1) + boxes[:, None, 0:2]


def _clip_halfplane(poly, count, a, b):
    """Clip polygons by the half-plane left of edge a->b (vectorized).

    poly: (K, V, 2) with the first `count` vertices valid; a, b: (K, 2).
    Returns (new_poly, new_count) with V slots.
    """
    K, V, _ = poly.shape
    idx = jnp.arange(V)
    nxt_idx = jnp.where(idx[None, :] + 1 >= count[:, None], 0, idx[None, :] + 1)
    cur = poly
    nxt = jnp.take_along_axis(poly, nxt_idx[..., None], axis=1)

    edge = b - a  # (K, 2)
    def side(p):  # >= 0 means inside (left of a->b)
        d = p - a[:, None, :]
        return edge[:, None, 0] * d[..., 1] - edge[:, None, 1] * d[..., 0]

    s_cur, s_nxt = side(cur), side(nxt)
    in_cur = s_cur >= -_EPS
    in_nxt = s_nxt >= -_EPS
    vertex_alive = idx[None, :] < count[:, None]

    # intersection of segment cur->nxt with the clip line
    t = s_cur / jnp.where(jnp.abs(s_cur - s_nxt) < _EPS, _EPS, s_cur - s_nxt)
    inter = cur + jnp.clip(t, 0.0, 1.0)[..., None] * (nxt - cur)

    # emit slots: 2i = cur (kept if inside), 2i+1 = crossing intersection
    emit_pts = jnp.stack([cur, inter], axis=2).reshape(K, 2 * V, 2)
    emit_flag = jnp.stack(
        [in_cur & vertex_alive, (in_cur ^ in_nxt) & vertex_alive], axis=2
    ).reshape(K, 2 * V)

    pos = jnp.cumsum(emit_flag, axis=1) - 1  # target slot per emission
    new_count = jnp.maximum(pos[:, -1] + 1, 0) * jnp.any(emit_flag, 1)
    pos = jnp.where(emit_flag & (pos < V), pos, V)  # V = dropped
    flat_idx = (jnp.arange(K)[:, None] * (V + 1) + pos).reshape(-1)
    out = jnp.zeros((K * (V + 1), 2), poly.dtype)
    out = out.at[flat_idx].set(emit_pts.reshape(-1, 2), mode="drop")
    out = out.reshape(K, V + 1, 2)[:, :V]
    return out, jnp.minimum(new_count, V).astype(jnp.int32)


def _polygon_area(poly, count):
    """Shoelace area of the first `count` vertices (K, V, 2) -> (K,)."""
    K, V, _ = poly.shape
    idx = jnp.arange(V)
    nxt_idx = jnp.where(idx[None, :] + 1 >= count[:, None], 0, idx[None, :] + 1)
    nxt = jnp.take_along_axis(poly, nxt_idx[..., None], axis=1)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    cross = jnp.where(idx[None, :] < count[:, None], cross, 0.0)
    return 0.5 * jnp.abs(cross.sum(axis=1))


def rotated_overlap_bev(boxes_a, boxes_b):
    """Exact BEV intersection area of rotated rects: (A, 7) x (B, 7) -> (A, B)."""
    boxes_a = jnp.asarray(boxes_a, jnp.float32)
    boxes_b = jnp.asarray(boxes_b, jnp.float32)
    A, B = boxes_a.shape[0], boxes_b.shape[0]
    ca = boxes_to_corners_bev(boxes_a)  # (A, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (B, 4, 2)

    K = A * B
    poly = jnp.zeros((A, B, _MAX_VERTS, 2), jnp.float32)
    poly = poly.at[:, :, :4].set(ca[:, None])
    poly = poly.reshape(K, _MAX_VERTS, 2)
    count = jnp.full((K,), 4, jnp.int32)
    cb_pairs = jnp.broadcast_to(cb[None], (A, B, 4, 2)).reshape(K, 4, 2)

    for e in range(4):
        a_pt = cb_pairs[:, e]
        b_pt = cb_pairs[:, (e + 1) % 4]
        poly, count = _clip_halfplane(poly, count, a_pt, b_pt)

    area = _polygon_area(poly, count).reshape(A, B)
    # degenerate (zero-size padding) rects have no half-planes to clip by;
    # the true intersection is bounded by both areas, so clamp.
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return jnp.minimum(area, jnp.minimum(area_a, area_b))


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (reference iou3d_nms_utils.boxes_iou_bev)."""
    inter = rotated_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, _EPS, None)


def boxes_iou3d(boxes_a, boxes_b):
    """Rotated 3D IoU (reference iou3d_nms_utils.boxes_iou3d_gpu:28-61)."""
    boxes_a = jnp.asarray(boxes_a, jnp.float32)
    boxes_b = jnp.asarray(boxes_b, jnp.float32)
    inter_bev = rotated_overlap_bev(boxes_a, boxes_b)
    a_zmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    a_zmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    b_zmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    b_zmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    overlap_z = jnp.clip(
        jnp.minimum(a_zmax, b_zmax) - jnp.maximum(a_zmin, b_zmin), 0.0, None
    )
    inter = inter_bev * overlap_z
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6, None)
