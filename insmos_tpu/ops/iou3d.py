"""Rotated-box overlap / IoU, fully on-device.

Replaces the CUDA polygon-clipping kernels
(models/bbox_post_process/src/iou3d_nms_kernel.cu). The CUDA code clips by
explicit segment-intersection + vertex-angle sorting; we compute the exact
same convex intersection with Sutherland–Hodgman clipping (rect A clipped by
the 4 half-planes of rect B), which vectorizes cleanly: fixed 8-vertex
polygon buffers, no sorting, no data-dependent shapes.

TPU layout note: polygons are carried TRANSPOSED, as (V, K) coordinate
planes — the box-pair axis K lives on the 128-lane minor dimension and the
V=8 vertex slots on sublanes, so every clip step is a fused elementwise VPU
op at full lane utilization. The naive (K, V, 2) layout tiles each 2-wide
minor dim to 128 lanes (64x memory bloat) and needs per-row gathers for the
cyclic next-vertex lookup (~20 ns/row -> tens of ms per NMS tile); here the
successor is a static roll + wrap select and compaction is a static
unrolled one-hot sum — no gathers anywhere.

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


def _next_t(p, p0, count, iv):
    """Cyclic successor along the vertex (sublane) axis of a (V, K) plane:
    slot i -> slot i+1, wrapping to slot 0 where i+1 == count."""
    n = jnp.roll(p, -1, axis=0)
    return jnp.where(iv + 1 == count[None, :], p0[None, :], n)


def _clip_halfplane_t(px, py, count, ax, ay, bx, by):
    """Clip polygons by the half-plane left of edge a->b (transposed layout).

    px, py: (V, K) with the first `count` vertex slots valid; ax..by: (K,).
    Returns (new_px, new_py, new_count).
    """
    V, K = px.shape
    iv = jnp.arange(V)[:, None]
    ex, ey = bx - ax, by - ay

    s = ex[None, :] * (py - ay[None, :]) - ey[None, :] * (px - ax[None, :])
    nx = _next_t(px, px[0], count, iv)
    ny = _next_t(py, py[0], count, iv)
    ns = _next_t(s, s[0], count, iv)

    in_cur = s >= -_EPS
    in_nxt = ns >= -_EPS
    alive = iv < count[None, :]

    # intersection of segment cur->nxt with the clip line
    t = s / jnp.where(jnp.abs(s - ns) < _EPS, _EPS, s - ns)
    t = jnp.clip(t, 0.0, 1.0)
    ix = px + t * (nx - px)
    iy = py + t * (ny - py)

    # emission rows: 2i = cur (kept if inside), 2i+1 = crossing intersection
    emit_x = jnp.stack([px, ix], axis=1).reshape(2 * V, K)
    emit_y = jnp.stack([py, iy], axis=1).reshape(2 * V, K)
    emit_f = jnp.stack(
        [in_cur & alive, (in_cur ^ in_nxt) & alive], axis=1
    ).reshape(2 * V, K)

    # prefix-sum over the 16 emission rows: 4 unrolled Hillis-Steele
    # rounds (XLA lowers jnp.cumsum to a much slower reduce-window here)
    acc = emit_f.astype(jnp.int32)
    for sh in (1, 2, 4, 8):
        acc = acc + jnp.pad(acc, ((sh, 0), (0, 0)))[: 2 * V]
    pos = acc - 1  # target slot per emission
    new_count = jnp.maximum(pos[-1] + 1, 0) * jnp.any(emit_f, axis=0)

    # static unrolled compaction: slot j collects its unique flagged emission
    outx, outy = [], []
    for j in range(V):
        selj = (pos == j) & emit_f
        outx.append(jnp.sum(jnp.where(selj, emit_x, 0.0), axis=0))
        outy.append(jnp.sum(jnp.where(selj, emit_y, 0.0), axis=0))
    return (
        jnp.stack(outx),
        jnp.stack(outy),
        jnp.minimum(new_count, V).astype(jnp.int32),
    )


def _polygon_area_t(px, py, count):
    """Shoelace area of the first `count` vertex slots: (V, K) -> (K,)."""
    V, K = px.shape
    iv = jnp.arange(V)[:, None]
    nx = _next_t(px, px[0], count, iv)
    ny = _next_t(py, py[0], count, iv)
    cross = px * ny - py * nx
    cross = jnp.where(iv < count[None, :], cross, 0.0)
    return 0.5 * jnp.abs(cross.sum(axis=0))


def rotated_overlap_bev(boxes_a, boxes_b):
    """Exact BEV intersection area of rotated rects: (A, 7) x (B, 7) -> (A, B)."""
    boxes_a = jnp.asarray(boxes_a, jnp.float32)
    boxes_b = jnp.asarray(boxes_b, jnp.float32)
    A, B = boxes_a.shape[0], boxes_b.shape[0]
    ca = boxes_to_corners_bev(boxes_a)  # (A, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (B, 4, 2)

    K = A * B
    # polygon planes (V, K), K = A-major x B-minor pair index
    pxy = jnp.broadcast_to(ca[:, None], (A, B, 4, 2)).reshape(K, 4, 2)
    px = jnp.concatenate(
        [pxy[:, :, 0].T, jnp.zeros((_MAX_VERTS - 4, K), jnp.float32)], axis=0
    )
    py = jnp.concatenate(
        [pxy[:, :, 1].T, jnp.zeros((_MAX_VERTS - 4, K), jnp.float32)], axis=0
    )
    count = jnp.full((K,), 4, jnp.int32)
    cbk = jnp.broadcast_to(cb[None], (A, B, 4, 2)).reshape(K, 4, 2)

    for e in range(4):
        a_pt = cbk[:, e]
        b_pt = cbk[:, (e + 1) % 4]
        px, py, count = _clip_halfplane_t(
            px, py, count, a_pt[:, 0], a_pt[:, 1], b_pt[:, 0], b_pt[:, 1]
        )

    area = _polygon_area_t(px, py, count).reshape(A, B)
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
