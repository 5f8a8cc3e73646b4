"""Device ops vs brute-force numpy oracles: IoU, NMS, points-in-boxes, gaussians."""

import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.ops.gaussian import gaussian_radius, splat_gaussians
from insmos_tpu.ops.iou3d import (
    boxes_iou3d,
    boxes_iou_bev,
    boxes_to_corners_bev,
    rotated_overlap_bev,
)
from insmos_tpu.ops.nms import greedy_nms, greedy_nms_chunked
from insmos_tpu.ops.points_in_boxes import (
    box_class_features,
    points_in_instance_boxes,
    points_in_rotated_boxes,
    points_in_rotated_boxes_np,
)


# ----------------------------------------------------------------- oracles
def _mc_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo BEV intersection area oracle."""
    rng = np.random.default_rng(seed)
    corners = np.asarray(boxes_to_corners_bev(jnp.asarray([box_a, box_b])))
    lo = corners.reshape(-1, 2).min(0)
    hi = corners.reshape(-1, 2).max(0)
    pts = rng.uniform(lo, hi, size=(n, 2))
    pts3 = np.hstack([pts, np.zeros((n, 1))])
    in_a = points_in_rotated_boxes_np(pts3, np.array([box_a]))[:, 0]
    in_b = points_in_rotated_boxes_np(pts3, np.array([box_b]))[:, 0]
    area_box = np.prod(hi - lo)
    return (in_a & in_b).mean() * area_box


def _np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
    return keep


def _rand_boxes(rng, n, z=True):
    out = np.zeros((n, 7))
    out[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    out[:, 2] = rng.uniform(-1, 1, n) if z else 0.0
    out[:, 3:5] = rng.uniform(0.5, 6.0, (n, 2))
    out[:, 5] = rng.uniform(0.5, 3.0, n)
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


# -------------------------------------------------------------------- IoU
@pytest.mark.slow
def test_overlap_identity():
    box = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.7]])
    ov = np.asarray(rotated_overlap_bev(jnp.asarray(box), jnp.asarray(box)))
    assert ov[0, 0] == pytest.approx(8.0, rel=1e-5)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(box), jnp.asarray(box)))
    assert iou[0, 0] == pytest.approx(1.0, rel=1e-5)


def test_overlap_disjoint_and_axis_aligned():
    a = np.array([[0.0, 0.0, 0, 2.0, 2.0, 1, 0.0]])
    b = np.array([[10.0, 0.0, 0, 2.0, 2.0, 1, 0.0]])
    assert float(rotated_overlap_bev(a, b)[0, 0]) == pytest.approx(0.0, abs=1e-6)
    # half-shifted axis-aligned squares: overlap = 1*2 = 2
    c = np.array([[1.0, 0.0, 0, 2.0, 2.0, 1, 0.0]])
    assert float(rotated_overlap_bev(a, c)[0, 0]) == pytest.approx(2.0, rel=1e-5)


def test_overlap_rotated_45():
    # unit square vs itself rotated 45deg: intersection is a regular octagon
    a = np.array([[0.0, 0.0, 0, 1.0, 1.0, 1, 0.0]])
    b = np.array([[0.0, 0.0, 0, 1.0, 1.0, 1, np.pi / 4]])
    expected = 2 * (np.sqrt(2) - 1)  # 0.8284...
    assert float(rotated_overlap_bev(a, b)[0, 0]) == pytest.approx(expected, rel=1e-5)


def test_overlap_monte_carlo(rng):
    boxes = _rand_boxes(rng, 12)
    for i in range(0, 12, 2):
        a, b = boxes[i], boxes[i + 1]
        got = float(rotated_overlap_bev(a[None], b[None])[0, 0])
        mc = _mc_overlap(a, b)
        assert got == pytest.approx(mc, abs=max(0.08, 0.05 * max(mc, 1)))


def test_iou3d_z_overlap():
    a = np.array([[0, 0, 0.0, 2, 2, 2, 0.0]])
    b = np.array([[0, 0, 1.0, 2, 2, 2, 0.0]])  # half z-overlap
    inter = 2 * 2 * 1.0
    union = 8 + 8 - inter
    assert float(boxes_iou3d(a, b)[0, 0]) == pytest.approx(inter / union, rel=1e-5)


def test_overlap_degenerate_padding():
    a = np.array([[0, 0, 0, 2, 2, 1, 0.0]])
    pad = np.zeros((1, 7))
    assert float(rotated_overlap_bev(a, pad)[0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert float(boxes_iou_bev(a, pad)[0, 0]) == pytest.approx(0.0, abs=1e-6)


# -------------------------------------------------------------------- NMS
@pytest.mark.slow
def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 64
        boxes = _rand_boxes(np.random.default_rng(trial), n)
        scores = np.random.default_rng(100 + trial).uniform(0.01, 1.0, n)
        # unique scores so ordering is unambiguous
        scores = np.sort(scores)[::-1].copy()
        rngp = np.random.default_rng(trial)
        perm = rngp.permutation(n)
        boxes, scores = boxes[perm], scores[perm]
        expected = _np_greedy_nms(boxes, scores, 0.1)
        keep_idx, keep_mask = greedy_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.1, n
        )
        got = np.asarray(keep_idx)[np.asarray(keep_mask)]
        np.testing.assert_array_equal(got, expected)


@pytest.mark.slow
def test_nms_chunked_matches_oracle(rng):
    """The chunked bitmask form implements the same suppress-by-earlier-
    keeper greedy as the while-loop form and the numpy oracle — exercised
    past one chunk (n > 128) so cross-chunk suppression and the early-exit
    cond both run."""
    for trial in range(3):
        n = 300
        boxes = _rand_boxes(np.random.default_rng(trial), n)
        scores = np.sort(
            np.random.default_rng(50 + trial).uniform(0.01, 1.0, n)
        )[::-1].copy()
        perm = np.random.default_rng(trial).permutation(n)
        boxes, scores = boxes[perm], scores[perm]
        expected = _np_greedy_nms(boxes, scores, 0.1)
        keep_idx, keep_mask = greedy_nms_chunked(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.1, n
        )
        got = np.asarray(keep_idx)[np.asarray(keep_mask)]
        np.testing.assert_array_equal(got, expected)


def test_nms_chunked_respects_valid_and_max_out():
    boxes = np.tile(np.array([[0.0, 0, 0, 2, 2, 1, 0]]), (8, 1))
    boxes[:, 0] = np.arange(8) * 10.0
    scores = np.linspace(1, 0.3, 8)
    valid = np.array([True, False] * 4)
    keep_idx, keep_mask = greedy_nms_chunked(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.01, 3
    )
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    np.testing.assert_array_equal(got, [0, 2, 4])


def test_nms_respects_valid_and_max_out():
    boxes = np.tile(np.array([[0.0, 0, 0, 2, 2, 1, 0]]), (8, 1))
    boxes[:, 0] = np.arange(8) * 10.0  # all disjoint
    scores = np.linspace(1, 0.3, 8)
    valid = np.array([True, False] * 4)
    keep_idx, keep_mask = greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.01, 3
    )
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    np.testing.assert_array_equal(got, [0, 2, 4])  # only valid, capped at 3


# --------------------------------------------------------- points in boxes
def test_points_in_boxes_vs_oracle(rng):
    pts = rng.uniform(-12, 12, size=(500, 3))
    boxes = _rand_boxes(rng, 20)
    got = np.asarray(points_in_rotated_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    exp = points_in_rotated_boxes_np(pts, boxes)
    np.testing.assert_array_equal(got, exp)


def test_box_class_features(rng):
    pts = rng.uniform(-5, 5, size=(200, 3))
    boxes = np.zeros((3, 8))
    boxes[:, 3:6] = [4, 4, 4]
    boxes[0, :3] = [-3, -3, 0]
    boxes[1, :3] = [3, 3, 0]
    boxes[2, :3] = [0, 0, 0]
    boxes[:, 7] = [1, 2, 0]  # car, pedestrian, ignored class
    feat = np.asarray(box_class_features(jnp.asarray(pts), jnp.asarray(boxes), 3))
    inside = points_in_rotated_boxes_np(pts, boxes)
    np.testing.assert_array_equal(feat[:, 0], inside[:, 0].astype(float))
    np.testing.assert_array_equal(feat[:, 1], inside[:, 1].astype(float))
    np.testing.assert_array_equal(feat[:, 2], 0.0)  # class 0 ignored


def test_points_in_instance_boxes_ids_and_ground_offset():
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.95], [5.0, 5.0, 0.0]])
    boxes = np.zeros((2, 8))
    boxes[0] = [0, 0, 0, 2, 2, 2, 0, 1]
    boxes[1] = [5, 5, 0, 2, 2, 2, 0, 1]
    ids = np.asarray(
        points_in_instance_boxes(jnp.asarray(pts), jnp.asarray(boxes), 3, 0.1)
    )
    # centers lifted by 0.1: point at z=-0.95 falls below box 0 (z in [-0.9, 1.1])
    np.testing.assert_array_equal(ids[:, 0], [1, 0, 2])
    np.testing.assert_array_equal(ids[:, 1], 0)
    # overlapping same-class boxes -> max id (deterministic tie-break)
    boxes[1] = [0, 0, 0, 2, 2, 2, 0, 1]
    ids = np.asarray(
        points_in_instance_boxes(jnp.asarray(pts), jnp.asarray(boxes), 3, 0.0)
    )
    assert ids[0, 0] == 2


# ---------------------------------------------------------------- gaussian
def _np_gaussian_radius(h, w, overlap):
    a1, b1 = 1, h + w
    c1 = w * h * (1 - overlap) / (1 + overlap)
    r1 = (b1 + np.sqrt(b1**2 - 4 * a1 * c1)) / 2
    a2, b2, c2 = 4, 2 * (h + w), (1 - overlap) * w * h
    r2 = (b2 + np.sqrt(b2**2 - 4 * a2 * c2)) / 2
    a3, b3 = 4 * overlap, -2 * overlap * (h + w)
    c3 = (overlap - 1) * w * h
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / (2 * a3)
    return min(r1, r2, r3)


def test_gaussian_radius_matches_reference_formula(rng):
    for _ in range(20):
        h, w = rng.uniform(1, 40, 2)
        got = float(gaussian_radius(jnp.float32(h), jnp.float32(w), 0.1))
        assert got == pytest.approx(_np_gaussian_radius(h, w, 0.1), rel=1e-4)


def _np_splat(shape, centers, radii, cls, valid):
    C, H, W = shape
    heat = np.zeros(shape, np.float32)
    for (x, y), r, c, v in zip(centers, radii, cls, valid):
        if not v:
            continue
        d = 2 * r + 1
        sigma = d / 6
        yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
        g = np.exp(-(xx * xx + yy * yy) / (2 * sigma * sigma))
        g[g < np.finfo(np.float32).eps * g.max()] = 0
        left, right = min(x, r), min(W - x, r + 1)
        top, bottom = min(y, r), min(H - y, r + 1)
        if min(right + left, bottom + top) <= 0 or not (0 <= x < W and 0 <= y < H):
            continue
        patch = heat[c, y - top : y + bottom, x - left : x + right]
        np.maximum(
            patch, g[r - top : r + bottom, r - left : r + right], out=patch
        )
    return heat


def test_splat_gaussians_matches_loop_oracle(rng):
    C, H, W = 3, 40, 50
    M = 12
    centers = rng.integers(-3, [W + 3, H + 3], size=(M, 2)).astype(np.int32)
    radii = rng.integers(2, 9, size=M).astype(np.int32)
    cls = rng.integers(0, C, size=M).astype(np.int32)
    valid = rng.random(M) > 0.2
    # clip oracle centers like the reference: skip out-of-map centers entirely
    oracle_valid = valid & (centers[:, 0] >= 0) & (centers[:, 0] < W)
    oracle_valid &= (centers[:, 1] >= 0) & (centers[:, 1] < H)
    got = np.asarray(
        splat_gaussians(
            (C, H, W),
            jnp.asarray(centers),
            jnp.asarray(radii),
            jnp.asarray(cls),
            jnp.asarray(oracle_valid),
            max_radius=15,
        )
    )
    exp = _np_splat((C, H, W), centers, radii, cls, oracle_valid)
    np.testing.assert_allclose(got, exp, atol=1e-6)
