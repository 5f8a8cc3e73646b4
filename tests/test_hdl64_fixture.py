"""Validation of the HDL-64E raycast fixture (insmos_tpu/data/hdl64.py).

Anchors the generator to published sensor/dataset statistics so the
capacities and span plans sized against it are de-risked for real data
(VERDICT round-2 missing #4):
- HDL-64E: 64 beams, ~1.3M pts/s -> ~130k points/rev at 10 Hz; KITTI
  odometry scans average ~120k points.
- The reference voxelizes the current scan at 0.1 m into <= 100k voxels
  (models/models.py:287) — real scans sit well under that cap.
- Pose-aligned windows share static structure: the 10-scan 3D union is a
  small multiple of one scan's occupancy (the slab engine's design
  premise, sparse/slab.py docstring).
"""

from __future__ import annotations

import numpy as np
import pytest

from insmos_tpu.config import Config
from insmos_tpu.data.hdl64 import make_hdl64_window


@pytest.fixture(scope="module")
def window():
    cfg = Config()
    return cfg, make_hdl64_window(cfg, seed=0)


def test_scan_scale_matches_hdl64(window):
    cfg, s = window
    num = s["num_points"]
    assert (num >= 100_000).all() and (num <= 131_072).all(), num
    W, P = s["points"].shape[:2]
    cur = s["points"][W - 1][: num[W - 1]]
    r = cfg.data.point_cloud_range
    inc = (
        (cur[:, 0] >= r[0]) & (cur[:, 0] < r[3])
        & (cur[:, 1] >= r[1]) & (cur[:, 1] < r[4])
        & (cur[:, 2] >= r[2]) & (cur[:, 2] < r[5])
    )
    assert inc.sum() >= 90_000  # most returns land inside the model crop
    # ring structure: ground points near z=-1.73, range density decays
    gz = cur[inc, 2]
    ground_frac = float((gz < -1.3).mean())
    assert 0.35 <= ground_frac <= 0.9, ground_frac


def test_voxel_occupancy_in_reference_regime(window):
    cfg, s = window
    W = s["points"].shape[0]
    num = s["num_points"]
    cur = s["points"][W - 1][: num[W - 1]]
    r = np.asarray(cfg.data.point_cloud_range)
    c = np.floor((cur[:, :3] - r[:3]) / 0.1).astype(np.int64)
    gx, gy, gz = cfg.data.grid_size
    ok = (
        (c >= 0).all(1) & (c[:, 0] < gx) & (c[:, 1] < gy) & (c[:, 2] < gz)
    )
    k = (c[ok, 2] * gy + c[ok, 1]) * gx + c[ok, 0]
    occ = len(np.unique(k))
    # real KITTI scans: tens of thousands of voxels, under the 100k cap
    assert 30_000 <= occ <= 100_000, occ


def test_window_union_within_capacities(window):
    cfg, s = window
    mc = cfg.model.motionnet
    W = s["points"].shape[0]
    num = s["num_points"]
    allpts = np.concatenate(
        [s["points"][w][: num[w], :3] for w in range(W)]
    )
    lo = np.asarray(mc.crop_range[:3])
    dims = mc.grid_size
    c = np.floor((allpts - lo) / 0.1).astype(np.int64)
    ok = ((c >= 0) & (c < np.asarray(dims))).all(1)
    c = c[ok]
    k = (c[:, 2] * dims[1] + c[:, 1]) * dims[0] + c[:, 0]
    union = len(np.unique(k))
    cap = mc.site_capacities[0]
    # the aligned window's 3D union must fit the stem capacity with real
    # headroom (>= 15%), and union/single-scan must show static sharing
    assert union * 1.15 <= cap, (union, cap)
    assert union >= 150_000  # non-trivial: several scans' worth of sites


def test_moving_objects_present(window):
    cfg, s = window
    W = s["points"].shape[0]
    lab = s["labels"][W - 1][: s["num_points"][W - 1]]
    frac = float((lab == 2).mean())
    assert 0.005 <= frac <= 0.25, frac


@pytest.mark.slow
def test_span_plans_zero_overflow_at_full_scale():
    """Plan-level coverage gate on the realistic fixture: the stem span
    plan (the hot one sized to p99 intervals) must certify zero dropped
    contributions on raycast ring-structured data, not just on the old
    gaussian generator (VERDICT round-2 #8)."""
    import jax.numpy as jnp

    from insmos_tpu.sparse.slab import build_slab
    from insmos_tpu.sparse.span_conv import make_span_plan

    cfg = Config()
    mc = cfg.model.motionnet
    s = make_hdl64_window(cfg, seed=0)
    W, P = s["points"].shape[:2]
    pv = (
        np.arange(P)[None, :] < s["num_points"][:, None]
    ) & s["scan_mask"][:, None]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    pts = jnp.asarray(s["points"])
    coords3 = jnp.floor(
        (pts[..., :3].reshape(W * P, 3) - lo) * 10.0
    ).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(W * P)
    slab, _, n_sites, n_drop = build_slab(
        coords3, tcol, jnp.asarray(pv.reshape(W * P)), mc.grid_size, W,
        mc.site_capacities[0],
    )
    assert int(n_drop) == 0
    assert int(n_sites) * 1.1 < mc.site_capacities[0]
    # budgets = the DEPLOYED full-window stem plan's (minkunet4d.py
    # motionnet_forward reqs: slots=12288, gwin=64, pairs=4096) — the test
    # certifies the parameters the model actually runs with. (Smaller
    # budgets leave a counted residual — e.g. 45 rows at gwin=32 — which
    # the bench gate would catch; that is the counter working, not a bug.)
    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, (5, 5, 5),
        in_dims=mc.grid_size, span=256, slots=12288, gwin=64, pairs=4096,
    )
    assert int(plan.n_overflow) == 0, int(plan.n_overflow)
