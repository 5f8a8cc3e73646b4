"""HDL-64E raycast scan generator — the realistic synthetic fixture.

No real KITTI data ships with this repo, so capacity/span/overflow sizing
needs a generator that reproduces the *structural* statistics of the
reference's input regime (Velodyne HDL-64E scans, pose-aligned into
10-scan windows — reference dataloader/datasets.py:199-210) rather than
i.i.d. point noise. This module raycasts the actual sensor geometry:

- 64 beams at elevations +2.0 deg .. -24.9 deg (HDL-64E S2 vertical FOV),
  ~2048 azimuth steps per revolution at 10 Hz, sensor 1.73 m above ground
  (KITTI mounting height) — so points lie on scan rings whose ground-ring
  spacing grows quadratically with range (the 1/r^2 density falloff real
  scans have), and voxel ROWS along x carry the run-length structure the
  span engine's plans are sized against.
- A static world of walls and pillars plus car-sized moving boxes; rays
  return the nearest surface, so obstacles cast occlusion shadows and
  moving objects punch holes that shift scan to scan (real windows'
  union-site growth comes from exactly this).
- Beam dropouts (no return above the horizon / beyond max range) land the
  per-scan point count in the ~110-125k range of real KITTI scans.

Published anchors for the validation test (tests/test_hdl64_fixture.py):
HDL-64E: 64 lasers, ~1.3M points/s -> ~130k/rev at 10 Hz, vertical FOV
+2 .. -24.9 deg; KITTI odometry scans average ~120k points. The generator
is validated against derived occupancy statistics (points in crop,
occupied 0.1 m voxels per scan vs the reference's 100k PointToVoxel cap —
models/models.py:287 — and window union sites vs config capacities).
"""

from __future__ import annotations

import numpy as np

N_BEAMS = 64
N_AZIMUTH = 2048
SENSOR_HEIGHT = 1.73  # m above ground (KITTI mounting)
ELEV_HI = np.deg2rad(2.0)
ELEV_LO = np.deg2rad(-24.9)
MAX_RANGE = 80.0


def _make_world(rng: np.random.Generator, n_walls=18, n_pillars=110, n_cars=5):
    """Static world in a fixed odometry frame, ground z = 0.

    walls: (M, 5) [x0, y0, x1, y1, height] vertical rectangles.
    pillars: (K, 4) [cx, cy, radius, height] vertical cylinders
             (poles, trunks, bushes).
    cars: (J, 7) [cx, cy, vx, vy, half_l, half_w, height] moving boxes
          modeled as cylinders of radius ~half diagonal for raycast
          simplicity; vx, vy in m per scan step.
    """
    walls = []
    for _ in range(n_walls):
        # building facades roughly parallel to the road (x axis)
        side = rng.choice([-1.0, 1.0])
        y0 = side * rng.uniform(8.0, 42.0)
        x0 = rng.uniform(-70.0, 40.0)
        length = rng.uniform(8.0, 35.0)
        ang = rng.normal(0.0, 0.12)
        x1 = x0 + length * np.cos(ang)
        y1 = y0 + length * np.sin(ang)
        h = rng.uniform(3.0, 12.0)
        walls.append([x0, y0, x1, y1, h])
    pillars = np.stack(
        [
            rng.uniform(-70, 70, n_pillars),
            rng.uniform(-45, 45, n_pillars),
            rng.uniform(0.08, 0.9, n_pillars),
            rng.uniform(0.8, 7.0, n_pillars),
        ],
        axis=-1,
    )
    # traffic on lanes parallel to the road (x axis), mostly 10-60 m out —
    # real scans' moving-point fraction is a few percent
    cars = np.stack(
        [
            rng.uniform(-55, 65, n_cars),
            rng.choice([-1.0, 1.0], n_cars) * rng.uniform(2.5, 9.0, n_cars),
            rng.choice([-1.0, 1.0], n_cars) * rng.uniform(0.8, 1.8, n_cars),
            rng.uniform(-0.1, 0.1, n_cars),
            np.full(n_cars, 2.2),
            np.full(n_cars, 0.9),
            np.full(n_cars, 1.6),
        ],
        axis=-1,
    )
    return np.asarray(walls, np.float64), pillars, cars


def raycast_scan(
    world, ego_xy: np.ndarray, t_step: int, rng: np.random.Generator
):
    """One revolution from sensor at (ego_xy, ground + SENSOR_HEIGHT).

    Returns (points (N, 4) float32 in the SENSOR frame (world-aligned
    orientation), moving_mask (N,) bool). N varies (dropped no-returns).
    """
    walls, pillars, cars = world
    az = (np.arange(N_AZIMUTH) + 0.5) / N_AZIMUTH * 2 * np.pi - np.pi
    el = np.linspace(ELEV_HI, ELEV_LO, N_BEAMS)
    cos_az, sin_az = np.cos(az), np.sin(az)  # (A,)

    # --- 2D horizontal range to each obstacle per azimuth ray ----------
    o = np.asarray(ego_xy, np.float64)
    d = np.stack([cos_az, sin_az], -1)  # (A, 2)

    r2d = np.full((N_AZIMUTH,), np.inf)
    kind = np.zeros((N_AZIMUTH,), np.int8)  # 0 none, 1 wall, 2 pillar, 3 car
    htop = np.zeros((N_AZIMUTH,))  # obstacle top height at the hit

    # walls: segment intersection o + r d = p0 + s (p1 - p0), s in [0, 1]
    p0 = walls[:, 0:2] - o[None]
    e = walls[:, 2:4] - walls[:, 0:2]  # (M, 2)
    denom = d[:, None, 0] * (-e[None, :, 1]) - d[:, None, 1] * (-e[None, :, 0])
    denom = np.where(np.abs(denom) < 1e-9, np.nan, denom)
    rr = (p0[None, :, 0] * (-e[None, :, 1]) - p0[None, :, 1] * (-e[None, :, 0])) / denom
    ss = (d[:, None, 0] * p0[None, :, 1] - d[:, None, 1] * p0[None, :, 0]) / denom
    ok = (rr > 0.5) & (ss >= 0) & (ss <= 1) & np.isfinite(rr)
    rr = np.where(ok, rr, np.inf)
    iw = np.argmin(rr, axis=1)
    rw = rr[np.arange(N_AZIMUTH), iw]
    hit = rw < r2d
    r2d = np.where(hit, rw, r2d)
    kind = np.where(hit, 1, kind)
    htop = np.where(hit, walls[iw, 4], htop)

    # pillars + cars as circles: |o + r d - c| = R
    circles = [
        (pillars[:, 0:2], pillars[:, 2], pillars[:, 3], 2),
        (
            cars[:, 0:2] + t_step * cars[:, 2:4],
            np.hypot(cars[:, 4], cars[:, 5]) * 0.8,
            cars[:, 6],
            3,
        ),
    ]
    for cxy, rad, hgt, kd in circles:
        pc = cxy - o[None]  # (K, 2)
        b = d @ pc.T  # (A, K) projection
        c2 = (pc * pc).sum(-1)[None] - rad[None] ** 2
        disc = b * b - c2
        rr = b - np.sqrt(np.maximum(disc, 0.0))
        ok = (disc > 0) & (rr > 0.5)
        rr = np.where(ok, rr, np.inf)
        ik = np.argmin(rr, axis=1)
        rk = rr[np.arange(N_AZIMUTH), ik]
        hit = rk < r2d
        r2d = np.where(hit, rk, r2d)
        kind = np.where(hit, kd, kind)
        htop = np.where(hit, hgt[ik], htop)

    # --- per-beam ranges -------------------------------------------------
    tan_el = np.tan(el)[:, None]  # (B, 1)
    cos_el = np.cos(el)[:, None]
    # horizontal range at which the beam reaches the obstacle's top
    r_obst = r2d[None, :] / np.maximum(cos_el, 1e-6)  # slant range
    z_at_obst = SENSOR_HEIGHT + r2d[None, :] * tan_el
    hits_obst = (
        np.isfinite(r2d)[None, :]
        & (z_at_obst >= 0.0)
        & (z_at_obst <= htop[None, :])
    )
    # ground return where the beam passes over/misses the obstacle
    r_ground_h = np.where(
        tan_el < -1e-4, -SENSOR_HEIGHT / tan_el, np.inf
    )  # horizontal range
    r_ground = r_ground_h / np.maximum(cos_el, 1e-6)
    ground_blocked = np.isfinite(r2d)[None, :] & (r_ground_h > r2d[None, :])
    hits_ground = np.isfinite(r_ground) & ~ground_blocked & ~hits_obst

    slant = np.where(hits_obst, r_obst, np.where(hits_ground, r_ground, np.inf))
    valid = np.isfinite(slant) & (slant < MAX_RANGE / np.maximum(cos_el, 1e-6))

    # --- to cartesian ----------------------------------------------------
    b_i, a_i = np.nonzero(valid)
    is_obst = hits_obst[b_i, a_i]
    # rough surfaces: facades/bushes scatter more than the 1.5 cm sensor
    # noise floor (real scans' clutter spreads hits over 2-3 voxels)
    sigma = np.where(is_obst, 0.06, 0.02)
    r = slant[valid] + rng.normal(0, 1.0, b_i.shape[0]) * sigma
    ce, se = np.cos(el[b_i]), np.sin(el[b_i])
    x = r * ce * cos_az[a_i]
    y = r * ce * sin_az[a_i]
    z = r * se  # sensor frame: ground returns land near z = -1.73
    # gentle terrain undulation (real roads are not planes): smooth +-25 cm
    # height field added to ground returns only
    gx, gy = x + ego_xy[0], y + ego_xy[1]
    terrain = 0.14 * np.sin(0.041 * gx + 1.1) + 0.11 * np.sin(
        0.033 * gy - 0.6
    ) + 0.06 * np.sin(0.021 * (gx + gy))
    z = np.where(is_obst, z, z + terrain)
    pts = np.stack([x, y, z, rng.uniform(0, 1, len(x))], -1).astype(np.float32)
    moving = (kind[a_i] == 3) & hits_obst[b_i, a_i]
    return pts, moving


def make_hdl64_window(cfg, seed: int = 0, n_scans: int | None = None):
    """Drop-in replacement for bench.make_window: a pose-aligned window of
    raycast HDL-64E scans (aligned to the LAST scan's frame, fixed world
    orientation — the generator's ego translates without turning, so
    aligned == translated, matching the fixed-frame deployment mode).

    Returns the bench/pipeline sample dict; points are in the CURRENT
    (last) scan's frame like the reference's window assembly
    (dataloader/datasets.py:148-156).
    """
    rng = np.random.default_rng(seed)
    W = n_scans or cfg.model.n_past_steps
    P = cfg.runtime.max_points_per_scan
    world = _make_world(rng)
    ego_speed = np.array([1.1, 0.05])  # m per scan step (~11 m/s at 10 Hz)

    pts = np.zeros((W, P, 4), np.float32)
    num = np.zeros((W,), np.int32)
    labels = np.zeros((W, P), np.int32)
    ego_cur = ego_speed * (W - 1)
    for w in range(W):
        ego = ego_speed * w
        scan, moving = raycast_scan(world, ego, w, rng)
        # align to the current (last) frame: fixed orientation, translate
        # (z already in the sensor frame: ground near z = -1.73)
        scan = scan.copy()
        scan[:, :2] += (ego - ego_cur)[None].astype(np.float32)
        n = min(len(scan), P)
        sel = rng.permutation(len(scan))[:n]
        pts[w, :n] = scan[sel]
        labels[w, :n] = np.where(moving[sel], 2, 1)
        num[w] = n
    return {
        "points": pts,
        "num_points": num,
        "scan_mask": np.ones((W,), bool),
        "labels": labels,
        "gt_boxes": np.zeros((cfg.model.head.max_objs, 8), np.float32),
        "num_boxes": np.int32(0),
    }
