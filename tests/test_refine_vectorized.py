"""Vectorized refine voting pass vs the original per-instance loop oracle
(reference scripts/refine.py:210-296 semantics) on randomized frames."""

import numpy as np

from insmos_tpu.cli.refine import (
    CANDIDATE_RATIO,
    CONFIDENCE_EPS,
    CONFIDENCE_FRAC,
    COUNT_RATIO,
    INSTANCE_WINDOW,
    MOVING_RATIO,
    refine_frame,
)


def _oracle_frame(mos, ids, boxes, labels, conf, frame_idx, attr_window6, poses):
    """Literal transcription of the loop implementation (the reference's
    control flow). attr_window6 = previous frames' attr LISTS; this fn
    appends the current frame's attrs and returns them."""
    car_points, attrs = [], []
    candidates, conf_candidates = [], []
    moving_car_num = 0
    for inst in range(len(boxes)):
        if labels[inst] != 1:
            continue
        idxs = np.flatnonzero(ids == inst + 1)
        if len(idxs) == 0:
            continue
        ratio = float((mos[idxs] == 2).sum()) / len(idxs)
        conf_frac = float((conf[idxs, 1] >= CONFIDENCE_EPS).sum()) / len(idxs)
        car_idx = len(car_points)
        car_points.append(idxs)
        attrs.append(
            np.concatenate([boxes[inst, 0:6], [1.0 if ratio > MOVING_RATIO else 0.0]])
        )
        if ratio > COUNT_RATIO:
            moving_car_num += 1
        if ratio > CANDIDATE_RATIO:
            candidates.append(car_idx)
        if conf_frac > CONFIDENCE_FRAC:
            conf_candidates.append(car_idx)

    if frame_idx != 0:
        if moving_car_num >= 3:
            for c in candidates:
                if frame_idx < INSTANCE_WINDOW:
                    mos[car_points[c]] = 2
                attrs[c][-1] = 1
        if moving_car_num >= 5:
            for c in conf_candidates:
                if frame_idx < INSTANCE_WINDOW:
                    mos[car_points[c]] = 2
                attrs[c][-1] = 1
    elif moving_car_num >= 5:
        for c in candidates:
            mos[car_points[c]] = 2
        for c in conf_candidates:
            mos[car_points[c]] = 2

    attr_window6.append(attrs)
    if frame_idx >= INSTANCE_WINDOW:
        assert len(attr_window6) == INSTANCE_WINDOW + 1
        current = attr_window6[-1]
        for attr in current:
            found = moving = 0
            for i in range(INSTANCE_WINDOW):
                tf = np.linalg.inv(poses[frame_idx - i - 1]) @ poses[frame_idx]
                ctr = attr[0:3] @ tf[:3, :3].T + tf[:3, 3]
                for prev in attr_window6[INSTANCE_WINDOW - 1 - i]:
                    if (
                        abs(ctr[0] - prev[0]) < 1
                        and abs(ctr[1] - prev[1]) < 1
                        and abs(ctr[2] - prev[2]) < 0.5
                        and abs(attr[3] - prev[3]) < 0.3
                        and abs(attr[4] - prev[4]) < 0.3
                        and abs(attr[5] - prev[5]) < 0.3
                    ):
                        found += 1
                        if prev[-1] == 1:
                            moving += 1
                        break
            if found == INSTANCE_WINDOW:
                if moving > 3:
                    attr[-1] = 1
            elif moving > 1 or (moving > 0 and moving_car_num >= 3):
                attr[-1] = 1

        for j, attr in enumerate(current):
            if attr[-1] == 1:
                mos[car_points[j]] = 2
            elif len(current) > 6:
                mos[car_points[j]] = 1
        attr_window6.pop(0)
    return attrs


def _random_frame(rng, n_pts, n_boxes):
    mos = rng.integers(0, 3, n_pts).astype(np.int32)
    # instance ids directly (skip the geometric point-in-box step — the
    # voting logic is what's under test; car_instance_ids is tested in
    # test_ops)
    ids = rng.integers(0, n_boxes + 1, n_pts).astype(np.int32)
    boxes = np.concatenate(
        [
            rng.uniform(-20, 20, (n_boxes, 2)),  # cx, cy
            rng.uniform(-2, 0, (n_boxes, 1)),  # cz
            rng.uniform(1.5, 2.2, (n_boxes, 3)) + rng.integers(0, 2, (n_boxes, 3)),
            rng.uniform(-np.pi, np.pi, (n_boxes, 1)),
        ],
        axis=1,
    )
    labels = rng.integers(1, 4, n_boxes)
    labels[: max(1, n_boxes // 2)] = 1  # plenty of cars
    conf = rng.uniform(0, 1e-4, (n_pts, 2))
    return mos, ids, boxes, labels, conf


def test_vectorized_matches_loop_oracle():
    rng = np.random.default_rng(0)
    n_frames = 12
    poses = []
    p = np.eye(4)
    for _ in range(n_frames):
        p = p.copy()
        p[:3, 3] += rng.normal(0, 0.5, 3)
        poses.append(p)

    win_vec, win_orc = [], []
    for f in range(n_frames):
        n_pts = int(rng.integers(200, 400))
        n_boxes = int(rng.integers(0, 12))
        mos, ids, boxes, labels, conf = _random_frame(rng, n_pts, n_boxes)
        # force temporal overlap: reuse similar box centers across frames
        if f > 0 and n_boxes > 0:
            boxes[:, 0:2] = (boxes[:, 0:2] * 0.05).round() + rng.integers(
                -3, 3, (n_boxes, 2)
            )
            boxes[:, 3:6] = 1.8

        mos_v = mos.copy()
        attrs_v = refine_frame(
            mos_v, ids, boxes, labels, conf, f, win_vec, poses
        )
        win_vec.append(attrs_v)
        if len(win_vec) > INSTANCE_WINDOW:
            win_vec.pop(0)

        mos_o = mos.copy()
        attrs_o = _oracle_frame(
            mos_o, ids, boxes, labels, conf, f, win_orc, poses
        )

        np.testing.assert_array_equal(mos_v, mos_o, err_msg=f"frame {f}")
        a_o = np.asarray(attrs_o).reshape(-1, 7)
        np.testing.assert_allclose(attrs_v, a_o, err_msg=f"frame {f} attrs")


def test_vectorized_scene_rules_frame0():
    rng = np.random.default_rng(3)
    # frame 0 with >=5 moving cars: candidates + conf candidates rewritten
    n_pts, n_boxes = 600, 8
    mos = np.full(n_pts, 1, np.int32)
    ids = (np.arange(n_pts) % (n_boxes + 1)).astype(np.int32)
    mos[ids >= 1] = 2  # every car fully moving
    boxes = np.zeros((n_boxes, 7))
    boxes[:, 3:6] = 2.0
    labels = np.ones(n_boxes, np.int64)
    conf = np.zeros((n_pts, 2))
    mos_v = mos.copy()
    refine_frame(mos_v, ids, boxes, labels, conf, 0, [], [np.eye(4)])
    mos_o = mos.copy()
    _oracle_frame(mos_o, ids, boxes, labels, conf, 0, [], [np.eye(4)])
    np.testing.assert_array_equal(mos_v, mos_o)
