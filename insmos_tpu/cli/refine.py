"""Refinement CLI — temporal voting over predicted instances
(reference scripts/refine.py:135-302, same rules and artifact layout).

Reads predict_mos artifacts + raw scans + poses, re-assigns car points by
per-instance moving ratios, scene-level moving-car counts, and a 5-frame
pose-aligned instance track, then rewrites labels under
preb_out_refine/mos_preb. The per-point box test is the vectorized
points-in-instance op (the reference round-trips through a C++ OpenMP
extension per frame); the per-instance voting is segment arithmetic.

  python -m insmos_tpu.cli.refine --data_path <root> --split valid \
      [--pred preb_out/<ID>] [--out preb_out_refine]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..constants import to_original_labels
from ..data.kitti import lidar_poses_from_files, load_files, read_point_cloud
from ..ops.points_in_boxes import points_in_rotated_boxes_np
from ..utils.io import read_pred_labels

VALID_SEQS = [8]
TEST_SEQS = [11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]

INSTANCE_WINDOW = 5
GROUND_OFFSET = 0.03
MOVING_RATIO = 0.6
COUNT_RATIO = 0.3
CANDIDATE_RATIO = 0.001
CONFIDENCE_FRAC = 0.5
CONFIDENCE_EPS = 1e-5


def car_instance_ids(scan: np.ndarray, boxes: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """(N,) 1-indexed id of the car box containing each point (0 = none).

    Box centers lifted by GROUND_OFFSET (Array_Index.cpp:106); overlapping
    boxes resolve to the max index (deterministic tie-break, see
    ops.points_in_boxes).
    """
    if len(boxes) == 0:
        return np.zeros(len(scan), np.int32)
    lifted = boxes.copy()
    lifted[:, 2] += GROUND_OFFSET
    inside = points_in_rotated_boxes_np(scan[:, :3], lifted)  # (N, M)
    inside &= (labels == 1)[None, :]
    ids = np.where(inside, np.arange(1, len(boxes) + 1)[None, :], 0)
    return ids.max(axis=1).astype(np.int32)


def refine_sequence(seq_dir: str, pred_dir: str, out_dir: str, ss: str) -> None:
    sub = os.path.join("sequences", ss, "predictions")
    scan_paths = load_files(os.path.join(seq_dir, "velodyne"))
    bbox_paths = load_files(os.path.join(pred_dir, "bbox_preb", sub))
    mos_paths = load_files(os.path.join(pred_dir, "mos_preb", sub))
    conf_paths = load_files(os.path.join(pred_dir, "confidence", sub))
    assert len(scan_paths) == len(bbox_paths) == len(mos_paths) == len(conf_paths)
    poses = lidar_poses_from_files(
        os.path.join(seq_dir, "poses.txt"), os.path.join(seq_dir, "calib.txt")
    )
    os.makedirs(out_dir, exist_ok=True)

    # attrs per tracked frame: list of [cx, cy, cz, dx, dy, dz, flag]
    attr_window: list[list[np.ndarray]] = []

    for frame_idx in range(len(scan_paths)):
        scan = read_point_cloud(scan_paths[frame_idx])
        pred = np.load(bbox_paths[frame_idx], allow_pickle=True).item()
        boxes = np.asarray(pred["pred_boxes"], np.float64).reshape(-1, 7)
        labels = np.asarray(pred["pred_labels"]).reshape(-1)
        mos = read_pred_labels(mos_paths[frame_idx]).astype(np.int32)
        conf = np.load(conf_paths[frame_idx]).reshape(-1, 2)
        if frame_idx < 9:  # warm-up scans have no usable confidence
            conf = np.zeros((len(mos), 2))

        ids = car_instance_ids(scan, boxes, labels)

        # ---- bottom-up per-instance stats (refine.py:210-240) ----
        car_points: list[np.ndarray] = []  # point indices per kept car
        attrs: list[np.ndarray] = []  # [center(3), dims(3), flag]
        candidates: list[int] = []
        conf_candidates: list[int] = []
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

        # ---- scene-level rules (refine.py:242-259) ----
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

        # ---- 5-frame instance track (refine.py:262-296) ----
        attr_window.append(attrs)
        if frame_idx >= INSTANCE_WINDOW:
            assert len(attr_window) == INSTANCE_WINDOW + 1
            current = attr_window[-1]
            for attr in current:
                found = moving = 0
                for i in range(INSTANCE_WINDOW):
                    past_pose = poses[frame_idx - i - 1]
                    tf = np.linalg.inv(past_pose) @ poses[frame_idx]
                    ctr = attr[0:3] @ tf[:3, :3].T + tf[:3, 3]
                    for prev in attr_window[INSTANCE_WINDOW - 1 - i]:
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

            # top-down rewrite (refine.py:288-294)
            for j, attr in enumerate(current):
                if attr[-1] == 1:
                    mos[car_points[j]] = 2
                elif len(current) > 6:
                    mos[car_points[j]] = 1
            attr_window.pop(0)

        name = os.path.basename(mos_paths[frame_idx])[:6]
        to_original_labels(mos).astype(np.int32).tofile(
            os.path.join(out_dir, name + ".label")
        )


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="InsMOS-TPU refinement")
    p.add_argument("--data_path", type=str, default="demo_data")
    p.add_argument("--split", type=str, default="valid")
    p.add_argument("--pred", type=str, default="preb_out/InsMOS",
                   help="predict_mos output root incl. experiment id")
    p.add_argument("--out", type=str, default="preb_out_refine")
    p.add_argument("--sequences", type=int, nargs="*", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    seqs = args.sequences or (VALID_SEQS if args.split == "valid" else TEST_SEQS)
    for seq in seqs:
        ss = f"{int(seq):02d}"
        refine_sequence(
            os.path.join(args.data_path, ss),
            args.pred,
            os.path.join(args.out, "mos_preb", "sequences", ss, "predictions"),
            ss,
        )


if __name__ == "__main__":
    main()
