"""Data layer tests: IO parity, pose math, window assembly, augmentation."""

import os

import numpy as np
import pytest

from insmos_tpu.config import Config
from insmos_tpu.constants import (
    LEARNING_MAP_TABLE,
    map_semantic_labels,
    merge_det_class,
    to_original_labels,
)
from insmos_tpu.data import (
    KittiWindowDataset,
    lidar_poses_from_files,
    load_calib,
    load_poses,
    read_bounding_box_label,
    read_labels,
    read_point_cloud,
    transform_point_cloud,
)
from insmos_tpu.data.augment import augment_window
from insmos_tpu.data.processor import mask_boxes_outside_range, mask_points_by_range
from insmos_tpu.data.sample import make_window_sample


def test_learning_map_semantics():
    # moving family -> 2, unlabeled/outlier -> 0, rest -> 1
    assert LEARNING_MAP_TABLE[0] == 0 and LEARNING_MAP_TABLE[1] == 0
    for raw in (251, 252, 253, 254, 255, 256, 257, 258, 259):
        assert LEARNING_MAP_TABLE[raw] == 2
    for raw in (9, 10, 40, 70, 99):
        assert LEARNING_MAP_TABLE[raw] == 1
    # instance ids in upper 16 bits are masked off
    raw = np.array([251 | (7 << 16), 10, 0], dtype=np.uint32)
    np.testing.assert_array_equal(map_semantic_labels(raw), [2, 1, 0])
    np.testing.assert_array_equal(to_original_labels([0, 1, 2]), [0, 9, 251])


def test_merge_det_class():
    np.testing.assert_array_equal(
        merge_det_class(np.array([1, 3, 6, 8, 9, 10, 2, 0, 99])),
        [1, 1, 1, 2, 3, 3, 0, 0, 0],
    )


def test_pose_loading_and_transform(synthetic_root):
    seq_dir = os.path.join(synthetic_root, "08")
    poses = load_poses(os.path.join(seq_dir, "poses.txt"))
    assert poses.shape[1:] == (4, 4)
    calib = load_calib(os.path.join(seq_dir, "calib.txt"))
    assert calib.shape == (4, 4)
    lidar = lidar_poses_from_files(
        os.path.join(seq_dir, "poses.txt"), os.path.join(seq_dir, "calib.txt")
    )
    # first lidar pose is identity (first-frame origin convention)
    np.testing.assert_allclose(lidar[0], np.eye(4), atol=1e-9)
    # ego drives +x at 0.2 m per scan
    assert lidar[5][0, 3] == pytest.approx(1.0, abs=1e-6)

    # a world-fixed point seen from two frames aligns after transform
    pt_frame3 = np.array([[10.0, 2.0, -1.0]])
    aligned = transform_point_cloud(pt_frame3, lidar[3], lidar[5])
    np.testing.assert_allclose(aligned, [[10.0 - 0.4, 2.0, -1.0]], atol=1e-6)


def test_scan_and_label_io(synthetic_root):
    seq_dir = os.path.join(synthetic_root, "08")
    pts = read_point_cloud(os.path.join(seq_dir, "velodyne", "000000.bin"))
    assert pts.shape[1] == 4 and pts.dtype == np.float32
    labels = read_labels(os.path.join(seq_dir, "labels", "000000.label"))
    assert labels.shape == (pts.shape[0],)
    assert set(np.unique(labels)) <= {0, 1, 2}
    bb = read_bounding_box_label(
        os.path.join(seq_dir, "boundingbox_label", "000000.npy")
    )
    assert bb.shape[1] == 9
    assert (bb[:, 0] == 1).all()  # all cars


def test_window_dataset_shapes(synthetic_root):
    cfg = Config().tiny(points=8192)
    ds = KittiWindowDataset(cfg, "val", root_dir=synthetic_root, sequences=[8])
    assert len(ds) == 14 - 9
    s = ds[0]
    W, P = cfg.model.n_past_steps, cfg.runtime.max_points_per_scan
    assert s.points.shape == (W, P, 4)
    assert s.labels.shape == (W, P)
    assert s.scan_mask.all()
    assert (s.num_points > 0).all()
    # labels only on valid rows; moving points exist
    assert s.labels.max() == 2
    # padded rows are zero
    assert (s.points[0, s.num_points[0] :] == 0).all()


def test_window_dataset_short_window(synthetic_root):
    cfg = Config().tiny(points=8192)
    ds = KittiWindowDataset(
        cfg, "test", root_dir=synthetic_root, sequences=[8], window=3
    )
    s = ds[0]
    # 3 scans occupy the LAST 3 slots
    np.testing.assert_array_equal(s.scan_mask[:7], False)
    np.testing.assert_array_equal(s.scan_mask[7:], True)
    assert s.meta[1] == 2


def test_train_shuffle_points(synthetic_root):
    """Train-split point shuffling (reference data_processor.py:111-120):
    the voxelizer averages the FIRST max_points_per_voxel points per voxel,
    so train-time order must be randomized — and deterministic (file
    order) when DATA.SHUFFLE is off."""
    import dataclasses

    base = Config().tiny(points=8192)
    cfg_on = dataclasses.replace(
        base, train=dataclasses.replace(base.train, augmentation=False)
    )
    cfg_off = dataclasses.replace(
        cfg_on, data=dataclasses.replace(cfg_on.data, shuffle=False)
    )
    kw = dict(root_dir=synthetic_root, sequences=[8], with_labels=True)
    s_off = KittiWindowDataset(cfg_off, "train", **kw)[0]
    s_on = KittiWindowDataset(cfg_on, "train", **kw)[0]
    w = cfg_on.model.n_past_steps - 1
    n = s_off.num_points[w]
    a = s_off.points[w, :n]
    b = s_on.points[w, :n]
    assert s_on.num_points[w] == n
    # same point SET, different order when shuffling
    np.testing.assert_allclose(
        np.sort(a.view("f4").reshape(-1)), np.sort(b.view("f4").reshape(-1))
    )
    assert not np.array_equal(a, b), "train path did not shuffle points"
    # shuffle-off is deterministic (= file order after the range mask)
    s_off2 = KittiWindowDataset(cfg_off, "train", **kw)[0]
    np.testing.assert_array_equal(a, s_off2.points[w, :n])
    # labels ride the same permutation: point->label pairing is preserved
    pair_off = {tuple(p): l for p, l in zip(a[:, :3], s_off.labels[w, :n])}
    for p, l in zip(b[:, :3], s_on.labels[w, :n]):
        assert pair_off[tuple(p)] == l


def test_range_mask_xy_only():
    rng = [-60, -50, -3, 60, 50, 1]
    pts = np.array(
        [[0, 0, 100.0, 0], [100, 0, 0, 0], [0, -60, 0, 0], [59, 49, -2, 0]]
    )
    m = mask_points_by_range(pts, rng)
    # z=100 passes (x/y only); out-of-x and out-of-y fail
    np.testing.assert_array_equal(m, [True, False, False, True])


def test_box_range_mask():
    rng = [-60, -50, -3, 60, 50, 1]
    boxes = np.array(
        [
            [0, 0, 0, 4, 2, 1.5, 0.3],  # inside
            [200, 0, 0, 4, 2, 1.5, 0.0],  # fully outside
            [60.5, 0, 0, 4, 2, 1.5, 0.0],  # straddles the border -> kept
        ]
    )
    np.testing.assert_array_equal(
        mask_boxes_outside_range(boxes, rng), [True, False, True]
    )


def test_augment_window_consistency(rng):
    pts = rng.uniform(-10, 10, size=(1000, 4))
    boxes = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    # points inside the box stay inside after any flip/rot/scale
    from insmos_tpu.ops.points_in_boxes import points_in_rotated_boxes_np

    inside_before = points_in_rotated_boxes_np(pts[:, :3], boxes)
    out_pts, out_boxes = augment_window(pts.copy(), boxes.copy(), rng)
    inside_after = points_in_rotated_boxes_np(out_pts[:, :3], out_boxes)
    np.testing.assert_array_equal(inside_before, inside_after)
    # intensity untouched
    np.testing.assert_array_equal(pts[:, 3], out_pts[:, 3])


def test_make_window_sample_truncation():
    scans = [np.ones((50, 4), dtype=np.float32)]
    s = make_window_sample(scans, capacity=32, window=2)
    assert s.num_points[1] == 32
    assert s.scan_mask.tolist() == [False, True]


def test_native_fast_path_matches_numpy(synthetic_root):
    """Label-free dataset path (native loader) == generic numpy path."""
    cfg = Config().tiny(points=8192)
    ds_fast = KittiWindowDataset(
        cfg, "test", root_dir=synthetic_root, sequences=[8], with_labels=False
    )
    s_fast = ds_fast[2]
    # generic path: force with_labels then compare the raw padded points
    ds_ref = KittiWindowDataset(
        cfg, "test", root_dir=synthetic_root, sequences=[8], with_labels=False
    )
    ds_ref._getitem_native = None  # guard: call the numpy assembly manually
    from insmos_tpu.data.kitti import read_point_cloud, transform_point_cloud
    from insmos_tpu.data.sample import make_window_sample

    seq, scan_idx, past = s_fast.meta
    files = ds_fast.filenames[seq][past[0] : scan_idx + 1]
    scans = [read_point_cloud(f) for f in files]
    to_pose = ds_fast.poses[seq][past[-1]]
    for i, pts in enumerate(scans):
        pts[:, :3] = transform_point_cloud(
            pts[:, :3], ds_fast.poses[seq][past[i]], to_pose
        )
    s_np = make_window_sample(
        scans, capacity=cfg.runtime.max_points_per_scan,
        window=cfg.model.n_past_steps,
    )
    np.testing.assert_array_equal(s_fast.num_points, s_np.num_points)
    np.testing.assert_allclose(s_fast.points, s_np.points, atol=2e-5)
