"""KITTI odometry / SemanticKITTI-MOS IO and sliding-window dataset.

Host-side numpy. Semantics match the reference loaders:
- pose / calib parsing: reference dataloader/utils.py:10-59
- camera->LiDAR pose conversion: reference dataloader/datasets.py:276-292
- window indexing: reference dataloader/datasets.py:87-116
- pose alignment to the current frame: reference dataloader/datasets.py:205-210
- label decode: reference dataloader/datasets.py:220-233
- bounding-box label decode + class merge + fake-box rule:
  reference dataloader/datasets.py:235-265

A native C++ fast path for the hot loader ops (bin read + 4x4 transform) is
used when the extension in ``insmos_tpu.native`` is built; numpy otherwise.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from ..config import Config
from ..constants import map_semantic_labels, merge_det_class
from .augment import augment_window
from .processor import mask_boxes_outside_range, mask_points_by_range
from .sample import WindowSample, make_window_sample


# --------------------------------------------------------------------- IO
def load_files(folder: str) -> list[str]:
    """All files under `folder`, sorted (reference dataloader/utils.py:62-68)."""
    paths = [
        os.path.join(dp, f)
        for dp, _, fn in os.walk(os.path.expanduser(folder))
        for f in fn
    ]
    paths.sort()
    return paths


def load_poses(pose_path: str) -> np.ndarray:
    """(N, 4, 4) camera-frame poses from a KITTI poses.txt (12 or 16 floats/row)."""
    poses = []
    with open(pose_path) as fh:
        for line in fh:
            vals = np.fromstring(line, dtype=np.float64, sep=" ")
            if len(vals) == 12:
                mat = np.vstack([vals.reshape(3, 4), [0, 0, 0, 1]])
            elif len(vals) == 16:
                mat = vals.reshape(4, 4)
            else:
                continue
            poses.append(mat)
    return np.array(poses)


def load_calib(calib_path: str) -> np.ndarray:
    """(4, 4) T_cam_velo from the 'Tr:' line of a KITTI calib.txt."""
    with open(calib_path) as fh:
        for line in fh:
            if "Tr:" in line:
                vals = np.fromstring(line.replace("Tr:", ""), dtype=np.float64, sep=" ")
                return np.vstack([vals.reshape(3, 4), [0, 0, 0, 1]])
    raise ValueError(f"no 'Tr:' line in {calib_path}")


def lidar_poses_from_files(pose_file: str, calib_file: str) -> np.ndarray:
    """Camera poses -> LiDAR-frame poses, first frame as origin.

    T_i = T_velo_cam @ inv(P_0) @ P_i @ T_cam_velo
    (reference dataloader/datasets.py:276-292).
    """
    poses = load_poses(pose_file)
    inv_frame0 = np.linalg.inv(poses[0])
    t_cam_velo = load_calib(calib_file)
    t_velo_cam = np.linalg.inv(t_cam_velo)
    return np.array([t_velo_cam @ inv_frame0 @ p @ t_cam_velo for p in poses])


def read_point_cloud(filename: str) -> np.ndarray:
    """(N, 4) float32 x,y,z,intensity from a .bin scan."""
    return np.fromfile(filename, dtype=np.float32).reshape(-1, 4)


def read_labels(filename: str) -> np.ndarray:
    """(N,) int32 learning-class labels from a .label file (or empty)."""
    if not os.path.isfile(filename):
        return np.zeros((0,), dtype=np.int32)
    raw = np.fromfile(filename, dtype=np.uint32).reshape(-1)
    return map_semantic_labels(raw).astype(np.int32)


def read_bounding_box_label(filename: str) -> np.ndarray:
    """(M, 9) [merged_class, dynamic, x,y,z,dx,dy,dz,yaw] box labels.

    Mirrors the reference decode incl. the empty-file placeholder and the
    no-dynamic fake box (dataloader/datasets.py:235-265).
    """
    loaded = np.load(filename, allow_pickle=True)
    if len(loaded) == 0:
        loaded = [[0, 0, 1, [0.0] * 7]]
    rows = []
    any_dynamic = False
    for item in loaded:
        row = np.zeros(9, dtype=np.float64)
        row[0] = merge_det_class(np.array([item[1]]))[0]
        row[1] = item[2]
        row[2:9] = np.asarray(item[3], dtype=np.float64)[:7]
        rows.append(row)
        any_dynamic = any_dynamic or row[1] > 0
    if not any_dynamic:
        rows.append(np.array([0, 1, 0, 0, 0, 0, 0, 0, 0], dtype=np.float64))
    return np.array(rows)


def transform_point_cloud(
    xyz: np.ndarray, from_pose: np.ndarray, to_pose: np.ndarray
) -> np.ndarray:
    """Re-express points given in `from_pose`'s frame in `to_pose`'s frame."""
    tf = np.linalg.inv(to_pose) @ from_pose
    return xyz @ tf[:3, :3].T + tf[:3, 3]


# ----------------------------------------------------------------- dataset
class KittiWindowDataset:
    """Sliding-window dataset over KITTI sequences.

    Emits fixed-capacity :class:`WindowSample`s. ``split`` selects the
    sequence list from the config; ``with_labels`` controls whether MOS
    labels / gt boxes are loaded (train/val) or skipped (test inference).
    ``window`` overrides n_past_steps (used by the warm-up pass, where the
    reference rebuilds the dataset per window size; we just pass n).
    """

    def __init__(
        self,
        cfg: Config,
        split: str,
        root_dir: str | None = None,
        with_labels: bool | None = None,
        window: int | None = None,
        sequences: list[int] | None = None,
        cache=None,
    ):
        from .loader import ScanCache

        # consecutive windows share 9/10 scans; the cache turns the repeat
        # reads into memory copies (reference parallelism: 4 DataLoader
        # workers, models/models.py:216)
        self.cache = cache if cache is not None else ScanCache()
        self.cfg = cfg
        self.split = split
        self.root_dir = root_dir or os.environ.get("DATA", "")
        self.training = split == "train"
        if with_labels is None:
            with_labels = split in ("train", "val")
        self.with_labels = with_labels
        self.window = window or cfg.model.n_past_steps
        # model input always has n_past_steps slots; shorter windows fill a suffix
        self.slots = cfg.model.n_past_steps
        if sequences is None:
            sequences = {
                "train": cfg.data.split_train,
                "val": cfg.data.split_val,
                "test": cfg.data.split_test,
            }[split]
        self.sequences = list(sequences)
        self.augment = cfg.train.augmentation and self.training
        skip = round(cfg.model.delta_t_prediction / cfg.data.delta_t_data)
        self.skip = max(1, skip)

        self.filenames: dict[int, list[str]] = {}
        self.poses: dict[int, np.ndarray] = {}
        self.index: list[tuple[int, int]] = []  # (seq, current scan idx)
        for seq in self.sequences:
            seq_dir = os.path.join(self.root_dir, f"{int(seq):02d}")
            self.filenames[seq] = load_files(os.path.join(seq_dir, "velodyne"))
            if cfg.data.transform:
                self.poses[seq] = lidar_poses_from_files(
                    os.path.join(seq_dir, cfg.data.poses_file),
                    os.path.join(seq_dir, "calib.txt"),
                )
                assert len(self.poses[seq]) == len(self.filenames[seq])
            n_samples = max(
                0, len(self.filenames[seq]) - self.skip * (self.window - 1)
            )
            for k in range(n_samples):
                self.index.append((seq, self.skip * (self.window - 1) + k))

    def __len__(self) -> int:
        return len(self.index)

    def _seq_dir(self, seq: int) -> str:
        return os.path.join(self.root_dir, f"{int(seq):02d}")

    def __getitem__(self, idx: int) -> WindowSample:
        seq, scan_idx = self.index[idx]
        from_idx = scan_idx - self.skip * (self.window - 1)
        past_indices = list(range(from_idx, scan_idx + 1, self.skip))
        files = self.filenames[seq][from_idx : scan_idx + 1 : self.skip]

        if not self.with_labels and not self.augment:
            return self._getitem_native(seq, scan_idx, past_indices, files)

        scans = [
            self.cache.get((f, "pc"), lambda f=f: read_point_cloud(f))
            for f in files
        ]
        if self.cfg.data.transform:
            to_pose = self.poses[seq][past_indices[-1]]
            for i, pts in enumerate(scans):
                pts[:, :3] = transform_point_cloud(
                    pts[:, :3], self.poses[seq][past_indices[i]], to_pose
                )

        gt_boxes = None
        labels = None
        if self.with_labels:
            bb = read_bounding_box_label(
                os.path.join(
                    self._seq_dir(seq), "boundingbox_label", f"{scan_idx:06d}.npy"
                )
            )
            gt_boxes = np.zeros((len(bb), 8), dtype=np.float64)
            gt_boxes[:, 0:7] = bb[:, 2:9]
            gt_boxes[:, 7] = bb[:, 0]

            labels = [
                self.cache.get(
                    (os.path.join(self._seq_dir(seq), "labels", f"{i:06d}.label"), "lab"),
                    lambda i=i: read_labels(
                        os.path.join(self._seq_dir(seq), "labels", f"{i:06d}.label")
                    ),
                )
                for i in past_indices
            ]

        if self.augment and gt_boxes is not None:
            counts = [len(s) for s in scans]
            allpts = np.concatenate(scans, axis=0)
            allpts, boxes7 = augment_window(allpts, gt_boxes[:, 0:7].copy())
            gt_boxes[:, 0:7] = boxes7
            scans = list(np.split(allpts, np.cumsum(counts)[:-1]))

        if self.with_labels:
            # per-scan x/y range mask (+ shuffle when training), labels ride along
            kept_scans, kept_labels = [], []
            rng = self.cfg.data.point_cloud_range
            for pts, lab in zip(scans, labels):
                m = mask_points_by_range(pts, rng)
                pts, lab = pts[m], (lab[m] if len(lab) == len(m) else lab)
                if self.training and self.cfg.data.shuffle:
                    perm = np.random.permutation(len(pts))
                    pts, lab = pts[perm], lab[perm]
                kept_scans.append(pts)
                kept_labels.append(lab)
            scans, labels = kept_scans, kept_labels
            if self.training and gt_boxes is not None and len(gt_boxes):
                gm = mask_boxes_outside_range(gt_boxes[:, 0:7], rng)
                gt_boxes = gt_boxes[gm]

        return make_window_sample(
            scans,
            capacity=self.cfg.runtime.max_points_per_scan,
            window=self.slots,
            labels=labels,
            gt_boxes=gt_boxes,
            max_boxes=self.cfg.model.head.max_objs,
            meta=(seq, scan_idx, past_indices),
        )

    def _getitem_native(self, seq, scan_idx, past_indices, files) -> WindowSample:
        """Label-free fast path: parallel native read + pose-align straight
        into the padded window buffer (numpy fallback inside)."""
        from .. import native

        cap = self.cfg.runtime.max_points_per_scan
        n = len(files)
        if self.cfg.data.transform:
            to_pose = self.poses[seq][past_indices[-1]]
            inv_to = np.linalg.inv(to_pose)
            tfs = np.stack(
                [inv_to @ self.poses[seq][i] for i in past_indices]
            ).astype(np.float32)
        else:
            tfs = np.stack([np.eye(4, dtype=np.float32)] * n)
        buf, counts = native.load_window(files, tfs, cap)

        W = self.slots
        points = np.zeros((W, cap, 4), np.float32)
        num_points = np.zeros((W,), np.int32)
        scan_mask = np.zeros((W,), bool)
        points[W - n :] = buf
        num_points[W - n :] = counts
        scan_mask[W - n :] = True
        return WindowSample(
            points=points,
            num_points=num_points,
            scan_mask=scan_mask,
            labels=np.zeros((W, cap), np.int32),
            gt_boxes=np.zeros((self.cfg.model.head.max_objs, 8), np.float32),
            num_boxes=np.int32(0),
            meta=(seq, scan_idx, past_indices),
        )
