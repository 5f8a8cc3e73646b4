"""Inference CLI — reference scripts/predict_mos.py with identical flags and
artifact layout.

  python -m insmos_tpu.cli.predict_mos --ckpt <dir> --data_path <root> \
      --split valid|test [--sequences 8 ...] [--out preb_out]

Every scan of each sequence gets mos/.label + confidence/.npy + bbox/.npy
artifacts (the growing-window warm-up covers the first N-1 scans —
predict_mos.py:305-383 — but here it is the same compiled graph, not a
model rebuild per window size).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..config import Config
from ..data.kitti import lidar_poses_from_files, load_files, read_point_cloud
from ..data.loader import prefetch_map
from ..nn.model import InsMOSModel
from ..pipeline import InferencePipeline
from ..utils.checkpoint import load_checkpoint
from ..utils.io import artifact_dirs, write_scan_artifacts

VALID_SEQS = [8]
TEST_SEQS = [11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="InsMOS-TPU inference")
    p.add_argument("--cfg_file", type=str, default=None, help="config yaml (else ckpt snapshot)")
    p.add_argument("--data_path", type=str, default="demo_data")
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint directory")
    p.add_argument("--split", type=str, default="valid", help="valid or test")
    p.add_argument("--sequences", type=int, nargs="*", default=None)
    p.add_argument("--ext", type=str, default=".bin", help="point cloud file extension")
    p.add_argument("--out", type=str, default="preb_out")
    p.add_argument("--seed", type=int, default=0, help="init seed when no ckpt")
    return p.parse_args(argv)


def run(args) -> dict:
    if args.ckpt:
        cfg, params, state, _, _ = load_checkpoint(args.ckpt)
        if args.cfg_file:
            cfg = Config.from_yaml(args.cfg_file)
    else:
        import jax

        cfg = Config.from_yaml(args.cfg_file) if args.cfg_file else Config()
        params, state = InsMOSModel(cfg).init(jax.random.PRNGKey(args.seed))

    sequences = args.sequences
    if sequences is None:
        sequences = VALID_SEQS if args.split == "valid" else TEST_SEQS

    pipe = InferencePipeline(cfg, params, state)
    stats = {"scans": 0, "seconds": 0.0}
    for seq in sequences:
        seq_dir = os.path.join(args.data_path, f"{int(seq):02d}")
        files = [
            f
            for f in load_files(os.path.join(seq_dir, "velodyne"))
            if f.endswith(args.ext)
        ]
        poses = None
        if cfg.data.transform:
            poses = lidar_poses_from_files(
                os.path.join(seq_dir, cfg.data.poses_file),
                os.path.join(seq_dir, "calib.txt"),
            )
        dirs = artifact_dirs(args.out, cfg.experiment_id, seq)
        t0 = time.perf_counter()
        scan_iter = prefetch_map(
            read_point_cloud, files, num_workers=cfg.data.num_workers
        )
        for idx, out in enumerate(pipe.stream_sequence(scan_iter, poses)):
            write_scan_artifacts(
                dirs, idx, out["point_logits"], out["boxes"], out["scores"], out["labels"]
            )
        dt = time.perf_counter() - t0
        stats["scans"] += len(files)
        stats["seconds"] += dt
        print(f"seq {seq:02d}: {len(files)} scans in {dt:.1f}s "
              f"({len(files) / max(dt, 1e-9):.2f} scans/s)")
    return stats


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
