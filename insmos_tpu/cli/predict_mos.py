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

import jax
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
    p.add_argument(
        "--pod", action="store_true",
        help="stream sequences in lockstep, one per device (pod inference)",
    )
    p.add_argument(
        "--slots_per_device", type=int, default=1,
        help="with --pod: sequence streams per chip (vmapped slot axis). "
        "A capacity/serving feature: measured aggregate throughput is "
        "~0.9x single-stream (per-row gather cost scales with streams; "
        "PERF.md round-3 findings), but one chip can carry S sequences",
    )
    p.add_argument(
        "--allow-default", action="store_true", dest="allow_default",
        help="permit a ckpt-less, cfg-less run (random weights at the "
        "full-scale default Config — rarely what you want; guards "
        "against accidentally launching a 100+ GB random-weights run)",
    )
    p.add_argument(
        "--fixed-frame", action="store_true", dest="fixed_frame",
        help="fixed-odometry framing + incremental stem reuse: scans are "
        "expressed in a fixed-orientation voxel-snapped frame so the "
        "device window shifts by integer voxels and per-slot stem "
        "activations are reused across steps (faster streaming; the "
        "scene keeps odometry orientation instead of the reference's "
        "per-step re-rotation — a documented deviation)",
    )
    return p.parse_args(argv)


def _run_pod(args, cfg, params, state, sequences, fixed_frame=False) -> dict:
    """Streaming multi-sequence pod inference: sequences round-robin over
    the device mesh's slots (slots_per_device streams per chip), one scan
    per sequence per step. With fixed_frame, scans are re-expressed in the
    voxel-snapped odometry frame per slot (fixed_frame_transform) so the
    incremental stem streams across all slots."""
    from ..pipeline import PodInferencePipeline, fixed_frame_transform

    pipe = PodInferencePipeline(
        cfg, params, state,
        slots_per_device=max(1, int(getattr(args, "slots_per_device", 1))),
    )
    S = pipe.n_slots
    stats = {"scans": 0, "seconds": 0.0}
    for w0 in range(0, len(sequences), S):
        wave = sequences[w0 : w0 + S]
        seq_files, seq_poses, dirs = [], [], []
        for seq in wave:
            seq_dir = os.path.join(args.data_path, f"{int(seq):02d}")
            files = [
                f
                for f in load_files(os.path.join(seq_dir, "velodyne"))
                if f.endswith(args.ext)
            ]
            seq_files.append(files)
            seq_poses.append(
                lidar_poses_from_files(
                    os.path.join(seq_dir, cfg.data.poses_file),
                    os.path.join(seq_dir, "calib.txt"),
                )
                if cfg.data.transform
                else None
            )
            dirs.append(artifact_dirs(args.out, cfg.experiment_id, seq))
        n_steps = max(len(f) for f in seq_files)
        pipe.reset()
        t0 = time.perf_counter()
        prev_pose = [None] * len(wave)
        prev_snap = [None] * len(wave)
        vox = cfg.data.voxel_size[0]
        for t in range(n_steps):
            scans, tfs, raw_n = [], [], []
            for i in range(S):
                if i >= len(wave) or t >= len(seq_files[i]):
                    scans.append(None)
                    tfs.append(None)
                    raw_n.append(0)
                    continue
                sc = read_point_cloud(seq_files[i][t])
                raw_n.append(len(sc))
                poses = seq_poses[i]
                if poses is None:
                    tfs.append(None)
                elif fixed_frame:
                    sc, tf, prev_snap[i] = fixed_frame_transform(
                        sc, poses[t], prev_snap[i], vox
                    )
                    tfs.append(tf)
                else:
                    base = prev_pose[i] if prev_pose[i] is not None else poses[t]
                    tfs.append(
                        (np.linalg.inv(poses[t]) @ base).astype(np.float32)
                    )
                    prev_pose[i] = poses[t]
                scans.append(sc)
            out = jax.tree.map(np.asarray, pipe.push_scans(scans, tfs))
            for i in range(len(wave)):
                if scans[i] is None:
                    continue
                kept = out["box_mask"][i].astype(bool)
                write_scan_artifacts(
                    dirs[i], t,
                    out["point_logits"][i][: raw_n[i]],
                    out["boxes"][i][kept][:, :7],
                    out["scores"][i][kept],
                    out["labels"][i][kept],
                )
        dt = time.perf_counter() - t0
        n_scans = sum(len(f) for f in seq_files)
        stats["scans"] += n_scans
        stats["seconds"] += dt
        print(
            f"pod wave {wave}: {n_scans} scans in {dt:.1f}s "
            f"({n_scans / max(dt, 1e-9):.2f} scans/s aggregate)"
        )
    return stats


def run(args) -> dict:
    if args.ckpt:
        cfg, params, state, _, _ = load_checkpoint(args.ckpt)
        if args.cfg_file:
            cfg = Config.from_yaml(args.cfg_file)
    else:
        import jax

        if not args.cfg_file and not getattr(args, "allow_default", False):
            raise SystemExit(
                "predict_mos: no --ckpt and no --cfg_file — this would run "
                "RANDOM weights at the full-scale default config. Pass "
                "--cfg_file (or --ckpt), or force with --allow-default."
            )
        cfg = Config.from_yaml(args.cfg_file) if args.cfg_file else Config()
        params, state = InsMOSModel(cfg).init(jax.random.PRNGKey(args.seed))

    sequences = args.sequences
    if sequences is None:
        sequences = VALID_SEQS if args.split == "valid" else TEST_SEQS

    fixed_frame = getattr(args, "fixed_frame", False)
    if fixed_frame:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            runtime=dataclasses.replace(cfg.runtime, incremental_stem=True),
        )

    if args.pod:
        return _run_pod(
            args, cfg, params, state, list(sequences), fixed_frame=fixed_frame
        )

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
        for idx, out in enumerate(
            pipe.stream_sequence(scan_iter, poses, fixed_frame=fixed_frame)
        ):
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
