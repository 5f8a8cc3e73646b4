"""Pod streaming inference: S sequences sharded over the device mesh must
reproduce the single-sequence pipeline's outputs slot-for-slot."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "tests")

from insmos_tpu.nn import InsMOSModel
from insmos_tpu.pipeline import InferencePipeline, PodInferencePipeline

from test_model import tiny_config

pytestmark = pytest.mark.slow


def _scan(rng, n):
    pts = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, n)
    r = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    return np.concatenate([pts, r], axis=1)


def test_pod_matches_single():
    cfg = tiny_config(window=3)
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    pod = PodInferencePipeline(cfg, params, state)
    S = pod.n_slots
    assert S == 8  # conftest forces 8 virtual devices

    rng = np.random.default_rng(4)
    n_steps = 3
    # two distinct sequences replicated over the slots; slot S-1 idles on
    # the last step (shorter sequence)
    seqs = [[_scan(rng, 300 + 50 * t) for t in range(n_steps)] for _ in range(2)]

    pod.reset()
    outs = []
    for t in range(n_steps):
        scans = [seqs[i % 2][t] for i in range(S)]
        if t == n_steps - 1:
            scans[S - 1] = None
        outs.append(jax.tree.map(np.asarray, pod.push_scans(scans)))

    # single-sequence references
    for seq_id in (0, 1):
        ref = InferencePipeline(cfg, params, state)
        ref.reset()
        for t in range(n_steps):
            ref_out = jax.tree.map(np.asarray, ref.push_scan(seqs[seq_id][t]))
        np.testing.assert_allclose(
            outs[-1]["point_logits"][seq_id],
            ref_out["point_logits"],
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            outs[-1]["boxes"][seq_id], ref_out["boxes"], atol=1e-4, rtol=1e-3
        )

    # the idled slot (S-1 runs seq 1) kept its window: its last-step output
    # equals the PREVIOUS step's output of an active slot running the same
    # sequence is NOT expected; instead just check it produced step-2's
    # result unchanged semantics: window untouched => outputs from step
    # n_steps-1 used the stale (unmodified) window. Verify the buffer
    # really did not advance: num_points of slot S-1 match slot 1's
    # previous step count pattern.
    buf = jax.tree.map(np.asarray, pod._buf)
    assert buf["num_points"][S - 1].sum() < buf["num_points"][1].sum()


def test_pod_multislot_incremental_matches_single():
    """slots_per_device > 1 (multiple sequence streams per chip, the
    scans/s/chip lever) with the incremental stem: each slot must
    reproduce the single-stream fixed-frame pipeline exactly, including
    per-slot integer-voxel window shifts."""
    import dataclasses

    from jax.sharding import Mesh

    from insmos_tpu.pipeline import fixed_frame_transform

    cfg = tiny_config(window=3)
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(
            cfg.runtime, incremental_stem=True, compute_dtype="float32"
        ),
    )
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(2))

    mesh = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1), (cfg.runtime.data_axis,)
    )
    pod = PodInferencePipeline(cfg, params, state, mesh=mesh, slots_per_device=2)
    assert pod.n_slots == 2

    rng = np.random.default_rng(11)
    n_steps = 4
    vox = cfg.data.voxel_size[0]
    # two sequences with different moving ego translations
    world = _scan(rng, 4000)
    seq_poses = []
    seq_scans = []
    for s in range(2):
        poses, scans = [], []
        for t in range(n_steps):
            pose = np.eye(4)
            pose[:3, 3] = np.array([0.4 * t * (s + 1), -0.3 * t, 0.0])
            poses.append(pose)
            near = (
                np.linalg.norm(world[:, :2] - pose[:2, 3][None], axis=1) < 5.0
            )
            sc = world[near][:900].copy()
            sc[:, :3] -= pose[:3, 3][None]
            scans.append(sc.astype(np.float32))
        seq_poses.append(poses)
        seq_scans.append(scans)

    pod.reset()
    prev_snap = [None, None]
    pod_outs = None
    for t in range(n_steps):
        scans, tfs = [], []
        for s in range(2):
            sc, tf, prev_snap[s] = fixed_frame_transform(
                seq_scans[s][t], seq_poses[s][t], prev_snap[s], vox
            )
            scans.append(sc)
            tfs.append(tf)
        pod_outs = jax.tree.map(np.asarray, pod.push_scans(scans, tfs))

    for s in range(2):
        ref = InferencePipeline(cfg, params, state)
        ref.reset()
        prev = None
        for t in range(n_steps):
            sc, tf, prev = fixed_frame_transform(
                seq_scans[s][t], seq_poses[s][t], prev, vox
            )
            ref_out = jax.tree.map(np.asarray, ref.push_scan(sc, tf))
        assert ref.n_full_steps == 0
        np.testing.assert_allclose(
            pod_outs["point_logits"][s], ref_out["point_logits"],
            atol=1e-4, rtol=1e-4, err_msg=f"slot {s}",
        )


def test_pod_cli_matches_serial(tmp_path):
    """predict_mos --pod writes the same artifacts as the serial CLI."""
    import os
    from insmos_tpu.data.synthetic import write_synthetic_sequence
    from insmos_tpu.utils.checkpoint import save_checkpoint
    from insmos_tpu.cli import predict_mos

    root = str(tmp_path / "kitti")
    for seq in (8, 9):
        write_synthetic_sequence(
            root, seq=seq, n_scans=4, seed=seq, n_ground=400, n_per_obj=40
        )
    cfg = tiny_config(window=3)
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, cfg, params, state, step=0)

    out_a = str(tmp_path / "serial")
    out_b = str(tmp_path / "pod")
    base = ["--ckpt", ckpt, "--data_path", root, "--sequences", "8", "9"]
    predict_mos.run(predict_mos.parse_args(base + ["--out", out_a]))
    predict_mos.run(predict_mos.parse_args(base + ["--out", out_b, "--pod"]))

    for seq in ("08", "09"):
        for i in range(4):
            pa = os.path.join(
                out_a, cfg.experiment_id, "mos_preb", "sequences", seq,
                "predictions", f"{i:06d}.label",
            )
            pb = pa.replace(out_a, out_b)
            la = np.fromfile(pa, dtype=np.int32)
            lb = np.fromfile(pb, dtype=np.int32)
            assert len(la) == len(lb)
            # identical inputs through identical math; tiny numeric noise
            # from vmap scheduling may flip borderline argmaxes
            assert (la != lb).mean() < 0.01
