"""End-to-end model forward on a tiny config + synthetic data."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.config import Config, DataConfig, ModelConfig, MotionNetConfig
from insmos_tpu.data import KittiWindowDataset
from insmos_tpu.nn import InsMOSModel

pytestmark = pytest.mark.slow


def tiny_config(window: int = 4) -> Config:
    base = Config()
    return dataclasses.replace(
        base,
        data=DataConfig(point_cloud_range=(-6.4, -6.4, -3.0, 6.4, 6.4, 1.0)),
        model=dataclasses.replace(
            base.model,
            n_past_steps=window,
            max_voxels=4096,
            unet_capacities=(4096, 2048, 1024, 512, 512),
            motionnet=MotionNetConfig(
                crop_range=(-8.0, -8.0, -4.0, 8.0, 8.0, 4.8),
                site_capacities=(8192, 4096, 2048, 1024),
            ),
        ),
        runtime=dataclasses.replace(base.runtime, max_points_per_scan=2048),
    )


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from insmos_tpu.data.synthetic import write_synthetic_sequence

    root = tmp_path_factory.mktemp("kitti_tiny")
    write_synthetic_sequence(str(root), seq=8, n_scans=6, seed=3)
    cfg = tiny_config()
    ds = KittiWindowDataset(cfg, "val", root_dir=str(root), sequences=[8])
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return cfg, ds, model, params, state


def test_forward_shapes_and_masks(tiny_setup):
    cfg, ds, model, params, state = tiny_setup
    sample = ds[0].arrays()
    fwd = jax.jit(lambda p, s, x: model.forward(p, s, x, train=False))
    out = fwd(params, state, sample)
    P = cfg.runtime.max_points_per_scan
    assert out["point_logits"].shape == (P, 3)
    assert out["motion_logits"].shape == (P, 3)
    gx, gy, _ = cfg.data.grid_size
    f = cfg.model.head.out_size_factor
    assert out["cls_map"].shape == (gy // f, gx // f, 3)
    assert out["box_map"].shape == (gy // f, gx // f, 8)
    assert out["boxes"].shape == (cfg.model.post.nms_post_maxsize, 8)
    assert np.isfinite(np.asarray(out["point_logits"])).all()
    # logits must be non-trivial on valid points
    valid = np.asarray(out["point_valid"])
    logits = np.asarray(out["point_logits"])[valid]
    assert np.abs(logits).max() > 0

    # state structure preserved
    flat_old = jax.tree_util.tree_structure(state)
    flat_new = jax.tree_util.tree_structure(out["new_state"])
    assert flat_old == flat_new


def test_forward_train_mode_updates_state(tiny_setup):
    cfg, ds, model, params, state = tiny_setup
    sample = ds[0].arrays()
    fwd = jax.jit(lambda p, s, x: model.forward(p, s, x, train=True))
    out = fwd(params, state, sample)
    old = np.asarray(state["unet"]["conv_input"]["bn"]["mean"])
    new = np.asarray(out["new_state"]["unet"]["conv_input"]["bn"]["mean"])
    assert not np.allclose(old, new)


def test_train_step_and_data_parallel(tiny_setup):
    """One optimizer step, batched + sharded over the 8 virtual devices."""
    import optax

    from insmos_tpu.data.sample import stack_samples
    from insmos_tpu.parallel import make_mesh, replicate, shard_batch
    from insmos_tpu.train import TrainState, make_train_step
    from insmos_tpu.train.optim import make_optimizer

    cfg, ds, model, params, state = tiny_setup
    batch = stack_samples([ds[0], ds[1]])

    tx = make_optimizer(cfg, steps_per_epoch=10)
    ts = TrainState(params, state, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)
    ts2, metrics = step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mos_loss"]) > 0
    assert int(np.asarray(metrics["confusion"]).sum()) > 0
    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, ts2.params, ts.params),
        0.0,
    )
    assert diff > 0

    # sharded over a 2-device mesh (replicated params, batch split)
    mesh = make_mesh(2)
    ts_r = TrainState(
        replicate(mesh, ts.params), replicate(mesh, ts.state),
        replicate(mesh, ts.opt_state), jnp.zeros((), jnp.int32),
    )
    sharded = shard_batch(mesh, batch)
    ts3, m3 = step(ts_r, sharded)
    np.testing.assert_allclose(
        float(m3["loss"]), float(metrics["loss"]), rtol=2e-4
    )


def test_warmup_masked_window_matches_native_small_window():
    """Warm-up parity: a W=4 sample with only the last 2 slots filled must
    produce the SAME current-scan outputs as a native W=2 forward on the
    same two scans. This certifies the single-graph masked-slot warm-up
    (pipeline.py) against the reference's per-window-size model rebuild
    (scripts/predict_mos.py:305-383)."""
    cfg4 = tiny_config(window=4)
    cfg4 = dataclasses.replace(
        cfg4, runtime=dataclasses.replace(cfg4.runtime, compute_dtype="float32")
    )
    cfg2 = dataclasses.replace(
        cfg4, model=dataclasses.replace(cfg4.model, n_past_steps=2)
    )
    # params/state are W-independent (t-kernel folding happens at call time)
    model4, model2 = InsMOSModel(cfg4), InsMOSModel(cfg2)
    params, state = model4.init(jax.random.PRNGKey(7))

    rng = np.random.default_rng(11)
    P = cfg4.runtime.max_points_per_scan
    r = cfg4.data.point_cloud_range
    n = int(P * 0.8)
    scans = np.zeros((2, P, 4), np.float32)
    for w in range(2):
        scans[w, :n, 0] = rng.uniform(r[0], r[3], n)
        scans[w, :n, 1] = rng.uniform(r[1], r[4], n)
        scans[w, :n, 2] = rng.uniform(r[2], r[5], n)
        scans[w, :n, 3] = rng.uniform(0, 1, n)

    def sample(W, filled):
        pts = np.zeros((W, P, 4), np.float32)
        pts[W - filled:] = scans[:filled]
        num = np.zeros((W,), np.int32)
        num[W - filled:] = n
        mask = np.zeros((W,), bool)
        mask[W - filled:] = True
        return {
            "points": pts,
            "num_points": num,
            "scan_mask": mask,
            "labels": np.zeros((W, P), np.int32),
            "gt_boxes": np.zeros((cfg4.model.head.max_objs, 8), np.float32),
            "num_boxes": np.int32(0),
        }

    out4 = jax.jit(lambda p, s, x: model4.forward(p, s, x, train=False))(
        params, state, sample(4, 2)
    )
    out2 = jax.jit(lambda p, s, x: model2.forward(p, s, x, train=False))(
        params, state, sample(2, 2)
    )
    valid = np.asarray(out2["point_valid"])
    np.testing.assert_allclose(
        np.asarray(out4["point_logits"])[valid],
        np.asarray(out2["point_logits"])[valid],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out4["cls_map"]), np.asarray(out2["cls_map"]),
        atol=1e-4, rtol=1e-4,
    )


def test_t_pruned_motionnet_exact():
    """t-pruned inference (trailing-slot schedule) must reproduce the
    full-window current-scan motion features EXACTLY, for both engines
    (VERDICT #1 perf work; slice_slots/basic_block_slab_pruned)."""
    from insmos_tpu.nn.minkunet4d import motionnet_forward
    from insmos_tpu.nn.layers import cast_compute

    for engine in ("window", "span"):
        cfg = tiny_config(window=4)
        cfg = dataclasses.replace(
            cfg,
            runtime=dataclasses.replace(
                cfg.runtime, compute_dtype="float32", sparse_engine=engine
            ),
        )
        from insmos_tpu.nn import InsMOSModel

        model = InsMOSModel(cfg)
        params, state = model.init(jax.random.PRNGKey(3))
        params = cast_compute(params, "float32")

        rng = np.random.default_rng(7)
        W, P = 4, cfg.runtime.max_points_per_scan
        r = cfg.data.point_cloud_range
        n = int(P * 0.7)
        pts = np.zeros((W, P, 4), np.float32)
        pts[:, :n, 0] = rng.uniform(r[0], r[3], (W, n))
        pts[:, :n, 1] = rng.uniform(r[1], r[4], (W, n))
        pts[:, :n, 2] = rng.uniform(r[2], r[5], (W, n))
        pv = np.zeros((W, P), bool)
        pv[:, :n] = True

        full = jax.jit(
            lambda p, s: motionnet_forward(
                p, s, cfg, jnp.asarray(pts), jnp.asarray(pv),
                train=False, prune=False,
            )[0]
        )(params["motion"], state["motion"])
        pruned = jax.jit(
            lambda p, s: motionnet_forward(
                p, s, cfg, jnp.asarray(pts), jnp.asarray(pv),
                train=False, prune=True,
            )[0]
        )(params["motion"], state["motion"])
        np.testing.assert_allclose(
            np.asarray(pruned), np.asarray(full), atol=2e-4, rtol=2e-4,
            err_msg=engine,
        )


def test_incremental_stem_streaming_exact():
    """Fixed-frame streaming with the incremental stem (cached per-slot
    reuse, minkunet4d._incremental_stem) must reproduce the direct
    pipeline's outputs EXACTLY at every step, including the warm-up steps
    where the cache fills gradually (VERDICT #3)."""
    from insmos_tpu.pipeline import InferencePipeline
    from insmos_tpu.nn.layers import cast_compute

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, compute_dtype="float32"),
    )
    cfg_inc = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, incremental_stem=True),
    )
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(5))

    # temporally coherent fixed-frame scans: shared static world with
    # per-scan visibility subsets (same regime as bench.make_window)
    rng = np.random.default_rng(11)
    P = cfg.runtime.max_points_per_scan
    r = cfg.data.point_cloud_range
    nw = int(P * 2.5)
    world = np.stack(
        [
            rng.uniform(r[0], r[3], nw),
            rng.uniform(r[1], r[4], nw),
            rng.uniform(r[2], r[5], nw),
            rng.uniform(0, 1, nw),
        ],
        axis=-1,
    ).astype(np.float32)
    scans = []
    for i in range(6):
        sel = rng.random(nw) < 0.45
        pts = world[sel][: P - 64]
        pts = pts + np.concatenate(
            [rng.normal(0, 0.02, (len(pts), 3)), np.zeros((len(pts), 1))], -1
        ).astype(np.float32)
        scans.append(pts)

    pipe_a = InferencePipeline(cfg, params, state)
    pipe_b = InferencePipeline(cfg_inc, params, state)
    for i, scan in enumerate(scans):
        out_a = pipe_a.push_scan(scan)
        out_b = pipe_b.push_scan(scan)
        np.testing.assert_allclose(
            np.asarray(out_b["point_logits"]),
            np.asarray(out_a["point_logits"]),
            atol=1e-4, rtol=1e-4, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out_b["scores"]), np.asarray(out_a["scores"]),
            atol=1e-4, rtol=1e-4, err_msg=f"step {i}",
        )


def test_incremental_stem_moving_ego_fixed_frame():
    """VERDICT round-2 #3: the incremental stem must be exact under a
    MOVING ego pose via fixed-odometry framing (pipeline.
    fixed_frame_transform): every step transform is a pure integer-voxel
    translation, cache queries are re-centered by it, and the streamed
    outputs must match the direct (full-stem) pipeline fed identical
    fixed-frame scans. Also: an incompatible (rotating) tf must route
    through the full-stem recovery step — never silently corrupt the
    cache — and streaming must stay exact afterwards."""
    from insmos_tpu.pipeline import InferencePipeline, fixed_frame_transform

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, compute_dtype="float32"),
    )
    cfg_inc = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, incremental_stem=True),
    )
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(7))

    # static world; the ego translates AND rotates scan to scan
    rng = np.random.default_rng(23)
    nw = 9000
    world = np.stack(
        [
            rng.uniform(-4.0, 9.0, nw),
            rng.uniform(-5.0, 8.0, nw),
            rng.uniform(-2.5, 0.8, nw),
            rng.uniform(0, 1, nw),
        ],
        axis=-1,
    ).astype(np.float32)

    def rotz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)

    n_steps = 6
    poses, scans = [], []
    for i in range(n_steps):
        t = np.array([0.53 * i, 0.27 * i, 0.0])
        R = rotz(0.07 * i)
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        poses.append(pose)
        near = np.linalg.norm(world[:, :2] - t[None, :2], axis=1) < 5.5
        vis = world[near][:1500]
        sensor = vis.copy()
        sensor[:, :3] = (vis[:, :3] - t[None]) @ R  # R^-1 = R.T applied right
        scans.append(sensor.astype(np.float32))

    pipe_a = InferencePipeline(cfg, params, state)  # direct full stem
    pipe_b = InferencePipeline(cfg_inc, params, state)  # incremental

    prev_snap = None
    for i in range(n_steps):
        fixed, tf, prev_snap = fixed_frame_transform(
            scans[i], poses[i], prev_snap, cfg.data.voxel_size[0]
        )
        # window translations really are non-zero integer voxel shifts
        if i > 0:
            k = tf[:3, 3] / cfg.data.voxel_size[0]
            assert np.allclose(k, np.round(k), atol=1e-3) and np.any(
                np.round(k) != 0
            )
        out_a = pipe_a.push_scan(fixed, tf)
        out_b = pipe_b.push_scan(fixed, tf)
        np.testing.assert_allclose(
            np.asarray(out_b["point_logits"]),
            np.asarray(out_a["point_logits"]),
            atol=1e-4, rtol=1e-4, err_msg=f"step {i}",
        )
    assert pipe_b.n_full_steps == 0

    # incompatible tf (rotation): must take the full-stem recovery path
    tf_rot = np.eye(4, dtype=np.float32)
    tf_rot[:3, :3] = rotz(0.3).astype(np.float32)
    out_a = pipe_a.push_scan(scans[0], tf_rot)
    out_b = pipe_b.push_scan(scans[0], tf_rot)
    assert pipe_b.n_full_steps == 1
    np.testing.assert_allclose(
        np.asarray(out_b["point_logits"]), np.asarray(out_a["point_logits"]),
        atol=1e-4, rtol=1e-4,
    )

    # the rebuilt cache must keep streaming exact afterwards
    tf_shift = np.eye(4, dtype=np.float32)
    tf_shift[:3, 3] = (np.array([3, -2, 1]) * cfg.data.voxel_size[0]).astype(
        np.float32
    )
    out_a = pipe_a.push_scan(scans[1], tf_shift)
    out_b = pipe_b.push_scan(scans[1], tf_shift)
    assert pipe_b.n_full_steps == 1  # compatible again: incremental path
    np.testing.assert_allclose(
        np.asarray(out_b["point_logits"]), np.asarray(out_a["point_logits"]),
        atol=1e-4, rtol=1e-4,
    )
