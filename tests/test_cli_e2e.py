"""End-to-end CLI integration: checkpoint -> predict -> refine -> evaluate
on a synthetic KITTI-format sequence with a tiny config."""

import os

import jax
import numpy as np
import pytest

from insmos_tpu.cli import evaluate_mos, predict_mos, refine
from insmos_tpu.nn import InsMOSModel
from insmos_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from insmos_tpu.utils.io import read_pred_labels

from test_model import tiny_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    from insmos_tpu.data.synthetic import write_synthetic_sequence

    root = tmp_path_factory.mktemp("kitti_e2e")
    write_synthetic_sequence(
        str(root), seq=8, n_scans=6, seed=7, n_ground=800, n_per_obj=60
    )
    cfg = tiny_config(window=3)
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt") / "c0")
    save_checkpoint(ckpt_dir, cfg, params, state, step=5)
    return str(root), cfg, ckpt_dir, tmp_path_factory.mktemp("out")


def test_checkpoint_roundtrip(e2e):
    root, cfg, ckpt_dir, _ = e2e
    cfg2, params2, state2, _, step = load_checkpoint(ckpt_dir)
    assert step == 5
    assert cfg2.data.point_cloud_range == cfg.data.point_cloud_range
    assert cfg2.model.n_past_steps == cfg.model.n_past_steps
    # params restored exactly
    leaves = jax.tree_util.tree_leaves(params2)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_predict_refine_evaluate(e2e):
    root, cfg, ckpt_dir, out_root = e2e
    pred_out = str(out_root / "preb_out")
    args = predict_mos.parse_args(
        ["--ckpt", ckpt_dir, "--data_path", root, "--sequences", "8",
         "--out", pred_out]
    )
    stats = predict_mos.run(args)
    assert stats["scans"] == 6

    # every scan has all three artifacts; label counts match raw scans
    pdir = os.path.join(pred_out, cfg.experiment_id)
    for i in range(6):
        scan = np.fromfile(
            os.path.join(root, "08", "velodyne", f"{i:06d}.bin"), dtype=np.float32
        ).reshape(-1, 4)
        lab_path = os.path.join(
            pdir, "mos_preb", "sequences", "08", "predictions", f"{i:06d}.label"
        )
        lab = np.fromfile(lab_path, dtype=np.int32)
        assert lab.shape == (len(scan),)
        assert set(np.unique(lab)) <= {0, 9, 251}
        conf = np.load(
            os.path.join(pdir, "confidence", "sequences", "08", "predictions", f"{i:06d}.npy")
        )
        assert conf.shape == (len(scan), 2)
        bbox = np.load(
            os.path.join(pdir, "bbox_preb", "sequences", "08", "predictions", f"{i:06d}.npy"),
            allow_pickle=True,
        ).item()
        assert set(bbox) == {"pred_boxes", "pred_scores", "pred_labels"}
        assert bbox["pred_boxes"].shape[1] == 7

    # refine runs and rewrites labels with the same point counts
    refine_out = str(out_root / "preb_out_refine")
    refine.main(
        ["--data_path", root, "--pred", pdir, "--out", refine_out,
         "--sequences", "8"]
    )
    ref_lab = read_pred_labels(
        os.path.join(refine_out, "mos_preb", "sequences", "08", "predictions", "000000.label")
    )
    assert len(ref_lab) == len(
        np.fromfile(os.path.join(root, "08", "velodyne", "000000.bin"), np.float32)
    ) // 4

    # evaluator consumes both; untrained net gives a valid (low) IoU
    res = evaluate_mos.evaluate(root, os.path.join(pdir, "mos_preb"), [8])
    assert 0.0 <= res["iou_moving"] <= 1.0
    res2 = evaluate_mos.evaluate(
        root, os.path.join(refine_out, "mos_preb"), [8]
    )
    assert 0.0 <= res2["iou_moving"] <= 1.0


def test_evaluator_perfect_predictions(e2e):
    root, *_ = e2e
    # copy gt labels as predictions -> IoU 1.0
    import shutil

    pred = str(os.path.join(root, "_perfect", "sequences", "08", "predictions"))
    os.makedirs(pred, exist_ok=True)
    src = os.path.join(root, "08", "labels")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), os.path.join(pred, f))
    res = evaluate_mos.evaluate(root, os.path.join(root, "_perfect"), [8])
    assert res["iou_moving"] == pytest.approx(1.0)
    assert res["iou_static"] == pytest.approx(1.0)
