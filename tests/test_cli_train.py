"""Train-CLI orchestration test: epoch loop, prefetching loader, scalar
logging (reference names), recall aggregation, checkpoint save/resume.

The jitted train/eval steps are stubbed with light host functions — the
real step functions are covered by tests/test_model.py — so this validates
the CLI wiring (batching, metrics plumbing, artifact layout) in seconds.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import insmos_tpu.cli.train as tcli
from insmos_tpu.train.step import TrainState

from test_model import tiny_config


@pytest.fixture()
def tiny_root(tmp_path):
    from insmos_tpu.data.synthetic import write_synthetic_sequence

    root = tmp_path / "kitti"
    write_synthetic_sequence(
        str(root), seq=0, n_scans=6, seed=3, n_ground=400, n_per_obj=40
    )
    return str(root)


def test_train_cli_loop(tiny_root, tmp_path, monkeypatch):
    cfg = tiny_config(window=3)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, split_train=(0,), split_val=(0,), num_workers=2
        ),
        train=dataclasses.replace(cfg.train, batch_size=2),
    )

    calls = {"train": 0, "eval": 0}

    def fake_make_train_step(model, tx):
        def step(ts, batch):
            calls["train"] += 1
            assert batch["points"].shape[0] == 2  # batched by the loader
            metrics = {
                "loss": jnp.float32(1.0),
                "cls_loss": jnp.float32(0.1),
                "box_loss": jnp.float32(0.2),
                "mos_loss": jnp.float32(0.3),
                "motion_loss": jnp.float32(0.4),
                "confusion": jnp.eye(3, dtype=jnp.int32) * 5,
            }
            return TrainState(ts.params, ts.state, ts.opt_state, ts.step + 1), metrics

        return step

    def fake_make_eval_step(model):
        def step(params, state, batch):
            calls["eval"] += 1
            return {
                "confusion": jnp.eye(3, dtype=jnp.int32) * 7,
                "rcnn_0.3": jnp.int32(2),
                "rcnn_0.5": jnp.int32(1),
                "rcnn_0.7": jnp.int32(0),
                "gt": jnp.int32(2),
            }

        return step

    monkeypatch.setattr(tcli, "make_train_step", fake_make_train_step)
    monkeypatch.setattr(tcli, "make_eval_step", fake_make_eval_step)
    monkeypatch.setattr(
        tcli.Config, "from_yaml", staticmethod(lambda p: cfg), raising=True
    )

    out = str(tmp_path / "run")
    args = tcli.parse_args(
        ["--config", "ignored", "--data", tiny_root, "--epochs", "1", "--out", out]
    )
    ts = tcli.run(args)
    assert calls["train"] == 2  # 4 samples / batch 2
    assert calls["eval"] == 2
    assert int(ts.step) == 2

    scalars = [
        json.loads(l) for l in open(os.path.join(out, "scalars.jsonl"))
    ]
    keys = set().union(*(set(s) for s in scalars))
    # reference scalar names (models/models.py:84-88,174-175)
    for name in (
        "train_loss", "cls_loss", "box_loss", "mos_loss", "motion_loss",
        "train_mos_iou_step", "val_mos_iou_step",
        "recall_rcnn_3", "recall_rcnn_5", "recall_rcnn_7",
        "recall_roi_3", "recall_roi_5", "recall_roi_7",
    ):
        assert name in keys, name
    rec = next(s for s in scalars if "recall_rcnn_3" in s)
    assert rec["recall_rcnn_3"] == pytest.approx(4 / 4)  # 2+2 recalled / 2+2 gt
    assert rec["recall_roi_3"] == 0.0

    # checkpoints written (top-k + last policy)
    assert os.path.isdir(os.path.join(out, "ckpt"))
    assert len(os.listdir(os.path.join(out, "ckpt"))) >= 1
