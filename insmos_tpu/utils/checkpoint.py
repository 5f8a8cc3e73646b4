"""Checkpointing with a config snapshot.

Replaces Lightning's ModelCheckpoint/resume (reference scripts/train.py:
59-65, 85; hyperparameters snapshotted into the ckpt and re-read at
inference, models.py:30 / predict_mos.py:288): orbax for the pytrees, the
full Config as JSON alongside so `predict_mos --ckpt` restores the exact
training configuration.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config

_CONFIG_FILE = "config.json"


def save_checkpoint(path: str, cfg: Config, params, state, opt_state=None, step: int = 0):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    tree = {"params": params, "state": state, "step": np.int64(step)}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "tree"), tree, force=True)
    with open(os.path.join(path, _CONFIG_FILE), "w") as fh:
        json.dump(cfg.to_dict(), fh, indent=1)


def load_checkpoint(path: str, with_opt: bool = False):
    """Returns (cfg, params, state, opt_state|None, step)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as fh:
        cfg = Config.from_dict(json.load(fh))
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(path, "tree"))
    opt_state = tree.get("opt_state") if with_opt else None
    return cfg, tree["params"], tree["state"], opt_state, int(tree["step"])


def best_checkpoint_manager(root: str, max_to_keep: int = 2):
    """Keep the top-k checkpoints by val MOS IoU plus a 'last' — the
    reference's ModelCheckpoint(save_top_k=2, monitor=val_mos_iou, max,
    save_last=True) policy, implemented directly."""

    class Manager:
        def __init__(self):
            self.scores: list[tuple[float, str]] = []
            os.makedirs(root, exist_ok=True)

        def save(self, cfg, params, state, opt_state, step, score: float):
            name = f"epoch{step}_iou{score:.4f}"
            path = os.path.join(root, name)
            save_checkpoint(path, cfg, params, state, opt_state, step)
            save_checkpoint(os.path.join(root, "last"), cfg, params, state, opt_state, step)
            self.scores.append((score, path))
            self.scores.sort(key=lambda t: -t[0])
            for _, stale in self.scores[max_to_keep:]:
                if os.path.isdir(stale):
                    import shutil

                    shutil.rmtree(stale, ignore_errors=True)
            self.scores = self.scores[:max_to_keep]

    return Manager()
