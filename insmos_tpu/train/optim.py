"""Optimizer with exact reference semantics.

torch.optim.Adam(lr=1e-4, weight_decay=1e-4) + StepLR(step=1 epoch,
gamma=0.99) (reference models/models.py:185-190, config.yaml:58-62).
torch Adam applies weight decay by adding wd*param to the GRADIENT before
the moment updates (unlike AdamW) — so the optax chain is
add_decayed_weights -> scale_by_adam -> lr schedule.
"""

from __future__ import annotations

import optax

from ..config import Config


def lr_schedule(cfg: Config, steps_per_epoch: int):
    """lr * decay^(epoch // lr_epoch), stepped per epoch."""

    def fn(step):
        epoch = step // max(1, steps_per_epoch)
        return cfg.train.lr * (cfg.train.lr_decay ** (epoch // cfg.train.lr_epoch))

    return fn


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr_schedule(cfg, steps_per_epoch)),
    )
    if cfg.train.acc_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.acc_batches)
    return tx
