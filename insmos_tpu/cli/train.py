"""Training CLI — reference scripts/train.py capabilities: train from
scratch or resume, per-epoch val with MOS IoU + detection recall, top-k +
last checkpoints, TensorBoard-compatible scalar logging (JSONL fallback).

  python -m insmos_tpu.cli.train --data <root> [--config cfg.yaml]
      [--weights ckpt] [--checkpoint ckpt] [--epochs N] [--out runs/exp]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.kitti import KittiWindowDataset
from ..data.loader import iter_batches
from ..nn.model import InsMOSModel
from ..parallel import data_mesh_for_batch, replicate, shard_batch
from ..train import (
    TrainState, make_bn_reestimate, make_eval_step, make_train_step,
)
from ..train.metrics import iou_from_confusion
from ..train.optim import make_optimizer
from ..utils.checkpoint import best_checkpoint_manager, load_checkpoint


class ScalarLogger:
    """TensorBoard if available, else JSONL (reference logs via
    TensorBoardLogger, train.py:70-72)."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass
        self._fh = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def log(self, step: int, **scalars):
        for k, v in scalars.items():
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), step)
        self._fh.write(json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}}) + "\n")
        self._fh.flush()


def batches(ds, batch_size, shuffle, seed=0, num_workers=4):
    """Prefetching batch iterator (reference: 4 DataLoader workers +
    pin_memory, models/models.py:216); see data/loader.py."""
    yield from iter_batches(
        ds, batch_size, shuffle, seed=seed, num_workers=num_workers
    )


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="InsMOS-TPU training")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data", type=str, default=os.environ.get("DATA", ""))
    p.add_argument("--weights", type=str, default=None, help="init from ckpt params")
    p.add_argument("--checkpoint", type=str, default=None, help="resume incl. optimizer")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--out", type=str, default="runs/insmos")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument(
        "--bn_reest", type=int, default=0,
        help="re-estimate BN running stats from this many train batches "
        "at the end of every epoch (momentum-1 forwards, averaged) — "
        "use on short schedules where the reference momenta cannot "
        "converge the EMA (see train/step.make_bn_reestimate)",
    )
    return p.parse_args(argv)


def run(args):
    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.batch_size:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
        )
    model = InsMOSModel(cfg)

    train_ds = KittiWindowDataset(cfg, "train", root_dir=args.data)
    val_ds = KittiWindowDataset(cfg, "val", root_dir=args.data)
    bsz = cfg.train.batch_size
    steps_per_epoch = max(1, len(train_ds) // bsz)
    tx = make_optimizer(cfg, steps_per_epoch)

    start_epoch = 0
    if args.checkpoint:
        _, params, state, opt_state, step0 = load_checkpoint(args.checkpoint, with_opt=True)
        opt_state = opt_state if opt_state is not None else tx.init(params)
        start_epoch = step0 // steps_per_epoch
    elif args.weights:
        _, params, state, _, _ = load_checkpoint(args.weights)
        opt_state = tx.init(params)
        step0 = 0
    else:
        params, state = model.init(jax.random.PRNGKey(args.seed))
        opt_state = tx.init(params)
        step0 = 0

    mesh = data_mesh_for_batch(bsz)
    ts = TrainState(
        replicate(mesh, params), replicate(mesh, state),
        replicate(mesh, opt_state), jnp.asarray(step0, jnp.int32),
    )
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)
    bn_step = make_bn_reestimate(model) if args.bn_reest else None
    logger = ScalarLogger(args.out)
    ckpt_mgr = best_checkpoint_manager(os.path.join(args.out, "ckpt"))

    max_epoch = args.epochs or cfg.train.max_epoch
    for epoch in range(start_epoch, max_epoch):
        cm = np.zeros((3, 3), np.int64)
        t0 = time.perf_counter()
        for i, batch in enumerate(
            batches(
                train_ds, bsz, cfg.data.shuffle,
                seed=args.seed + epoch, num_workers=cfg.data.num_workers,
            )
        ):
            ts, metrics = train_step(ts, shard_batch(mesh, batch))
            cm += np.asarray(metrics["confusion"])
            if i % args.log_every == 0:
                logger.log(
                    int(ts.step),
                    train_loss=metrics["loss"],
                    cls_loss=metrics["cls_loss"],
                    box_loss=metrics["box_loss"],
                    mos_loss=metrics["mos_loss"],
                    motion_loss=metrics["motion_loss"],
                )
        train_iou = float(np.asarray(iou_from_confusion(jnp.asarray(cm)))[2])
        logger.log(int(ts.step), train_mos_iou_step=train_iou)

        if bn_step is not None:
            sstats, k = None, 0
            for batch in batches(
                train_ds, bsz, cfg.data.shuffle,
                seed=args.seed * 7919 + epoch,
                num_workers=cfg.data.num_workers,
            ):
                sb = bn_step(ts.params, ts.state, shard_batch(mesh, batch))
                sstats = (
                    sb if sstats is None
                    else jax.tree.map(jnp.add, sstats, sb)
                )
                k += 1
                if k >= args.bn_reest:
                    break
            new_state = jax.tree.map(lambda a: a / k, sstats)
            ts = TrainState(ts.params, new_state, ts.opt_state, ts.step)

        # ---- validation ----
        vcm = np.zeros((3, 3), np.int64)
        rec = {}
        for batch in batches(
            val_ds, bsz, shuffle=False, num_workers=cfg.data.num_workers
        ):
            m = eval_step(ts.params, ts.state, shard_batch(mesh, batch))
            vcm += np.asarray(m["confusion"])
            for k, v in m.items():
                if k.startswith(("rcnn", "gt")):
                    rec[k] = rec.get(k, 0) + int(v)
        val_iou = float(np.asarray(iou_from_confusion(jnp.asarray(vcm)))[2])
        gt_num = max(rec.get("gt", 0), 1)
        # scalar names match the reference (models/models.py:174-175):
        # recall_rcnn_<int(t*10)>; recall_roi_* stays 0 (no two-stage rois
        # in InsMOS — the reference accumulates the absent key as 0 too)
        recall_scalars = {}
        for k, v in rec.items():
            if k.startswith("rcnn_"):
                name = int(round(float(k[5:]) * 10))
                recall_scalars[f"recall_rcnn_{name}"] = v / gt_num
                recall_scalars[f"recall_roi_{name}"] = 0.0
        logger.log(int(ts.step), val_mos_iou_step=val_iou, **recall_scalars)
        print(
            f"epoch {epoch}: train_iou={train_iou:.4f} val_iou={val_iou:.4f} "
            f"({time.perf_counter() - t0:.0f}s)"
        )
        ckpt_mgr.save(
            cfg,
            jax.device_get(ts.params),
            jax.device_get(ts.state),
            jax.device_get(ts.opt_state),
            int(ts.step),
            val_iou,
        )
    return ts


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
