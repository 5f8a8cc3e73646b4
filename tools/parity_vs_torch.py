"""Checkpoint-parity runbook: first contact with a real reference ckpt.

This environment has neither the released `N_10_t_0.1_odom.ckpt` nor a
torch+MinkowskiEngine+spconv runtime, so real-weights parity (BASELINE.md
north-star: seq-08 IoU within 0.5 pts) cannot be closed here. This script
makes it a one-liner in any environment that has the ckpt:

Stage 1 (always): convert the torch ckpt into our pytrees and report
  unused/missing keys — validates structural coverage of utils/convert.py.

Stage 2 (needs KITTI scans or falls back to a synthetic window): run OUR
  jitted forward with the converted weights and dump per-point logits +
  boxes to an .npz.

Stage 3 (needs the reference repo + torch + ME + spconv importable): run
  the REFERENCE forward on the same window and diff per-point softmax,
  labels, and boxes. If the ME kernel-offset order assumption is wrong
  (utils/convert.py:18-41), rerun with --me_reverse_k and keep whichever
  direction agrees.

Usage:
    python tools/parity_vs_torch.py --ckpt N_10_t_0.1_odom.ckpt \
        [--data_path /kitti/sequences --seq 8 --frame 100] \
        [--ref_repo /path/to/InsMOS] [--me_reverse_k] [--out parity.npz]

Reference artifact contract being validated: scripts/predict_mos.py:436-461.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_path", default=None, help="KITTI sequences root")
    p.add_argument("--seq", type=int, default=8)
    p.add_argument("--frame", type=int, default=100)
    p.add_argument("--ref_repo", default=None, help="reference InsMOS repo")
    p.add_argument("--me_reverse_k", action="store_true")
    p.add_argument("--out", default="parity.npz")
    return p.parse_args(argv)


def load_window(args, cfg):
    """(W, P, 4) pose-aligned window ending at --frame, reference-style
    (scripts/predict_mos.py:132-151), or the bench synthetic window."""
    import numpy as np

    if args.data_path is None:
        from bench import make_window

        print("no --data_path: using the synthetic bench window")
        return make_window(cfg, seed=0)

    from insmos_tpu.data.kitti import KittiWindowDataset

    ds = KittiWindowDataset(
        cfg, "test", root_dir=args.data_path, with_labels=False,
        sequences=[args.seq],
    )
    idx = ds.index.index((args.seq, args.frame))
    return ds[idx].arrays()


def main(argv=None):
    args = parse_args(argv)
    import jax
    import numpy as np

    from insmos_tpu.config import Config
    from insmos_tpu.nn import InsMOSModel
    from insmos_tpu.utils.convert import convert_checkpoint

    cfg = Config()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    # ---- stage 1: conversion coverage
    params, state, unused = convert_checkpoint(
        args.ckpt, params, state, me_reverse_k=args.me_reverse_k
    )
    print(f"converted; unused torch keys: {len(unused)}")
    for k in unused:
        print("  unused:", k)

    # ---- stage 2: our forward
    sample = load_window(args, cfg)
    import jax.numpy as jnp

    batch = {k: jnp.asarray(v) for k, v in sample.items()}
    out = jax.jit(lambda p, s, x: model.forward(p, s, x, train=False))(
        params, state, batch
    )
    pv = np.asarray(out["point_valid"])
    logits = np.asarray(out["point_logits"])
    boxes = np.asarray(out["boxes"])
    scores = np.asarray(out["scores"])
    keep = np.asarray(out["box_mask"]).astype(bool)
    np.savez(
        args.out, logits=logits, point_valid=pv, boxes=boxes[keep],
        scores=scores[keep],
    )
    print(f"our forward: {pv.sum()} points, {keep.sum()} boxes -> {args.out}")

    # ---- stage 3: reference forward (optional)
    if args.ref_repo is None:
        print("no --ref_repo: stopping after stage 2 "
              "(diff the .npz against a reference run offline)")
        return
    sys.path.insert(0, args.ref_repo)
    try:
        import torch  # noqa: F401
        from models.models import InsMOSNet  # type: ignore
    except Exception as e:  # pragma: no cover - env-dependent
        print(f"reference runtime unavailable ({e}); stopping after stage 2")
        return
    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu")
    net = InsMOSNet(ckpt["hyper_parameters"])
    net.load_state_dict(ckpt["state_dict"])
    net.eval().cuda()
    pts = torch.from_numpy(
        np.asarray(sample["points"]).reshape(-1, 4)[
            np.asarray(sample["scan_mask"]).repeat(sample["points"].shape[1])
        ]
    ).cuda()
    with torch.no_grad():
        ref_out = net.forward({"past_point_clouds": [pts]}, "test")
    ref_soft = torch.softmax(ref_out[0]["point_seg_feature"], dim=1).cpu().numpy()
    ours_soft = np.exp(logits[pv]) / np.exp(logits[pv]).sum(-1, keepdims=True)
    n = min(len(ref_soft), len(ours_soft))
    d = np.abs(ref_soft[:n] - ours_soft[:n])
    agree = (ref_soft[:n].argmax(1) == ours_soft[:n].argmax(1)).mean()
    print(f"softmax |delta| mean/max: {d.mean():.5f}/{d.max():.4f}; "
          f"label agreement: {agree:.5f}")
    if agree < 0.999:
        print("LOW AGREEMENT — retry with/without --me_reverse_k "
              "(ME kernel-offset order, utils/convert.py:18-41)")


if __name__ == "__main__":
    main()
