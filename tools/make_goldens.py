"""Regenerate the committed golden artifact fixtures (tests/goldens/).

Protocol (VERDICT round-1 #8): fixed-seed tiny model + fixed-seed synthetic
sequence -> predict_mos artifacts, frozen into the repo so any numerics
regression in the forward path (engine rewrites, fusion changes, dtype
drift) is caught by tests/test_goldens.py diffing today's bytes.

Run on CPU (deterministic XLA; the conftest-equivalent env is set here):

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

GOLDEN_DIR = os.path.join("tests", "goldens")
SEQ, N_SCANS = 8, 5
FRAMES = (0, 3, 4)  # warm-up frame, mid, last (full-window)


def build(tmp_root: str):
    """Shared with the test: returns (pred_dir, cfg) after running predict
    on the canonical fixed-seed setup."""
    import jax

    from insmos_tpu.cli import predict_mos
    from insmos_tpu.data.synthetic import write_synthetic_sequence
    from insmos_tpu.nn import InsMOSModel
    from insmos_tpu.utils.checkpoint import save_checkpoint
    from test_model import tiny_config

    data_root = os.path.join(tmp_root, "kitti")
    write_synthetic_sequence(
        data_root, seq=SEQ, n_scans=N_SCANS, seed=42, n_ground=800,
        n_per_obj=60,
    )
    import dataclasses

    cfg = tiny_config(window=3)
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, compute_dtype="float32"),
    )
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(2024))
    ckpt = os.path.join(tmp_root, "ckpt")
    save_checkpoint(ckpt, cfg, params, state, step=0)
    out = os.path.join(tmp_root, "preb_out")
    args = predict_mos.parse_args(
        ["--ckpt", ckpt, "--data_path", data_root, "--sequences", str(SEQ),
         "--out", out]
    )
    predict_mos.run(args)
    return os.path.join(out, cfg.experiment_id), cfg


def artifact_paths(pred_dir: str, frame: int) -> dict:
    sub = os.path.join("sequences", f"{SEQ:02d}", "predictions")
    return {
        "label": os.path.join(pred_dir, "mos_preb", sub, f"{frame:06d}.label"),
        "conf": os.path.join(pred_dir, "confidence", sub, f"{frame:06d}.npy"),
        "bbox": os.path.join(pred_dir, "bbox_preb", sub, f"{frame:06d}.npy"),
    }


def main():
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="goldens_")
    pred_dir, _ = build(tmp)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for f in FRAMES:
        for kind, src in artifact_paths(pred_dir, f).items():
            dst = os.path.join(
                GOLDEN_DIR, f"{f:06d}.{os.path.basename(src).split('.')[-1]}"
                if kind == "label" else f"{f:06d}.{kind}.npy"
            )
            shutil.copy(src, dst)
            print("wrote", dst, os.path.getsize(dst), "bytes")
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
