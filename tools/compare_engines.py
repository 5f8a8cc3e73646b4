"""Span vs window engine at full scale on TPU: quantify the accuracy
impact of span truncation (key-interval-jump blocks dropping out-of-span
contributions).

Runs the full model forward with both engines on the same coherent
synthetic window and reports per-point label agreement, logit deltas, and
box deltas, plus the span overflow counters.

  python tools/compare_engines.py
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.model import InsMOSModel

    base = _bench_cfg()
    # f32 compute so engine differences are isolated from bf16 rounding
    mk = lambda eng: dataclasses.replace(
        base,
        runtime=dataclasses.replace(
            base.runtime, sparse_engine=eng, compute_dtype="float32"
        ),
    )
    cfg_s, cfg_w = mk("span"), mk("window")
    model_s, model_w = InsMOSModel(cfg_s), InsMOSModel(cfg_w)
    params, state = model_s.init(jax.random.PRNGKey(0))
    sample = {k: jnp.asarray(v) for k, v in make_window(base, seed=3).items()}

    out_s = jax.jit(lambda p, s, x: model_s.forward(p, s, x, train=False))(
        params, state, sample
    )
    print("span overflow:", np.asarray(out_s["overflow"]["span_overflow"]).tolist())
    out_w = jax.jit(lambda p, s, x: model_w.forward(p, s, x, train=False))(
        params, state, sample
    )

    pv = np.asarray(out_s["point_valid"])
    ls = np.asarray(out_s["point_logits"])[pv]
    lw = np.asarray(out_w["point_logits"])[pv]
    lab_s, lab_w = ls.argmax(-1), lw.argmax(-1)
    print(f"points: {pv.sum()}")
    print(f"label agreement: {(lab_s == lab_w).mean():.6f}")
    print(f"logit |delta| mean/max: {np.abs(ls - lw).mean():.5f} / {np.abs(ls - lw).max():.4f}")

    ms = np.asarray(out_s["box_mask"]).astype(bool)
    mw = np.asarray(out_w["box_mask"]).astype(bool)
    print(f"boxes kept: span={ms.sum()} window={mw.sum()}")
    n = min(ms.sum(), mw.sum())
    bs = np.asarray(out_s["boxes"])[ms][:n, :7]
    bw = np.asarray(out_w["boxes"])[mw][:n, :7]
    print(f"box |delta| mean: {np.abs(bs - bw).mean():.5f}")


if __name__ == "__main__":
    main()
