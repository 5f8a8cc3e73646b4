"""Tiny on-hardware smoke test of the span kernel (run after kernel-structure
changes BEFORE any full-scale TPU run — a crashing Pallas kernel wedges the
remote axon TPU for ~40 min; see .claude/skills/verify/SKILL.md).

Builds a small random slab, runs span_conv_slab on TPU, and compares against
the XLA windowed oracle computed on CPU-side numpy via the window engine.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insmos_tpu.sparse.slab import (
        build_slab,
        site_grid,
        window_tables,
        window_conv,
    )
    from insmos_tpu.sparse.span_conv import span_conv_slab

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    dims = (64, 48, 16)
    T, C, CO = 4, 8, 8
    N, cap = 4000, 2048
    coords = np.stack(
        [
            rng.integers(0, dims[0], N),
            rng.integers(0, dims[1], N),
            rng.integers(0, dims[2], N),
        ],
        -1,
    ).astype(np.int32)
    tcol = rng.integers(0, T, N).astype(np.int32)
    valid = np.ones(N, bool)
    slab, p2slot, n_sites, drop = build_slab(
        jnp.asarray(coords), jnp.asarray(tcol), jnp.asarray(valid), dims, T, cap
    )
    feats = rng.normal(0, 1, (cap, T * C)).astype(np.float32)
    slab = slab.replace_feats(slab.mask_feats(jnp.asarray(feats)))
    w = rng.normal(0, 0.1, (27 * 3, C, CO)).astype(np.float32)

    kernel = (3, 3, 3, 3)
    out, ovf = jax.jit(
        lambda s, w: span_conv_slab(s, w, s, kernel), static_argnums=()
    )(slab, jnp.asarray(w))
    got = np.asarray(out.feats)
    print("span kernel ran; overflow:", int(ovf), flush=True)

    grid = site_grid(slab)
    tbl = window_tables(grid, dims, slab.coords, slab.valid, (3, 3, 3), vin=cap)
    ref = window_conv(slab, jnp.asarray(w), tbl, slab, kernel)
    reff = np.asarray(ref.feats)
    d = np.abs(got - reff).max()
    print(f"max |delta| vs window engine: {d:.6f}")
    # hardware MXU dots run at DEFAULT precision (bf16 passes) vs the
    # window engine's precision="highest"; ~5e-3 abs is expected rounding
    assert d < 2e-2, d
    print("OK")


if __name__ == "__main__":
    main()
