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
    print("subm OK", flush=True)

    # ---- jumbo path: narrow-span strided conv forces jump blocks ------
    from insmos_tpu.sparse.slab import derive_strided_sites
    from insmos_tpu.sparse.span_conv import make_span_plan

    dims2 = tuple(-(-x // 2) for x in dims)
    sout, _, _ = jax.jit(
        lambda s: derive_strided_sites(s, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, 2048)
    )(slab)
    w2 = rng.normal(0, 0.1, (8, C, CO)).astype(np.float32)
    plan = make_span_plan(
        slab.keys, sout.coords, sout.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=dims, span=128, bs=64,
        slots=256, gwin=16,
    )  # span % 128 == 0: Mosaic's keys-DMA lane alignment on hardware
    print("coverage slots:", int((np.asarray(plan.gs)[1] >= 0).sum()),
          "overflow:", int(plan.n_overflow), flush=True)
    assert int(plan.n_overflow) == 0
    got2 = plan.conv(slab, jnp.asarray(w2), sout, (2, 2, 2, 1))
    tbl2 = window_tables(
        site_grid(slab), dims, sout.coords, sout.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=cap,
    )
    ref2 = window_conv(slab, jnp.asarray(w2), tbl2, sout, (2, 2, 2, 1))
    d2 = np.abs(np.asarray(got2.feats) - np.asarray(ref2.feats)).max()
    print(f"jumbo max |delta| vs window engine: {d2:.6f}")
    assert d2 < 2e-2, d2
    print("OK")


if __name__ == "__main__":
    main()
