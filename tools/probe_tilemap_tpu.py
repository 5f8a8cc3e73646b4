"""Hardware validation of the banded-fold tile-skipping path (VERDICT r3 #2).

Stage 1 (smoke): a small T*cin>=256 shape with INSMOS_TILEMAP on — confirm
Mosaic compiles _fold_dot's run-split sub-dot/concat structure and the TPU
result matches the dense-fold path. Run FIRST: a crashing Pallas kernel
wedges the remote axon TPU ~40 min (verify skill).

Stage 2 (measure): time MotionNet-like block shapes (L2/L4/L8 channels,
T=10, kt=3; plus the t-pruned decoder shapes) both modes.

Usage: python tools/probe_tilemap_tpu.py [smoke|measure]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _mk_slab(rng, n, cap, cin, dims, T):
    import jax.numpy as jnp
    import numpy as np

    from insmos_tpu.sparse.slab import build_slab

    coords3 = np.stack(
        [rng.integers(0, e, n) for e in dims], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    slab, _, _, n_drop = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool),
        dims, T, cap,
    )
    assert int(n_drop) == 0
    feats = rng.normal(size=(cap, T * cin)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(feats))
    return slab.replace_feats(slab.mask_feats())


def _conv_both(slab, w, kernel, plan):
    import jax
    import numpy as np

    from insmos_tpu.sparse import span_conv

    outs = {}
    for enabled in (False, True):
        jax.clear_caches()
        orig = span_conv._tilemap_enabled
        span_conv._tilemap_enabled = lambda: enabled
        try:
            t0 = time.perf_counter()
            out = plan.conv(slab, w, slab, kernel)
            np.asarray(out.feats)  # fence compile+run
            compile_s = time.perf_counter() - t0
            # timed loop
            r = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = plan.conv(slab, w, slab, kernel)
                out.feats.block_until_ready()
                r.append(time.perf_counter() - t0)
            outs[enabled] = (np.asarray(out.feats), compile_s, min(r))
        finally:
            span_conv._tilemap_enabled = orig
    return outs


def smoke():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insmos_tpu.sparse.span_conv import make_span_plan

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    T, cin, cout = 8, 64, 32
    dims = (16, 12, 10)
    slab = _mk_slab(rng, 700, 1024, cin, dims, T)
    kernel = (3, 3, 3, 3)
    w = jnp.asarray(
        rng.normal(size=(int(np.prod(kernel)), cin, cout)).astype(np.float32)
    ) * 0.1
    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, kernel[:3], in_dims=dims
    )
    assert int(plan.n_overflow) == 0
    outs = _conv_both(slab, w, kernel, plan)
    dense, tiled = outs[False][0], outs[True][0]
    err = np.abs(dense - tiled).max()
    print(
        f"smoke ok: max|dense-tiled|={err:.2e} "
        f"compile dense={outs[False][1]:.1f}s tiled={outs[True][1]:.1f}s",
        flush=True,
    )
    assert err < 1e-3, "TPU tilemap output diverges from dense fold"


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insmos_tpu.sparse.span_conv import _fold_tilemap, ConvPart, make_span_plan

    rng = np.random.default_rng(3)
    T = 10
    # (label, n_sites, cap, dims, cin, cout, kt)
    cases = [
        # L8 convs (smallest first: cheapest compiles, earliest signal)
        ("L8 c32->32", 12_000, 16_384, (150, 125, 5), 32, 32, 3),
        ("L8 c64->64", 12_000, 16_384, (150, 125, 5), 64, 64, 3),
        # L4 block-like convs (block3 in, block6 cat 48->32)
        ("L4 c32->32", 40_000, 65_536, (300, 250, 10), 32, 32, 3),
        ("L4 c48->32", 40_000, 65_536, (300, 250, 10), 48, 32, 3),
        # L2 block2 second conv at real-ish occupancy
        ("L2 c16->16", 110_000, 131_072, (600, 500, 20), 16, 16, 3),
    ]
    kernel = (3, 3, 3, 3)
    for label, n, cap, dims, cin, cout, kt in cases:
        slab = _mk_slab(rng, n, cap, cin, dims, T)
        w = jnp.asarray(
            rng.normal(size=(27 * kt, cin, cout)).astype(np.float32)
        ) * 0.1
        plan = make_span_plan(
            slab.keys, slab.coords, slab.valid, kernel[:3], in_dims=dims,
            span=256, bs=128,
        )
        TCP = -(-T * cin // 128) * 128
        TOP = -(-T * cout // 128) * 128
        tm = _fold_tilemap((ConvPart(cin, cout, T, kt),), 3, T, TCP, TOP)
        dens = (
            "None"
            if tm is None
            else f"{np.mean(np.asarray(tm)):.2f}"
        )
        outs = _conv_both(slab, w, kernel, plan)
        err = np.abs(outs[False][0] - outs[True][0]).max()
        print(
            f"{label:12s} tilemap_density={dens:>5s} "
            f"dense={outs[False][2]*1e3:7.2f}ms tiled={outs[True][2]*1e3:7.2f}ms "
            f"speedup={outs[False][2]/outs[True][2]:.2f}x err={err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    {"smoke": smoke, "measure": measure}[mode]()
