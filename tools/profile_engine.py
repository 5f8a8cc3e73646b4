"""Fine-grained slab-engine profiling at MotionNet L1 scale.

Times each engine primitive as its own jit on the current platform:
site build, site_grid, window_tables (stem 5x5 / block 3x3), window_conv,
strided site derivation. Run AFTER tools/profile_stages.py for the
stage-level picture; this decomposes the dominant stage.

  python tools/profile_engine.py [--iters 3] [--cap 524288]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def _fence(out):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def timeit(fn, args, iters, name):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cap", type=int, default=524_288)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.sparse.slab import (
        build_slab,
        derive_strided_sites,
        site_grid,
        window_conv,
        window_tables,
    )

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    dims1 = mc.grid_size
    W = cfg.model.n_past_steps
    cap = args.cap
    chunk = cfg.runtime.conv_chunk

    sample = make_window(cfg)
    P = sample["points"].shape[1]
    pts = jnp.asarray(sample["points"])
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor((pts[..., :3].reshape(-1, 3) - lo) * 10.0).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)

    build = jax.jit(
        lambda c, t, v: build_slab(c, t, v, dims1, W, cap)
    )
    slab, p2s, n1, d1 = timeit(
        build, (coords3, tcol, pv.reshape(-1)), args.iters, "build_slab L1"
    )
    print(f"{'':40s} sites={int(n1)} dropped={int(d1)}")
    slab = slab.replace_feats(
        (jnp.full((cap, W), 0.5, jnp.float32) * slab.occ).astype(jnp.float32)
    )

    grid = timeit(jax.jit(site_grid), (slab,), args.iters, "site_grid L1")

    t_stem = jax.jit(
        lambda g, s: window_tables(g, dims1, s.coords, s.valid, (5, 5, 5), vin=cap)
    )
    tab_stem = timeit(t_stem, (grid, slab), args.iters, "window_tables stem 5x5 (G=25)")

    t_blk = jax.jit(
        lambda g, s: window_tables(g, dims1, s.coords, s.valid, (3, 3, 3), vin=cap)
    )
    tab_blk = timeit(t_blk, (grid, slab), args.iters, "window_tables block 3x3 (G=9)")

    key = jax.random.PRNGKey(0)
    w_stem = (jax.random.normal(key, (125, 1, 8)) * 0.1).astype(jnp.bfloat16)
    conv_stem = jax.jit(
        lambda s, w, t: window_conv(s, w, t, s, (5, 5, 5, 1), chunk=chunk)
    )
    timeit(conv_stem, (slab, w_stem, tab_stem), args.iters, "window_conv stem 1->8")

    slab8 = slab.replace_feats(
        jnp.zeros((cap, W * 8), jnp.float32)
        .at[:, :]
        .set(jax.random.normal(key, (cap, W * 8)) * 0.1)
    )
    slab8 = slab8.replace_feats(slab8.mask_feats())
    w_blk = (jax.random.normal(key, (81, 8, 8)) * 0.1).astype(jnp.bfloat16)
    conv_blk = jax.jit(
        lambda s, w, t: window_conv(s, w, t, s, (3, 3, 3, 3), chunk=chunk)
    )
    timeit(conv_blk, (slab8, w_blk, tab_blk), args.iters, "window_conv 3^4 8->8")

    dims2 = tuple(-(-d // 2) for d in dims1)
    deriv = jax.jit(
        lambda s: derive_strided_sites(s, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, cap // 2)
    )
    timeit(deriv, (slab,), args.iters, "derive_strided_sites L1->L2")


def span_bench():
    """Benchmark the Pallas span kernel at L1 scale (run with --span)."""
    import argparse
    import jax
    import jax.numpy as jnp

    from bench import _bench_cfg, make_window
    from insmos_tpu.sparse.slab import build_slab
    from insmos_tpu.sparse.span_conv import span_conv_slab

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    dims1 = mc.grid_size
    W = cfg.model.n_past_steps
    cap = mc.site_capacities[0]

    sample = make_window(cfg)
    P = sample["points"].shape[1]
    pts = jnp.asarray(sample["points"])
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor((pts[..., :3].reshape(-1, 3) - lo) * 10.0).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)
    slab, _, n1, _ = jax.jit(
        lambda c, t, v: build_slab(c, t, v, dims1, W, cap)
    )(coords3, tcol, pv.reshape(-1))
    key = jax.random.PRNGKey(0)
    print(f"sites={int(n1)}")

    # stem 5x5x5x1, cin=1
    slab1 = slab.replace_feats(
        (jnp.full((cap, W), 0.5, jnp.float32) * slab.occ).astype(jnp.float32)
    )
    w_stem = (jax.random.normal(key, (125, 1, 8)) * 0.1).astype(jnp.bfloat16)
    f_stem = jax.jit(
        lambda s, w: span_conv_slab(s, w, s, (5, 5, 5, 1))[0].feats.sum()
    )
    timeit(lambda s, w: f_stem(s, w), (slab1, w_stem), 3, "span stem 5^3x1 1->8")

    # block 3^4, cin=8
    slab8 = slab.replace_feats(
        jax.random.normal(key, (cap, W * 8)).astype(jnp.float32)
    )
    slab8 = slab8.replace_feats(slab8.mask_feats())
    w_blk = (jax.random.normal(key, (81, 8, 8)) * 0.1).astype(jnp.bfloat16)
    f_blk = jax.jit(
        lambda s, w: span_conv_slab(s, w, s, (3, 3, 3, 3))[0].feats.sum()
    )
    timeit(lambda s, w: f_blk(s, w), (slab8, w_blk), 3, "span block 3^4 8->8")

    # overflow count
    _, ovf = jax.jit(lambda s, w: span_conv_slab(s, w, s, (3, 3, 3, 3)))(slab8, w_blk)
    print(f"span overflow rows (3^4): {int(ovf)}")
    _, ovf = jax.jit(lambda s, w: span_conv_slab(s, w, s, (5, 5, 5, 1)))(slab1, w_stem)
    print(f"span overflow rows (stem): {int(ovf)}")


if __name__ == "__main__":
    if "--span" in sys.argv:
        sys.argv.remove("--span")
        span_bench()
    else:
        main()
