"""Incremental-window stem prototype (VERDICT round-1 #3).

Claim under test (PERF.md "Incremental window reuse"): in a fixed frame,
a tensor's (site, t) slice is supported on scan t's own site set and is
stationary under the window shift — so step s+1 can reuse step s's stem
activations for the 9 shared scans (one key-matched gather + slot shift)
and compute ONLY the new scan's slot with a T=1 pass over the new scan's
~0.25x-smaller site set.

This prototype runs the stem block (conv 5^3 + BN + ReLU, kt=1) both ways
on two consecutive bench windows and reports:
  - exactness: incremental vs direct full-window stem on the shifted
    window (must match to f32 tolerance)
  - timings of the direct stem vs (fresh T=1 pass + gather + merge)

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/proto_incremental_stem.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def fence(x):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def timeit(fn, args, name, iters=5):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="shrunken config for CPU correctness runs")
    args = ap.parse_args()
    if args.small:
        # the axon sitecustomize pins jax_platforms="axon,cpu"; shell env
        # is NOT enough (see .claude/skills/verify/SKILL.md)
        jax.config.update("jax_platforms", "cpu")

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.blocks_slab import subm_block_slab
    from insmos_tpu.nn.minkunet4d import _K3_STEM, _K_STEM, init_motionnet
    from insmos_tpu.sparse.slab import build_slab
    from insmos_tpu.sparse.span_conv import make_span_plan
    from insmos_tpu.sparse.slab import site_grid, window_tables

    cfg = _bench_cfg()
    if args.small:
        import dataclasses

        from insmos_tpu.config import MotionNetConfig

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                n_past_steps=4,
                motionnet=MotionNetConfig(
                    crop_range=(-12.8, -12.8, -4.0, 12.8, 12.8, 4.8),
                    site_capacities=(32768, 16384, 8192, 4096),
                ),
            ),
            runtime=dataclasses.replace(
                cfg.runtime, max_points_per_scan=8192
            ),
        )
    mc = cfg.model.motionnet
    W = cfg.model.n_past_steps
    seq = make_window(_bench_cfg(), seed=0, n_scans=W + 1)  # fixed frame
    P = cfg.runtime.max_points_per_scan
    if args.small:
        # subsample points into the shrunken crop
        pts = seq["points"]
        keep = (np.abs(pts[..., 0]) < 12.0) & (np.abs(pts[..., 1]) < 12.0)
        sub = np.zeros((pts.shape[0], P, 4), np.float32)
        for i in range(pts.shape[0]):
            sel = pts[i][keep[i]][:P]
            sub[i, : len(sel)] = sel
        seq = dict(seq, points=sub)
    else:
        P = seq["points"].shape[1]
    dims1 = mc.grid_size
    cap = mc.site_capacities[0]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)

    use_span = jax.default_backend() != "cpu"
    params, state = init_motionnet(jax.random.PRNGKey(0), cfg)
    bn = dict(bn_args={"momentum": 0.1, "eps": 1e-5}, train=False)

    def coords_of(pts):  # (n, 4) -> (n, 3) int voxels
        return jnp.floor((pts[..., :3] - lo) * 10.0).astype(jnp.int32)

    def window_slab(first):
        pts = jnp.asarray(seq["points"][first : first + W]).reshape(W * P, 4)
        tcol = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
        ).reshape(-1)
        valid = jnp.ones((W * P,), bool)
        slab, _, _, _ = build_slab(coords_of(pts), tcol, valid, dims1, W, cap)
        occf = (jnp.full((cap, W), 0.5, jnp.float32) * slab.occ).astype(
            jnp.float32
        )
        return slab.replace_feats(occf)

    def stem_tbl(slab):
        if use_span:
            return make_span_plan(
                slab.keys, slab.coords, slab.valid, _K3_STEM, in_dims=dims1,
                span=256, slots=1024, gwin=16,
            )
        return window_tables(
            site_grid(slab), dims1, slab.coords, slab.valid, _K3_STEM,
            vin=cap,
        )

    @jax.jit
    def direct_stem(slab):
        tbl = stem_tbl(slab)
        out, _ = subm_block_slab(
            params["stem"], state["stem"], slab, _K_STEM, tbl, **bn
        )
        return out

    s0 = jax.jit(window_slab, static_argnums=(0,))(0)
    out0 = timeit(direct_stem, (s0,), "direct stem, window [0..9]")
    s1 = window_slab(1)
    out1 = timeit(direct_stem, (s1,), "direct stem, window [1..10] (oracle)")

    # ---------------- incremental path --------------------------------
    scan_cap = (1 << 14) if args.small else (1 << 18)

    @jax.jit
    def fresh_new_scan():
        pts = jnp.asarray(seq["points"][W])  # scan index 10
        c3 = coords_of(pts)
        slab, _, _, _ = build_slab(
            c3, jnp.zeros((P,), jnp.int32), jnp.ones((P,), bool), dims1, 1,
            scan_cap,
        )
        occf = (jnp.full((scan_cap, 1), 0.5, jnp.float32) * slab.occ).astype(
            jnp.float32
        )
        slab = slab.replace_feats(occf)
        tbl = stem_tbl(slab)
        k1 = (_K_STEM[0], _K_STEM[1], _K_STEM[2], 1)
        out, _ = subm_block_slab(
            params["stem"], state["stem"], slab, k1, tbl, **bn
        )
        return out

    fresh = timeit(fresh_new_scan, (), "fresh T=1 stem on new scan's slab")

    C = 8

    @jax.jit
    def gather_merge(old_out, fresh_out, new_slab):
        # cached slots: old (site, t) -> new (site, t-1), key-matched
        pos = jnp.searchsorted(old_out.keys, new_slab.keys)
        pos = jnp.clip(pos, 0, old_out.capacity - 1)
        hit = (jnp.take(old_out.keys, pos) == new_slab.keys) & new_slab.valid
        rows = jnp.take(old_out.feats, pos, axis=0)  # (V, W*C)
        rows = jnp.where(hit[:, None], rows, 0.0)
        shifted = jnp.concatenate(
            [rows[:, C:], jnp.zeros((new_slab.capacity, C), rows.dtype)],
            axis=1,
        )
        # fresh slot W-1: key-matched from the scan slab
        fpos = jnp.searchsorted(fresh_out.keys, new_slab.keys)
        fpos = jnp.clip(fpos, 0, fresh_out.capacity - 1)
        fhit = (jnp.take(fresh_out.keys, fpos) == new_slab.keys) & new_slab.valid
        fr = jnp.take(fresh_out.feats, fpos, axis=0)  # (V, C)
        fr = jnp.where(fhit[:, None], fr, 0.0)
        merged = shifted.at[:, (new_slab.T - 1) * C :].set(fr)
        out = new_slab.replace_feats(merged)
        return out.replace_feats(out.mask_feats())

    inc = timeit(
        gather_merge, (out0, fresh, s1), "gather cached slots + merge fresh"
    )

    a = np.asarray(inc.feats)
    b = np.asarray(out1.feats)
    d = np.abs(a - b).max()
    print(f"\nincremental vs direct max |delta| = {d:.6f}")
    n_mismatch = int((np.abs(a - b).max(axis=1) > 1e-4).sum())
    print(f"sites mismatching > 1e-4: {n_mismatch} / {int(np.asarray(s1.valid).sum())}")
    assert d < 1e-3, d
    print("EXACT — per-slot stationarity + support claims hold")


if __name__ == "__main__":
    main()
