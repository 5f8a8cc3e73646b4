"""Sweep (bs, span) per representative conv on the real bench site sets.

Extraction cost scales with span * TCP per site; smaller blocks allow
smaller spans (interval ~ bs + row effects) at the price of more
per-block overhead and narrower MXU dots. The jumbo coverage pass (exact,
gated) frees spans to hug the p50/p99 interval instead of the max.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/sweep_span_bs.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import _K3_BLOCK, _K3_STEM, _level_dims
    from insmos_tpu.sparse.slab import build_slab, derive_strided_sites
    from insmos_tpu.sparse.span_conv import make_span_plan, span_conv_apply

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        np.arange(P)[None, :] < sample["num_points"][:, None]
    ) & sample["scan_mask"][:, None]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor(
        (jnp.asarray(sample["points"][..., :3]).reshape(-1, 3) - lo) * 10.0
    ).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)
    dims1 = mc.grid_size
    caps = mc.site_capacities

    @jax.jit
    def levels(coords3, tcol, pvf):
        s1, _, _, _ = build_slab(coords3, tcol, pvf, dims1, W, caps[0])
        out = {1: s1}
        cur = s1
        for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
            nxt, _, _ = derive_strided_sites(
                cur, (2, 2, 2), (2, 2, 2), (0, 0, 0), _level_dims(dims1, fout), cap
            )
            out[fout] = nxt
            cur = nxt
        return out

    slabs = levels(coords3, tcol, jnp.asarray(pv.reshape(-1)))
    rng = np.random.default_rng(0)

    # (name, level, kernel3, kt, cin, cout, Tin, Tout)
    convs = [
        ("stem L1 5^3 1->8 T10", 1, _K3_STEM, 1, 1, 8, 10, 10),
        ("b8c1 L1 3^4 16->8 T3>2", 1, _K3_BLOCK, 3, 16, 8, 3, 2),
        ("b8c2 L1 3^4 8->8 T2>1", 1, _K3_BLOCK, 3, 8, 8, 2, 1),
        ("b1 L2 3^4 8->8 T10", 2, _K3_BLOCK, 3, 8, 8, 10, 10),
        ("b7c1 L2 3^4 24->16 T5>4", 2, _K3_BLOCK, 3, 24, 16, 5, 4),
        ("b2 L4 3^4 8->16 T10", 4, _K3_BLOCK, 3, 8, 16, 10, 10),
        ("b3c2 L8 3^4 32->32 T8>7", 8, _K3_BLOCK, 3, 32, 32, 8, 7),
    ]
    combos = [(128, 256), (128, 384), (64, 128), (64, 192), (64, 256),
              (32, 128), (128, 192)]

    for name, f, k3, kt, cin, cout, Tin, Tout in convs:
        s = slabs[f]
        dims = _level_dims(dims1, f) if f > 1 else dims1
        occ = s.valid[:, None] & jnp.ones((1, Tin), bool)
        feats = jnp.asarray(
            rng.normal(0, 1, (s.capacity, Tin * cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        feats = jnp.where(jnp.repeat(occ, cin, axis=1), feats, 0)
        K = int(np.prod(k3)) * kt
        w = jnp.asarray(
            rng.normal(0, 0.1, (K, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        doff = Tin - Tout

        for bs, span in combos:
            try:
                plan = make_span_plan(
                    s.keys, s.coords, s.valid, k3, in_dims=dims,
                    span=span, bs=bs, jbcap=max(32, 4096 // bs // 8), gwin=16,
                )
                ovf = int(plan.n_overflow)
                run = jax.jit(
                    lambda f_, w_, plan=plan, Tin=Tin, kt=kt, Tout=Tout,
                    doff=doff, s=s: span_conv_apply(
                        s.keys, f_, s.coords, s.valid, w_, plan, Tin, kt,
                        Tout, doff,
                    )
                )
                out = run(feats, w)
                float(jnp.sum(out.astype(jnp.float32)))
                t0 = time.perf_counter()
                for _ in range(5):
                    out = run(feats, w)
                float(jnp.sum(out.astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / 5 * 1000
                print(f"{name:28s} bs={bs:3d} span={span:3d} "
                      f"{dt:7.2f} ms  ovf={ovf}", flush=True)
            except Exception as e:
                print(f"{name:28s} bs={bs:3d} span={span:3d} FAILED: "
                      f"{type(e).__name__} {str(e)[:80]}", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
