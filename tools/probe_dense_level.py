"""Dense-vs-span micro-benchmark at MotionNet coarse levels (VERDICT #2).

At stride 8 the grid is ~160x136x16 (~348k cells) with only ~50k occupied
sites: a dense XLA conv_general_dilated has ZERO extraction overhead and
near-peak MXU MFU, so the span engine's one-hot extraction dots there may
be pure overhead. This probe builds the real L4/L8 site sets from the bench
window and times, per level:

  - span engine subm conv (the current inference path)
  - dense: scatter -> conv_general_dilated (t-band folded weights) -> gather

and checks they agree. Run on TPU:  python tools/probe_dense_level.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def fence(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[0].astype(jnp.float32) if isinstance(x, tuple) else x.astype(jnp.float32)))


def timeit(fn, args, iters=5, name=""):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import _K3_BLOCK, _K3_DOWN, _P0, _S2, _level_dims
    from insmos_tpu.sparse.slab import build_slab, derive_strided_sites
    from insmos_tpu.sparse.span_conv import fold_weights, make_span_plan

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        np.arange(P)[None, :] < sample["num_points"][:, None]
    ) & sample["scan_mask"][:, None]

    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    xyz = jnp.asarray(sample["points"][..., :3]).reshape(W * P, 3)
    coords3 = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)
    dims1 = mc.grid_size
    caps = mc.site_capacities

    @jax.jit
    def levels(coords3, tcol, pvf):
        s1, _, n1, _ = build_slab(coords3, tcol, pvf, dims1, W, caps[0])
        out = {1: s1}
        ns = {1: n1}
        cur = s1
        for lvl, (fin, fout, cap) in enumerate(
            ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3]))
        ):
            dims_o = _level_dims(dims1, fout)
            nxt, n_s, _ = derive_strided_sites(
                cur, _K3_DOWN, _S2, _P0, dims_o, cap
            )
            # occupancy: approximate as parent-OR via derive + occ of child
            # (values don't matter for timing; use valid as occ)
            nxt = nxt.replace_feats(nxt.feats)
            out[fout] = nxt
            ns[fout] = n_s
            cur = nxt
        return out, ns

    slabs, ns = levels(coords3, tcol, jnp.asarray(pv.reshape(-1)))
    for f in (1, 2, 4, 8):
        print(f"L{f}: sites={int(ns[f])} cap={slabs[f].capacity} "
              f"dims={_level_dims(dims1, f) if f > 1 else dims1}")

    rng = np.random.default_rng(0)
    for f, cin, cout, span in ((8, 16, 32, 512), (4, 8, 16, 256)):
        s = slabs[f]
        dims = _level_dims(dims1, f)
        T = W
        TC, TO = T * cin, T * cout
        occ = s.valid[:, None] & jnp.ones((1, T), bool)
        s = s.__class__(
            s.keys, s.coords, occ,
            jnp.asarray(rng.normal(0, 1, (s.capacity, TC)).astype(np.float32)),
            s.valid, tuple(dims), T,
        )
        s = s.replace_feats(s.mask_feats())
        w = jnp.asarray(
            rng.normal(0, 0.1, (27 * 3, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        kernel = (3, 3, 3, 3)

        # ---- span path
        plan = make_span_plan(
            s.keys, s.coords, s.valid, _K3_BLOCK, in_dims=dims, bs=128,
            span=span,
        )

        @jax.jit
        def span_conv(s_in, weight):
            return plan.conv(s_in, weight, s_in, kernel).feats

        out_s, t_span = timeit(
            span_conv, (s, w), 5, f"L{f} span subm conv {cin}->{cout}"
        )

        # ---- dense path
        X, Y, Z = dims
        ncells = X * Y * Z
        wg = fold_weights(w, 3, 9, 3, T, jnp.bfloat16)  # (9, 3*TC, TO)
        # (G=9: ky fast, kz slow) x (kx fast) -> (kz, ky, kx, TC, TO)
        wsp = wg.reshape(3, 3, 3, TC, TO)  # (kz, ky, kx*TC split next)

        @jax.jit
        def dense_conv(s_in, wsp):
            safe = jnp.where(s_in.valid, s_in.keys, ncells)
            dense = jnp.zeros((ncells + 1, TC), jnp.bfloat16)
            dense = dense.at[safe].set(
                s_in.feats.astype(jnp.bfloat16), mode="drop"
            )
            lhs = dense[:ncells].reshape(1, Z, Y, X, TC)
            out = jax.lax.conv_general_dilated(
                lhs, wsp.reshape(3, 3, 3, TC, TO),
                window_strides=(1, 1, 1),
                padding="SAME",
                dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
                preferred_element_type=jnp.float32,
            )  # (1, Z, Y, X, TO)
            flat = out.reshape(ncells, TO)
            got = jnp.take(flat, jnp.where(s_in.valid, s_in.keys, 0), axis=0)
            got = jnp.where(s_in.valid[:, None], got, 0.0)
            # re-mask to occupancy like the engine invariant
            m = jnp.repeat(s_in.occ, cout, axis=1)
            return jnp.where(m, got, 0.0)

        out_d, t_dense = timeit(
            dense_conv, (s, wsp), 5, f"L{f} dense conv {cin}->{cout}"
        )

        a = np.asarray(out_s, np.float32)
        b = np.asarray(out_d, np.float32)
        d = np.abs(a - b).max()
        print(f"L{f} max |span - dense| = {d:.4f}  "
              f"(span {t_span:.1f} ms vs dense {t_dense:.1f} ms)")


if __name__ == "__main__":
    main()
