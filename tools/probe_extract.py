"""Probe span-kernel extraction restructurings on the real TPU.

The production kernel (sparse/span_conv.py) interleaves per-d one-hot
construction (VPU) with small (BS, span)@(span, TCP) dots (MXU), measuring
~17-20 TF/s effective — ~10% of the chip's bf16 peak. Variants probed here
on a synthetic single-part, no-jumbo geometry with the same DMA structure:

  A  current: per d, where-masked query compare -> oh -> dot; lane-concat;
     one (BS, kx*TCP) @ (kx*TCP, TOP) weight dot
  B  batched-M: delta = kspan - q ONCE; per-d compares stacked to a
     (kx*BS, span) one-hot; ONE extraction dot -> (kx*BS, TCP); kx weight
     dots (BS, TCP) @ (TCP, TOP) accumulated
  C  A but with delta-once construction (isolates construction savings)

  JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_extract.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, args, iters=10, name=""):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"  {name:44s} {dt:9.2f} ms", flush=True)
    return dt, out


def make_case(V, TCP, TOP, span, G, kx, bs, seed=0):
    rng = np.random.default_rng(seed)
    NB = V // bs
    # dense consecutive keys: block b's queries hit rows [b*bs, b*bs+bs+kx)
    keys = np.arange(V, dtype=np.int32) * 2  # advance 2: kx offsets used
    nr16 = V // 16 + 17
    kpad = np.concatenate([keys, np.full(nr16 * 16 + span - V, 2**30, np.int32)])
    keys2 = np.concatenate(
        [kpad[j * 16 : j * 16 + nr16 * 16].reshape(nr16, 16) for j in range(span // 16)],
        axis=1,
    )
    feats = rng.normal(0, 1, (V + span + 16, TCP)).astype(np.float32)
    wg = rng.normal(0, 0.1, (G, kx * TCP, TOP)).astype(np.float32)
    # per-(g, b) span start in tile units: center-ish anchor
    sb = np.maximum(np.arange(NB, dtype=np.int32) * bs // 16 - 2, 0)
    sb = np.broadcast_to(sb, (G, NB)).copy()
    # queries: block b site i queries key 2*(b*bs + i) + small per-g jitter
    q0 = (np.arange(V, dtype=np.int32) * 2).reshape(NB, 1, bs)
    q0 = np.broadcast_to(q0, (NB, 8, bs)).copy()
    return (
        jnp.asarray(sb),
        jnp.asarray(q0),
        jnp.asarray(keys2),
        jnp.asarray(feats, jnp.bfloat16),
        jnp.asarray(wg, jnp.bfloat16),
    )


def _dma(keys2_ref, feats_ref, kscr, fscr, sems, r, span, slot):
    s = pl.multiple_of(r * 16, 16)
    r8 = pl.multiple_of((r // 8) * 8, 8)
    ck = pltpu.make_async_copy(
        keys2_ref.at[pl.ds(r8, 8), :], kscr.at[slot], sems.at[slot, 0]
    )
    cf = pltpu.make_async_copy(
        feats_ref.at[pl.ds(s, span), :], fscr.at[slot], sems.at[slot, 1]
    )
    return ck, cf


def kern_A(sb_ref, q_ref, wg_ref, keys2_ref, feats_ref, out_ref,
           kscr, fscr, acc, sems, *, kx, G, span, bs):
    b = pl.program_id(0)

    def copies(gi, slot):
        return _dma(keys2_ref, feats_ref, kscr, fscr, sems,
                    sb_ref[gi, b], span, slot)

    q = q_ref[0, 0, :]
    for c in copies(0, 0):
        c.start()
    for gi in range(G):
        slot = gi % 2
        if gi + 1 < G:
            for c in copies(gi + 1, 1 - slot):
                c.start()
        for c in copies(gi, slot):
            c.wait()
        r = sb_ref[gi, b]
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)
        kspan = jnp.sum(
            jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
            axis=0, keepdims=True,
        )
        f = fscr[slot]
        parts = []
        for d in range(kx):
            qd = q + d  # (bs,)
            oh = (kspan == qd[:, None]).astype(wg_ref.dtype)
            parts.append(
                jax.lax.dot_general(
                    oh, f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        src = jnp.concatenate(parts, axis=1).astype(wg_ref.dtype)
        contrib = jax.lax.dot_general(
            src, wg_ref[gi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if gi == 0:
            acc[:] = contrib
        else:
            acc[:] = acc[:] + contrib
    out_ref[:] = acc[:]


def kern_B(sb_ref, q_ref, wg_ref, keys2_ref, feats_ref, out_ref,
           kscr, fscr, acc, sems, *, kx, G, span, bs):
    b = pl.program_id(0)
    TCP = fscr.shape[-1]

    def copies(gi, slot):
        return _dma(keys2_ref, feats_ref, kscr, fscr, sems,
                    sb_ref[gi, b], span, slot)

    q = q_ref[0, 0, :]
    for c in copies(0, 0):
        c.start()
    for gi in range(G):
        slot = gi % 2
        if gi + 1 < G:
            for c in copies(gi + 1, 1 - slot):
                c.start()
        for c in copies(gi, slot):
            c.wait()
        r = sb_ref[gi, b]
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)
        kspan = jnp.sum(
            jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
            axis=0, keepdims=True,
        )
        delta = kspan - q[:, None]  # (bs, span) int32
        oh = jnp.concatenate(
            [(delta == d).astype(wg_ref.dtype) for d in range(kx)], axis=0
        )  # (kx*bs, span)
        src = jax.lax.dot_general(
            oh, fscr[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (kx*bs, TCP)
        srcb = src.astype(wg_ref.dtype)
        w3 = wg_ref[gi].reshape(kx, TCP, wg_ref.shape[-1])
        contrib = jax.lax.dot_general(
            srcb[0 * bs : 1 * bs], w3[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for d in range(1, kx):
            contrib = contrib + jax.lax.dot_general(
                srcb[d * bs : (d + 1) * bs], w3[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if gi == 0:
            acc[:] = contrib
        else:
            acc[:] = acc[:] + contrib
    out_ref[:] = acc[:]


def kern_C(sb_ref, q_ref, wg_ref, keys2_ref, feats_ref, out_ref,
           kscr, fscr, acc, sems, *, kx, G, span, bs):
    b = pl.program_id(0)

    def copies(gi, slot):
        return _dma(keys2_ref, feats_ref, kscr, fscr, sems,
                    sb_ref[gi, b], span, slot)

    q = q_ref[0, 0, :]
    for c in copies(0, 0):
        c.start()
    for gi in range(G):
        slot = gi % 2
        if gi + 1 < G:
            for c in copies(gi + 1, 1 - slot):
                c.start()
        for c in copies(gi, slot):
            c.wait()
        r = sb_ref[gi, b]
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)
        kspan = jnp.sum(
            jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
            axis=0, keepdims=True,
        )
        delta = kspan - q[:, None]
        f = fscr[slot]
        parts = []
        for d in range(kx):
            oh = (delta == d).astype(wg_ref.dtype)
            parts.append(
                jax.lax.dot_general(
                    oh, f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        src = jnp.concatenate(parts, axis=1).astype(wg_ref.dtype)
        contrib = jax.lax.dot_general(
            src, wg_ref[gi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if gi == 0:
            acc[:] = contrib
        else:
            acc[:] = acc[:] + contrib
    out_ref[:] = acc[:]


def run_case(name, V, TCP, TOP, span, G, kx=3, bs=128):
    print(f"{name}: V={V} TCP={TCP} TOP={TOP} span={span} G={G}", flush=True)
    sb, q0, keys2, feats, wg = make_case(V, TCP, TOP, span, G, kx, bs)
    NB = V // bs

    def make(kern):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, 8, bs), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((G, kx * TCP, TOP), lambda b, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bs, TOP), lambda b, *_: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 8, span), jnp.int32),
                pltpu.VMEM((2, span, TCP), jnp.bfloat16),
                pltpu.VMEM((bs, TOP), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        k = functools.partial(kern, kx=kx, G=G, span=span, bs=bs)
        return jax.jit(
            lambda sb, q0, keys2, feats, wg: pl.pallas_call(
                k, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((V, TOP), jnp.float32),
            )(sb, q0, wg, keys2, feats)
        )

    outs = {}
    times = {}
    for nm, kern in (("A current", kern_A), ("B batched-M", kern_B),
                     ("C delta-once", kern_C)):
        times[nm], outs[nm] = bench(make(kern), (sb, q0, keys2, feats, wg), name=nm)
    a = np.asarray(outs["A current"])
    for nm in ("B batched-M", "C delta-once"):
        d = np.abs(np.asarray(outs[nm]) - a).max()
        assert d < 1e-3, (nm, d)
    # effective TF/s on extraction+weight FLOPs
    fl = V * G * (kx * span * TCP + kx * TCP * TOP) * 2
    for nm, t in times.items():
        print(f"    {nm:20s} {fl / (t / 1e3) / 1e12:6.1f} TF/s eff")


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_case("MotionNet L2 block", V=327_680, TCP=128, TOP=128, span=256, G=9)
    run_case("MotionNet L8 block", V=65_536, TCP=384, TOP=384, span=384, G=9)
    run_case("UNet L1 (C=16)", V=100_096 // 128 * 128, TCP=128, TOP=128,
             span=256, G=9)
    run_case("UNet L4 (C=128)", V=24_576, TCP=128, TOP=128, span=384, G=9)


if __name__ == "__main__" and "--production" not in sys.argv:
    main()


# ---------------------------------------------------------------------------
# Production-kernel decomposition: same synthetic case driven through the
# REAL span_conv machinery, stepwise.
#   D  production _kernel, jumbo disabled (isolates pl.when + site-q costs)
#   E  full span_conv_apply with a real plan (adds jumbo pass + XLA glue)
# ---------------------------------------------------------------------------

def run_production(name, V, C_in, C_out, T, span, G, kx=3, bs=128, seed=0):
    from insmos_tpu.sparse.span_conv import make_span_plan, span_conv_apply
    from insmos_tpu.sparse.slab import _groups_yz

    rng = np.random.default_rng(seed)
    # synthetic site set on a realistic grid: keys advance ~2/site
    X, Y, Z = 600, 500, 20
    nneed = V * 2
    flat = np.sort(rng.choice(X * Y * Z, size=nneed, replace=False)[:V]).astype(np.int32)
    coords = np.stack([flat % X, (flat // X) % Y, flat // (X * Y)], axis=1).astype(np.int32)
    keys = ((coords[:, 2].astype(np.int64) * Y + coords[:, 1]) * X + coords[:, 0]).astype(np.int32)
    order = np.argsort(keys)
    keys = keys[order]; coords = coords[order]
    valid = np.ones((V,), bool)
    feats = rng.normal(0, 1, (V, T * C_in)).astype(np.float32)
    w = rng.normal(0, 0.1, (kx * G, C_in, C_out)).astype(np.float32)

    keys_j = jnp.asarray(keys); coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid); feats_j = jnp.asarray(feats)
    w_j = jnp.asarray(w, jnp.bfloat16)

    plan = jax.jit(
        lambda k, c, v: make_span_plan(
            k, c, v, (kx, 3, 3), in_dims=(X, Y, Z), span=span, bs=bs,
            slots=1024, gwin=16,
        )
    )(keys_j, coords_j, valid_j)
    jax.block_until_ready(plan.sb)
    novf = int(plan.n_overflow)
    print(f"{name}: V={V} T={T} C={C_in}->{C_out} span={span} overflow={novf}",
          flush=True)

    import dataclasses
    plan0 = dataclasses.replace(
        plan,
        gs=jnp.zeros((4, 0), jnp.int32),
        slots=0,
    )

    fn_nojumbo = jax.jit(
        lambda f: span_conv_apply(keys_j, f, coords_j, valid_j, w_j, plan0, T)
    )
    fn_full = jax.jit(
        lambda f: span_conv_apply(keys_j, f, coords_j, valid_j, w_j, plan, T)
    )
    bench(fn_nojumbo, (feats_j,), name="D production, no jumbo")
    bench(fn_full, (feats_j,), name="E production + jumbo")


def main2():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_production("MotionNet L2-like", V=327_680, C_in=8, C_out=8, T=10,
                   span=256, G=9)
    run_production("MotionNet L8-like", V=65_536, C_in=32, C_out=32, T=10,
                   span=384, G=9)
    run_production("UNet L1-like", V=99_968, C_in=16, C_out=16, T=1,
                   span=256, G=9)


if __name__ == "__main__" and "--production" in sys.argv:
    main2()
