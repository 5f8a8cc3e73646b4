"""Pallas TPU span convolution — the fused fast path of the slab engine.

Replaces window_tables + window_conv (slab.py) for the inference hot path.
Key idea: sites are sorted by 3D key, so the input rows a block of 128
consecutive output sites needs for one (dy, dz) kernel offset group form a
BOUNDED, NEARLY-CONTIGUOUS span of the input site array (average advance
1 site/site). Per (site-block, group) the kernel

1. DMAs the key span and feature span (sequential HBM reads) into VMEM,
2. computes per-site window ranks by comparing the key span against the
   site's query keys (kx+1 lane reductions — this replaces the entire
   grid-probe table machinery of window_tables),
3. extracts each site's kx-row window with ONE one-hot matmul against a
   roll-stacked span (MXU does the gather),
4. aligns window slots to kernel x-positions with in-register selects,
5. applies the t-folded block-diagonal group weight as a second MXU matmul,

accumulating over groups in the output block. No random row gathers
(measured ~24 ns each in XLA regardless of width — the old engine's floor)
and no (V, 256) grid probes remain.

Span overflow (a block whose true input span exceeds SPAN rows — possible
when neighbour rows are much denser than the block's own rows) drops the
out-of-span contributions; the XLA wrapper counts affected rows per conv
and surfaces them through the model's overflow stats, consistent with the
engine's capacity philosophy (slab.py docstring).

The XLA windowed path remains the training/backward and CPU
implementation; tests compare this kernel (interpret mode on CPU) against
it bit-for-bit-ish (f32 tolerance).

Reference being replaced: MinkowskiEngine kernel maps / spconv indice_key
rulebooks (SURVEY.md S2.2; models/MinkowskiEngine/minkunet.py:55-137,
models/backbones_3d/spconv_unet.py:120-207).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slab import INT32_MAX, Slab, _compact_by_sort, _groups_yz
from .tensor import KEY_SENTINEL

BS = 128  # sites per block
SPAN = 256  # input span rows fetched per (block, group)
# Packed-window kernel: kx× fewer extraction FLOPs on paper, but measured
# 2.5× SLOWER end-to-end at full scale on real TPU (0.671 vs 1.665 scans/s,
# 2026-08-19) — the per-row packing scatter + narrow-lane DMA pattern costs
# more than the extraction dots it saves. Kept opt-in for future tuning.
PACKED_ENABLE = os.environ.get("INSMOS_PACKED", "0") == "1"


def _tilemap_enabled() -> bool:
    """Banded-fold tile-skipping (_fold_tilemap/_fold_dot) gate.

    Off by default: the run-split sub-dot/concat pattern it emits has not
    been validated through Mosaic on real TPU hardware, and this class of
    fewer-FLOPs-on-paper change has regressed before (INSMOS_PACKED was
    measured 2.5x slower end-to-end). Enable with INSMOS_TILEMAP=1 only
    after a TPU compile+bench confirms it wins; read at trace time, so
    flipping the env var requires a fresh trace (jax.clear_caches() in
    tests)."""
    return os.environ.get("INSMOS_TILEMAP", "0") == "1"


def _bisect(keys, queries, n_iter):
    """Vectorized first-index-with-key >= query over a sorted array.

    Dispatches by query count (static shapes): binary search costs
    Q * log2(Vin) random row takes (~20 ns each — PERF.md), a merged sort
    costs (Vin + Q) sorted rows (~8 ns each), so the merge wins for the
    plan-wide query batches (~10^5 queries) and the search wins for the
    handful of jumbo sentinel anchors."""
    Q_total = int(np.prod(queries.shape))
    if Q_total * max(n_iter, 1) * 3 < keys.shape[0] + Q_total:
        return _bisect_search(keys, queries, n_iter)
    return _bisect_merge(keys, queries)


def _bisect_search(keys, queries, n_iter):
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, keys.shape[0], jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = jnp.take(keys, mid)
        less = v < queries
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo


def _bisect_merge(keys, queries):
    """Merged-sort lower bound. Ties place queries BEFORE keys, so the
    running key count at a query equals #keys-strictly-less ==
    first-index-with-key >= query (keys unique; KEY_SENTINEL padding ties
    are counted out the same way)."""
    Vin = keys.shape[0]
    qf = queries.reshape(-1)
    Q = qf.shape[0]
    vals = jnp.concatenate([keys, qf])
    is_key = jnp.concatenate(
        [jnp.ones((Vin,), jnp.int32), jnp.zeros((Q,), jnp.int32)]
    )
    payload = jnp.concatenate(
        [jnp.full((Vin,), INT32_MAX, jnp.int32), jnp.arange(Q, dtype=jnp.int32)]
    )
    _, st, sp = jax.lax.sort((vals, is_key, payload), num_keys=2)
    nkeys_before = (jnp.cumsum(st) - st).astype(jnp.int32)
    _, pos = jax.lax.sort((sp, nkeys_before), num_keys=1)
    return pos[:Q].reshape(queries.shape)


def fold_weights(weight, kx, G, kt, T, dtype, T_out=None, t0_off=0):
    """(K, cin, cout) -> (G, kx*T*cin, T_out*cout) with the t-kernel folded
    in as a (T, T_out) band — identical layout to window_conv's wg. A
    rectangular band (T_out < T, t0_off > 0) realizes t-pruned inference
    (slab.slice_slots)."""
    from .slab import t_band

    K, cin, cout = weight.shape
    if T_out is None:
        T_out = T
    w5 = weight.reshape(kt, G, kx, cin, cout)
    bands = t_band(kt, T, T_out, t0_off, dtype)
    return jnp.einsum(
        "igdco,itp->gdtcpo", w5.astype(dtype), bands
    ).reshape(G, kx * T * cin, T_out * cout)


@dataclasses.dataclass(frozen=True)
class ConvPart:
    """Static descriptor of one input segment of a multi-part span conv.

    A multi-part conv runs ONE kernel pass over a lane-blocked concat of
    several feature arrays (each part's (T*cin) lane block at `in_off`),
    with the folded weight scattered to matching K rows — this replaces
    per-t interleaved channel concats (ME.cat / occupancy channels), whose
    narrow-lane relayouts measured ~3 ms per slice on TPU (PERF.md).
    conv(cat(a, b), W) == conv_parts([a, b], [W[:, :Ca], W[:, Ca:]]).
    """

    cin: int
    cout: int
    T: int
    kt: int = 1
    in_off: int = 0   # lane offset of this part's T*cin block in feats_cat
    out_off: int = 0  # lane offset of this part's T_out*cout output block
    t0_off: int = 0


def fold_weights_parts(weights, parts, kx, G, T_out, dtype, TC_tot, TO_tot):
    """Fold each part's weight and scatter it into the joint
    (G, kx*TC_tot, TO_tot) matrix at its (in_off, out_off) block. Parts'
    K-row ranges are disjoint by construction; parts sharing out_off
    accumulate through the matmul row sum (channel-split cat)."""
    wg4 = jnp.zeros((G, kx, TC_tot, TO_tot), dtype)
    for w, pt in zip(weights, parts):
        wp = fold_weights(
            w, kx, G, pt.kt, pt.T, dtype, T_out=T_out, t0_off=pt.t0_off
        ).reshape(G, kx, pt.T * pt.cin, T_out * pt.cout)
        wg4 = jax.lax.dynamic_update_slice(
            wg4, wp.astype(dtype), (0, 0, pt.in_off, pt.out_off)
        )
    return wg4.reshape(G, kx * TC_tot, TO_tot)


def _fold_tilemap(parts, kx, T_out, TCP, TOP):
    """Static (KT, NT) nonzero-128x128-tile map of the folded multi-part
    weight. The (T_in, T_out) t-band (fold_weights/t_band) zeroes every
    (input slot, output slot) block with |i - p - t0_off + lo| outside the
    t-kernel, which at T*cin >= 128 leaves most weight tiles exactly zero —
    the "t-band inflates high-C fold matmuls by ~T/kt" cost named in
    PERF.md. The kernels skip zero tiles with 128-aligned sub-dots.

    Returns None when skipping buys less than ~20% of the fold FLOPs
    (small shapes: one big dot pipelines better on the MXU)."""
    KT, NT = kx * TCP // 128, TOP // 128
    if KT * NT <= 1:
        return None
    m = np.zeros((KT, NT), bool)
    for pt in parts:
        lo = (pt.kt - 1) // 2
        for d in range(kx):
            for p in range(T_out):
                for it in range(pt.kt):
                    i = p + pt.t0_off + it - lo
                    if not (0 <= i < pt.T):
                        continue
                    r0 = d * TCP + pt.in_off + i * pt.cin
                    c0 = pt.out_off + p * pt.cout
                    m[
                        r0 // 128 : (r0 + pt.cin - 1) // 128 + 1,
                        c0 // 128 : (c0 + pt.cout - 1) // 128 + 1,
                    ] = True
    if m.sum() >= 0.8 * KT * NT:
        return None
    return tuple(tuple(bool(v) for v in row) for row in m)


def _fold_dot(src_of, w, tilemap, bs, KT_total, TOP):
    """Banded fold matmul: per output column tile, sum 128-aligned sub-dots
    over the contiguous runs of nonzero weight tiles. `src_of(k0, k1)`
    returns src lanes [k0*128, k1*128) (so callers can avoid materializing
    the full (bs, kx*TCP) concat); `w` is this group's (kx*TCP, TOP) folded
    weight ref slice."""
    NT = TOP // 128
    cols = []
    for n in range(NT):
        ks = [k for k in range(KT_total) if tilemap[k][n]]
        if not ks:
            cols.append(jnp.zeros((bs, 128), jnp.float32))
            continue
        # merge contiguous tile indices into maximal runs (bigger K dots)
        runs = []
        r0 = prev = ks[0]
        for k in ks[1:]:
            if k == prev + 1:
                prev = k
            else:
                runs.append((r0, prev + 1))
                r0 = prev = k
        runs.append((r0, prev + 1))
        acc = None
        for k0, k1 in runs:
            part = jax.lax.dot_general(
                src_of(k0, k1),
                w[k0 * 128 : k1 * 128, n * 128 : (n + 1) * 128],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        cols.append(acc)
    return jnp.concatenate(cols, axis=1)


def _kernel(
    # scalar prefetch
    sbse_ref,  # (GP, NB) int32: bits 0..15 span start (16-row tile units),
    # bits 16..30 span length in tiles (ceil), sign bit = DEAD block
    gp_ref,  # (GP, 2) int32 (ky_i, kz_i)
    # blocked inputs
    site_ref,  # (1, 8, BS) int32: rows 0..3 = out x, y, z, valid
    wg_ref,  # (GI, kx*TCP, TOP) this outer step's folded weights
    # ANY inputs (manual DMA)
    keys2_ref,  # (NR16, SPAN) int32: row r = keys[16r : 16r + SPAN]
    feats_ref,  # (Vin + SPAN + 16, TCP)
    # output (revisited across the GO grid dim when GO > 1)
    out_ref,  # (BS, TOP) f32
    # scratch
    kscr,  # (2, 8, SPAN) int32 double-buffered key spans
    fscr,  # (2, SPAN, TCP) double-buffered feature spans
    acc_ref,  # (BS, TOP) f32 accumulator
    sems,  # DMA (2, 2)
    *,
    kx,
    G,
    GI,
    span,
    bs,
    in_dims,
    stride3,
    pad3,
    tilemap=None,
):
    BS = bs
    SPAN = span
    b = pl.program_id(0)
    go = pl.program_id(1)
    GO = -(-G // GI)
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3

    def copies(gi, slot):
        r = sbse_ref[go * GI + gi, b] & 0xFFFF  # span start, 16-row units
        s = pl.multiple_of(r * 16, 16)  # feats offset (tile-aligned)
        r8 = pl.multiple_of((r // 8) * 8, 8)  # 8-row-aligned keys2 block
        ck = pltpu.make_async_copy(
            keys2_ref.at[pl.ds(r8, 8), :], kscr.at[slot], sems.at[slot, 0]
        )
        cf = pltpu.make_async_copy(
            feats_ref.at[pl.ds(s, SPAN), :], fscr.at[slot], sems.at[slot, 1]
        )
        return ck, cf

    live = sbse_ref[go * GI, b] >= 0  # block has >= 1 valid site
    ox = site_ref[0, 0, :]
    oy = site_ref[0, 1, :]
    oz = site_ref[0, 2, :]
    valid = site_ref[0, 3, :] > 0
    xbase = ox * sx - px

    for c in copies(0, 0):
        c.start()
    for gi in range(GI):
        slot = gi % 2
        if gi + 1 < GI:  # prefetch next group into the other buffer
            for c in copies(gi + 1, 1 - slot):
                c.start()
        for c in copies(gi, slot):
            c.wait()

        g = go * GI + gi
        ky_i = gp_ref[g, 0]
        kz_i = gp_ref[g, 1]
        iy = oy * sy - py + ky_i
        iz = oz * sz - pz + kz_i
        row_ok = valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        q = (iz * Y + iy) * X + xbase  # (BS,) int32 window base key
        r = sbse_ref[g, b] & 0xFFFF

        @pl.when(live)
        def _(gi=gi, slot=slot, row_ok=row_ok, q=q, r=r):
            # select the wanted key row from the 8-row aligned block
            subl = jax.lax.broadcasted_iota(jnp.int32, (8, SPAN), 0)
            kspan = jnp.sum(
                jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
                axis=0, keepdims=True,
            )  # (1, SPAN)

            # Direct equality extraction: site keys are UNIQUE ints, so
            # the one-hot for kernel x-position d is simply
            # (kspan == q + d) — no rank reductions (cross-lane sums were
            # the kernel's VPU wall). Invalid rows get an impossible
            # negative query; absent neighbours match nothing and
            # contribute exact zeros. One one-hot matmul per d — the MXU
            # does the gather AND the slot alignment.
            f = fscr[slot]
            parts = []
            for d in range(kx):
                ok_d = row_ok & (xbase + d >= 0) & (xbase + d < X)
                qd = jnp.where(ok_d, q + d, -0x7FFFFFF)  # matches no key
                oh = (kspan == qd[:, None]).astype(wg_ref.dtype)
                parts.append(
                    jax.lax.dot_general(
                        oh, f, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            if tilemap is None:
                src = jnp.concatenate(parts, axis=1).astype(wg_ref.dtype)
                contrib = jax.lax.dot_general(
                    src, wg_ref[gi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (BS, TOP)
            else:
                TCP_ = fscr.shape[-1]
                kpd = TCP_ // 128  # 128-lane tiles per extraction part

                def src_of(k0, k1):
                    segs = []
                    k = k0
                    while k < k1:  # split runs at tap boundaries
                        d, off = divmod(k, kpd)
                        hi = min(k1 - d * kpd, kpd)
                        segs.append(
                            parts[d][:, off * 128 : hi * 128].astype(
                                wg_ref.dtype
                            )
                        )
                        k = d * kpd + hi
                    return (
                        segs[0] if len(segs) == 1
                        else jnp.concatenate(segs, axis=1)
                    )

                contrib = _fold_dot(
                    src_of, wg_ref[gi], tilemap, BS, kx * kpd,
                    wg_ref.shape[-1],
                )
            if gi == 0:
                acc_ref[:] = contrib
            else:
                acc_ref[:] = acc_ref[:] + contrib

    @pl.when(live)
    def _():
        if GO == 1:
            out_ref[:] = acc_ref[:]
        else:

            @pl.when(go == 0)
            def _():
                out_ref[:] = acc_ref[:]

            @pl.when(go > 0)
            def _():
                out_ref[:] = out_ref[:] + acc_ref[:]

    # dead block (no valid sites): define the output once with zeros
    @pl.when(jnp.logical_not(live) & (go == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpanPlan:
    """Per-(output site set, kernel geometry) span metadata — the span
    engine's replacement for window tables. Shared by every conv with the
    same geometry on the same site sets (e.g. both convs of a residual
    block)."""

    sb: jax.Array  # (G, NB) int32 span starts (16-row tile units)
    se: jax.Array  # (G, NB) int32 span ends (16-row tile units, ceil)
    gp: jax.Array  # (G, 2) int32 (ky_i, kz_i)
    n_overflow: jax.Array  # () int32 coverage-gate counter (0 == exact)
    jblk: jax.Array  # (jbcap,) int32 jumbo block indices, -1 padding
    jstart: jax.Array  # (G, jbcap, jwin) int32 jumbo window starts (tiles)
    jexcl: jax.Array  # (G, jbcap, jwin) int32 exclusion lower bounds (rows)
    kernel3: tuple = dataclasses.field(metadata={"static": True})
    stride3: tuple = dataclasses.field(metadata={"static": True})
    pad3: tuple = dataclasses.field(metadata={"static": True})
    in_dims: tuple = dataclasses.field(metadata={"static": True})
    span: int = dataclasses.field(default=SPAN, metadata={"static": True})
    bs: int = dataclasses.field(default=BS, metadata={"static": True})
    jbcap: int = dataclasses.field(default=0, metadata={"static": True})
    jwin: int = dataclasses.field(default=4, metadata={"static": True})

    def conv(self, x: Slab, weight, out: Slab, kernel, chunk=None,
             t0_off: int = 0) -> Slab:
        """window_conv-compatible entry (chunk ignored). Dispatches to the
        packed-window kernel when the kx-tap window fits 128 lanes (the
        small-channel fast path: kx times fewer extraction FLOPs)."""
        kt = kernel[3] if len(kernel) == 4 else 1
        cin = weight.shape[1]
        # span % 128: Mosaic requires the keys-DMA lane slice (8, span) to
        # be 128-lane aligned on hardware (keys2 lives 128-lane tiled in
        # VMEM); production plans use span=256. Interpret mode (CPU tests)
        # has no such constraint.
        if PACKED_ENABLE and (
            self.span % 128 == 0 or _interpret()
        ) and packed_layout(
            self.kernel3, x.T, cin, self.in_dims
        ) is not None:
            feats = span_conv_packed(
                x.keys, x.mask_feats(), weight, out.coords, out.valid,
                self, x.T, kt, out.T, t0_off,
            )
        else:
            feats = span_conv_apply(
                x.keys, x.mask_feats(), out.coords, out.valid, weight,
                self, x.T, kt, out.T, t0_off,
            )
        res = out.replace_feats(feats)
        return res.replace_feats(res.mask_feats())

    def conv_with_occ(self, x: Slab, weight, out: Slab, kernel) -> Slab:
        """Strided conv that ALSO propagates occupancy (OR over gathered
        children) in the same kernel pass: the occupancy rides as a second
        lane-blocked PART (cin=1 ones-weight) appended after the feature
        lanes and landing after the feature outputs — usually inside the
        128-lane padding both ways, so the occ pass is free. Replaces the
        old per-t interleaved channel layout, whose 2T narrow-lane slices
        relayout-copied ~3 ms each (PERF.md; tools/profile_motion_convs)."""
        kt = kernel[3] if len(kernel) == 4 else 1
        assert kt == 1, "occ folding assumes a t-kernel of 1 (down convs)"
        K, cin, cout = weight.shape
        T = x.T
        f = x.mask_feats()
        occf = jnp.where(x.valid[:, None], x.occ, False).astype(f.dtype)
        fa = jnp.concatenate([f, occf], axis=-1)  # (V, T*cin + T)
        TO = T * cout
        parts = (
            ConvPart(cin, cout, T, 1, 0, 0),
            ConvPart(1, 1, T, 1, T * cin, TO),
        )
        w_occ = jnp.ones((K, 1, 1), weight.dtype)
        feats = span_conv_parts(
            x.keys, fa, [weight, w_occ], parts, out.coords, out.valid, self, T
        )  # (V, T*cout + T)
        out_feats = feats[:, :TO]
        occ = (feats[:, TO : TO + T] > 0.5) & out.valid[:, None]
        res = Slab(
            out.keys, out.coords, occ, out_feats, out.valid, out.dims, out.T
        )
        return res.replace_feats(res.mask_feats())

    def conv_cat(self, a: Slab, b: Slab, weight, out: Slab, kernel,
                 t0_off: int = 0) -> Slab:
        """Conv over the channel-concat of two slabs on the same site set
        (ME.cat feeding a conv) WITHOUT materializing the per-t interleaved
        cat: the two feature arrays are lane-block concatenated (one
        aligned-ish copy) and the weight splits by input channel —
        conv(cat(a, b), W) == conv_parts([a, b], [W[:, :Ca], W[:, Ca:]]).
        Replaces cat_slab + conv on the span path (cat_slab's T narrow
        slices measured ~42 ms at L4 — tools/profile_motion_convs)."""
        kt = kernel[3] if len(kernel) == 4 else 1
        ca, cb = a.num_features, b.num_features
        cout = weight.shape[2]
        T = a.T
        fa = jnp.concatenate([a.mask_feats(), b.mask_feats()], axis=-1)
        parts = (
            ConvPart(ca, cout, T, kt, 0, 0, t0_off),
            ConvPart(cb, cout, T, kt, T * ca, 0, t0_off),
        )
        feats = span_conv_parts(
            a.keys, fa, [weight[:, :ca], weight[:, ca:]], parts,
            out.coords, out.valid, self, out.T,
        )
        res = out.replace_feats(feats)
        return res.replace_feats(res.mask_feats())


def _plan_ctx(
    out_coords, out_valid, kernel3, stride3, pad3, in_dims, span, bs,
    jbcap, jwin, Vin,
):
    """Everything make_span_plan computes BEFORE the main bisection.
    Returns (firsts, lasts_plus_kx, ctx) so several plans over the same
    input key array can batch their bisections into ONE merged sort
    (make_span_plans) — the per-plan sort was a measured 8-12 ms of glue
    per conv level (tools/profile_glue.py)."""
    kx = int(kernel3[0])
    if pad3 is None:
        pad3 = tuple((k - 1) // 2 for k in kernel3)
    groups = _groups_yz(kernel3)
    G = len(groups)
    V = out_coords.shape[0]
    NB = -(-V // bs)
    Vp = NB * bs
    if jbcap is None:
        jbcap = 0 if NB < 4 else min(128, max(16, -(-NB // 16)))

    def padV(a, fill):
        return jnp.concatenate(
            [a, jnp.full((Vp - V,) + a.shape[1:], fill, a.dtype)]
        ) if Vp > V else a

    ocoords = padV(out_coords, 0)
    ovalid = padV(out_valid.astype(jnp.int32), 0)

    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3
    ky = jnp.asarray([g[0] for g in groups], jnp.int32)
    kz = jnp.asarray([g[1] for g in groups], jnp.int32)

    def block_q(c3, v, fill):
        # Plan queries use the RAW row index (iz*Y + iy), which is
        # monotone in site order by construction (it equals the site's
        # own (z, y) rank plus a per-group constant), clamped JOINTLY to
        # the grid's row range. Per-coordinate clamping would break
        # monotonicity where an out-of-range z-row ties with the next
        # slice's in-range rows — the sentinel-coverage logic relies on
        # monotone positions. The kernel masks out-of-range rows anyway;
        # clamping only makes anchors conservative.
        row = (
            (c3[:, 2] * sz - pz + kz[:, None]) * Y
            + (c3[:, 1] * sy - py + ky[:, None])
        )
        row = jnp.clip(row, 0, Y * Z - 1)
        q = row * X + (c3[:, 0] * sx - px)[None]
        return jnp.where(v[None] > 0, q, fill)  # (G, ...)

    BIG = jnp.iinfo(jnp.int32).max
    vblk = ovalid.reshape(NB, bs)
    nvalid_blk = vblk.sum(axis=1)  # (NB,)
    base = jnp.arange(NB, dtype=jnp.int32) * bs
    last_i = base + jnp.maximum(nvalid_blk - 1, 0)

    firsts = block_q(ocoords[::bs], ovalid[::bs], BIG)
    lasts = block_q(
        jnp.take(ocoords, last_i, axis=0), (nvalid_blk > 0).astype(jnp.int32), -1
    )
    ctx = dict(
        kernel3=tuple(kernel3), stride3=tuple(stride3), pad3=tuple(pad3),
        in_dims=tuple(in_dims), span=span, bs=bs, jbcap=jbcap, jwin=jwin,
        kx=kx, G=G, NB=NB, Vin=Vin, ocoords=ocoords, ovalid=ovalid,
        nvalid_blk=nvalid_blk, block_q=block_q, ky=ky, kz=kz,
    )
    return firsts, lasts + kx, ctx


def make_span_plans(x_keys, requests) -> list:
    """Batched plan building: every request shares x_keys, so ALL main
    bisection queries ride ONE merged sort instead of one per plan.

    requests: list of dicts with out_coords, out_valid, kernel3 and the
    optional make_span_plan keyword arguments."""
    Vin = x_keys.shape[0]
    preps = []
    for r in requests:
        r = dict(r)
        preps.append(
            _plan_ctx(
                r.pop("out_coords"), r.pop("out_valid"), r.pop("kernel3"),
                r.pop("stride3", (1, 1, 1)), r.pop("pad3", None),
                r.pop("in_dims"), r.pop("span", SPAN), r.pop("bs", BS),
                r.pop("jbcap", None), r.pop("jwin", 4), Vin,
            )
        )
        assert not r, f"unknown plan request keys: {sorted(r)}"
    n_iter = max(1, math.ceil(math.log2(Vin + 1)))
    q = jnp.concatenate(
        [jnp.concatenate([f.reshape(-1), l.reshape(-1)]) for f, l, _ in preps]
    )
    pos = _bisect(x_keys, q, n_iter)
    plans = []
    off = 0
    for f, l, ctx in preps:
        n = f.size
        pos2 = jnp.stack(
            [
                pos[off : off + n].reshape(f.shape),
                pos[off + n : off + 2 * n].reshape(f.shape),
            ]
        )
        off += 2 * n
        plans.append(_plan_finish(x_keys, pos2, ctx))
    return plans


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel3", "stride3", "pad3", "in_dims", "span", "bs", "jbcap",
        "jwin", "exact_stats",
    ),
)
def make_span_plan(
    x_keys,  # (Vin,) int32 sorted input site keys
    out_coords,  # (V, 3)
    out_valid,  # (V,)
    kernel3,
    stride3=(1, 1, 1),
    pad3=None,
    in_dims=None,
    span: int = SPAN,
    bs: int = BS,
    jbcap: int | None = None,
    jwin: int = 4,
    exact_stats: bool = False,
) -> SpanPlan:
    """Compute per-(group, block) span starts by bisection over the sorted
    input keys.

    Main pass: every block's window is HEAD-anchored at its first site's
    key position. Blocks whose key interval exceeds the span (a skipped
    z/y region between the block's rows) become JUMBO blocks: a second
    kernel pass gives each of them `jwin` extra sentinel-anchored windows
    (anchors at evenly spaced sites, so windows track where the block's
    queries actually land). Query positions are monotone within a block
    (site keys sorted; y/z clamped to the grid), so coverage is certified
    by jwin+1 segment conditions per (group, block); `n_overflow` counts
    (a) jump blocks beyond `jbcap` and (b) violated segments — 0 means
    EXACTLY no dropped contributions, and bench.py gates on it.

    Pass exact_stats=True (tools/sweeps) for a per-site uncovered-row
    count (materializes (G, V) positions — tools only).
    """
    firsts, lasts_kx, ctx = _plan_ctx(
        out_coords, out_valid, kernel3, stride3, pad3, in_dims, span, bs,
        jbcap, jwin, x_keys.shape[0],
    )
    n_iter = max(1, math.ceil(math.log2(x_keys.shape[0] + 1)))
    pos2 = _bisect(x_keys, jnp.stack([firsts, lasts_kx]), n_iter)
    return _plan_finish(x_keys, pos2, ctx, exact_stats=exact_stats)


def _plan_finish(x_keys, pos2, ctx, exact_stats: bool = False) -> SpanPlan:
    kernel3, stride3, pad3 = ctx["kernel3"], ctx["stride3"], ctx["pad3"]
    in_dims, span, bs = ctx["in_dims"], ctx["span"], ctx["bs"]
    jbcap, jwin, kx, G, NB = (
        ctx["jbcap"], ctx["jwin"], ctx["kx"], ctx["G"], ctx["NB"]
    )
    Vin = ctx["Vin"]
    ocoords, ovalid = ctx["ocoords"], ctx["ovalid"]
    nvalid_blk, block_q = ctx["nvalid_blk"], ctx["block_q"]
    ky, kz = ctx["ky"], ctx["kz"]
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3
    BIG = jnp.iinfo(jnp.int32).max
    n_iter = max(1, math.ceil(math.log2(Vin + 1)))

    sb = pos2[0] // 16  # head-anchored, tile units
    send = pos2[1]
    se = -(-send // 16)
    live_b = nvalid_blk > 0
    jump = (send - sb * 16 > span) & live_b[None]  # (G, NB)

    gp = jnp.stack([ky, kz], axis=1)  # (G, 2)

    # ---------------- jumbo pass metadata ------------------------------
    # Each jump block gets 2*jwin - 1 extra windows: the block is split at
    # jwin+1 anchor positions (first site, jwin-1 interior sentinels, end);
    # every inter-anchor segment gets a HEAD window at its start anchor
    # (segment 0's head is the main window itself) and a TAIL window ending
    # at its end anchor — so a segment containing one big position jump
    # (the z/y-row-skip case) is covered at both ends. Windows are sorted
    # and chained with exclusion bounds (no double counting), and the
    # remaining union gaps are checked EXACTLY against the block's site
    # queries — n_overflow counts truly-uncovered (site, group) pairs.
    JW = 2 * jwin - 1
    if jbcap > 0:
        jump_b = jump.any(axis=0)  # (NB,)
        n_jumbo = jnp.sum(jump_b)
        iota_nb = jnp.arange(NB, dtype=jnp.int32)
        sorted_blk = _compact_by_sort(
            jnp.where(jump_b, iota_nb, INT32_MAX), iota_nb, jbcap, 0
        )
        jblk = jnp.where(jnp.arange(jbcap) < n_jumbo, sorted_blk, -1)
        bsafe = jnp.maximum(jblk, 0)

        nv_j = jnp.take(nvalid_blk, bsafe)  # (jbcap,)
        sb_j = jnp.take(sb, bsafe, axis=1)  # (G, jbcap)
        send_j = jnp.take(send, bsafe, axis=1)  # (G, jbcap)
        spos = []
        for w in range(1, jwin):
            off = jnp.minimum(
                (w * (bs - 1)) // jwin, jnp.maximum(nv_j - 1, 0)
            )
            idx = bsafe * bs + off
            qw = block_q(
                jnp.take(ocoords, idx, axis=0), (nv_j > 0).astype(jnp.int32),
                BIG,
            )  # (G, jbcap)
            spos.append(qw)
        if spos:
            pos_w = _bisect(x_keys, jnp.stack(spos), n_iter)
            # monotone envelope (clamped q should already be sorted)
            env = [pos_w[0]]
            for w in range(1, jwin - 1):
                env.append(jnp.maximum(env[-1], pos_w[w]))
        else:
            env = []
        # anchors p_0..p_jwin: p_0 = main head row, p_jwin = send
        anchors = [sb_j * 16] + env + [send_j]
        max_tile = Vin // 16
        starts = []
        for s in range(1, jwin):  # head windows of segments 1..jwin-1
            starts.append(anchors[s] // 16)
        for s in range(jwin):  # tail windows of all segments
            endrow = anchors[s + 1] + (kx if s + 1 < jwin else 0)
            starts.append(-(-(endrow - span) // 16))
        jstart = jnp.clip(jnp.stack(starts), sb_j[None], max_tile)
        jstart = jnp.sort(jstart, axis=0)  # (JW, G, jbcap)
        main_end = sb_j * 16 + span  # (G, jbcap)
        jexcl = [main_end]
        for w in range(1, JW):
            jexcl.append(jnp.maximum(jexcl[-1], jstart[w - 1] * 16 + span))
        jexcl = jnp.stack(jexcl)  # (JW, G, jbcap)

        # exact residual-gap check: union of (main + jumbo windows) has
        # JW+1 candidate gaps; count block sites whose key window reaches
        # into any gap (kernel-real queries: unclamped rows + validity)
        site_idx = (
            bsafe[:, None] * bs + jnp.arange(bs, dtype=jnp.int32)[None]
        ).reshape(-1)
        jc3 = jnp.take(ocoords, site_idx, axis=0)
        jv = jnp.take(ovalid, site_idx)
        iyj = jc3[:, 1] * sy - py + ky[:, None]
        izj = jc3[:, 2] * sz - pz + kz[:, None]
        rowok_j = (
            (jv[None] > 0)
            & (iyj >= 0) & (iyj < Y) & (izj >= 0) & (izj < Z)
        )
        qj = (izj * Y + iyj) * X + (jc3[:, 0] * sx - px)[None]
        qj = qj.reshape(G, jbcap, bs)
        rowok_j = rowok_j.reshape(G, jbcap, bs)

        kpad_keys = jnp.concatenate(
            [x_keys, jnp.full((1,), 0x7FFFFFFF, jnp.int32)]
        )

        def key_at(pos):  # keys[pos] with end clamp
            return jnp.take(kpad_keys, jnp.clip(pos, 0, Vin))

        run_end = main_end  # (G, jbcap) union coverage high-water mark
        uncov = jnp.zeros((G, jbcap, bs), bool)
        for w in range(JW + 1):
            gap_lo = run_end
            if w < JW:
                gap_hi = jstart[w] * 16
                run_end = jnp.maximum(run_end, jstart[w] * 16 + span)
            else:
                gap_hi = send_j
            has_gap = gap_hi > gap_lo
            # site reaches into rows [gap_lo, gap_hi) iff its key window
            # [q, q+kx) intersects keys[gap_lo .. gap_hi)
            klo = key_at(gap_lo)
            khi = key_at(gap_hi - 1)
            hit = (
                has_gap[..., None]
                & (qj + (kx - 1) >= klo[..., None])
                & (qj <= khi[..., None])
            )
            uncov = uncov | (hit & rowok_j)
        real = (jblk >= 0)[None, :, None]
        n_viol = jnp.sum(jnp.where(real, uncov, False))

        n_overflow = jnp.maximum(n_jumbo - jbcap, 0) * bs + n_viol
        # (G, jbcap, JW) layouts for kernel scalar prefetch
        jstart = jnp.moveaxis(jstart, 0, -1)
        jexcl = jnp.moveaxis(jexcl, 0, -1)
    else:
        n_overflow = jnp.sum(jnp.where(jump, bs, 0))
        jblk = jnp.zeros((0,), jnp.int32)
        jstart = jnp.zeros((G, 0, JW), jnp.int32)
        jexcl = jnp.zeros((G, 0, JW), jnp.int32)

    if exact_stats:
        n_overflow = _exact_uncovered(
            x_keys, ocoords, ovalid, ky, kz, kx, stride3, pad3, in_dims,
            span, bs, sb, jblk, jstart, n_iter,
        )

    return SpanPlan(
        sb=sb, se=se, gp=gp, n_overflow=n_overflow,
        jblk=jblk, jstart=jstart, jexcl=jexcl,
        kernel3=tuple(kernel3), stride3=tuple(stride3), pad3=tuple(pad3),
        in_dims=tuple(in_dims), span=span, bs=bs, jbcap=jbcap, jwin=jwin,
    )


def _exact_uncovered(
    x_keys, ocoords, ovalid, ky, kz, kx, stride3, pad3, in_dims, span, bs,
    sb, jblk, jstart, n_iter,
):
    """Tools-only exact count of (site, group) WINDOW ROWS not covered by
    the main window plus the block's jumbo windows (0 when the production
    proxy is 0; the proxy is the certifying gate)."""
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3
    Vp = ocoords.shape[0]
    NB = Vp // bs
    jbcap = jblk.shape[0]
    jwin = jstart.shape[-1] if jbcap else 0

    iy = ocoords[:, 1] * sy - py + ky[:, None]
    iz = ocoords[:, 2] * sz - pz + kz[:, None]
    row_ok = (
        (ovalid[None] > 0)
        & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    )
    q_all = (iz * Y + iy) * X + (ocoords[:, 0] * sx - px)[None]
    q_all = jnp.where(row_ok, q_all, -1)
    pos = _bisect(x_keys, jnp.stack([q_all, q_all + kx]), n_iter)
    plo, phi = pos[0], pos[1]  # (G, Vp) row ranges

    # window list per (g, block): main + jwin jumbo (or none)
    blk = jnp.arange(Vp, dtype=jnp.int32) // bs  # (Vp,)
    a_main = jnp.take_along_axis(sb, blk[None], axis=1) * 16  # (G, Vp)
    wins_a = [a_main]
    if jbcap:
        idx = jnp.where(jblk >= 0, jblk, NB)
        inv = jnp.full((NB + 1,), jbcap, jnp.int32).at[idx].set(
            jnp.arange(jbcap, dtype=jnp.int32), mode="drop"
        )[:NB]
        jslot = jnp.take(inv, blk)  # (Vp,) jumbo slot or jbcap
        jstart_pad = jnp.concatenate(
            [jstart, jnp.full((jstart.shape[0], 1, jwin), -(10**9) // 16,
                              jnp.int32)], axis=1,
        )
        for w in range(jwin):
            aw = jnp.take_along_axis(
                jstart_pad[:, :, w], jslot[None], axis=1
            ) * 16
            wins_a.append(aw)

    uncovered = jnp.zeros((), jnp.int32)
    for d in range(kx):
        p = plo + d
        active = (p < phi) & row_ok
        inside = jnp.zeros_like(active)
        for a in wins_a:
            inside = inside | ((p >= a) & (p < a + span))
        uncovered = uncovered + jnp.sum(active & ~inside)
    return uncovered


def _jumbo_kernel(
    # scalar prefetch (minor dim = jbcap: Mosaic lane-pads the minor dim
    # of SMEM operands to 128, so a (GP, jbcap, JW) layout would blow the
    # ~1 MB SMEM budget at JW->128 padding; see PERF.md)
    jblk_ref,  # (jbcap,) int32 jumbo block index or -1
    jst_ref,  # (GP*JW, jbcap) int32 window starts (16-row tile units)
    jex_ref,  # (GP*JW, jbcap) int32 exclusion lower bounds (absolute rows)
    gp_ref,  # (GP, 2) int32 (ky_i, kz_i)
    # blocked inputs
    site_ref,  # (1, 8, BS) int32
    wg_ref,  # (GI, kx*TCP, TOP)
    io_ref,  # (BS, TOP) f32 — the main kernel's output block (aliased)
    # ANY inputs
    keys2_ref,
    feats_ref,
    # output (aliased onto the main output buffer)
    out_ref,  # (BS, TOP) f32
    # scratch
    kscr,  # (2, 8, SPAN) int32
    fscr,  # (2, SPAN, TCP)
    sacc,  # (BS, kx*TCP) f32 per-group src accumulator across windows
    acc_ref,  # (BS, TOP) f32
    sems,  # DMA (2, 2)
    *,
    kx,
    G,
    GI,
    JW,
    span,
    bs,
    in_dims,
    stride3,
    pad3,
    tilemap=None,
):
    """Second-pass coverage for jump blocks: JW sentinel-anchored windows
    per (group, block), equality extraction with an absolute-row exclusion
    bound so rows already covered by the main window (or an earlier jumbo
    window) are never double counted. Accumulates ON TOP of the main
    kernel's output via input/output aliasing (window contributions cross
    pl.when regions through the `sacc` scratch)."""
    SPAN = span
    j = pl.program_id(0)
    go = pl.program_id(1)
    GO = -(-G // GI)
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3
    TCP = fscr.shape[-1]

    seq = [(gi, w) for gi in range(GI) for w in range(JW)]

    def copies(it, slot):
        gi, w = seq[it]
        r = jst_ref[(go * GI + gi) * JW + w, j]
        s = pl.multiple_of(r * 16, 16)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        ck = pltpu.make_async_copy(
            keys2_ref.at[pl.ds(r8, 8), :], kscr.at[slot], sems.at[slot, 0]
        )
        cf = pltpu.make_async_copy(
            feats_ref.at[pl.ds(s, SPAN), :], fscr.at[slot], sems.at[slot, 1]
        )
        return ck, cf

    live = jblk_ref[j] >= 0
    ox = site_ref[0, 0, :]
    oy = site_ref[0, 1, :]
    oz = site_ref[0, 2, :]
    valid = site_ref[0, 3, :] > 0
    xbase = ox * sx - px

    for c in copies(0, 0):
        c.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)
    for gi in range(GI):
        g = go * GI + gi
        ky_i = gp_ref[g, 0]
        kz_i = gp_ref[g, 1]
        iy = oy * sy - py + ky_i
        iz = oz * sz - pz + kz_i
        row_ok = valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        q = (iz * Y + iy) * X + xbase

        for w in range(JW):
            it = gi * JW + w
            slot = it % 2
            if it + 1 < GI * JW:
                for c in copies(it + 1, 1 - slot):
                    c.start()
            for c in copies(it, slot):
                c.wait()
            r = jst_ref[g * JW + w, j]
            excl = jex_ref[g * JW + w, j]

            @pl.when(live)
            def _(w=w, slot=slot, row_ok=row_ok, q=q, r=r, excl=excl):
                subl = jax.lax.broadcasted_iota(jnp.int32, (8, SPAN), 0)
                kspan = jnp.sum(
                    jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
                    axis=0, keepdims=True,
                )  # (1, SPAN)
                # exclusion: lanes whose absolute row sits below the bound
                # were already covered by an earlier window — mask them to
                # a value no valid query can equal
                kspan = jnp.where(r * 16 + lane >= excl, kspan, -2)
                f = fscr[slot]
                for d in range(kx):
                    ok_d = row_ok & (xbase + d >= 0) & (xbase + d < X)
                    qd = jnp.where(ok_d, q + d, -0x7FFFFFF)
                    oh = (kspan == qd[:, None]).astype(wg_ref.dtype)
                    p = jax.lax.dot_general(
                        oh, f, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if w == 0:
                        sacc[:, d * TCP : (d + 1) * TCP] = p
                    else:
                        sacc[:, d * TCP : (d + 1) * TCP] = (
                            sacc[:, d * TCP : (d + 1) * TCP] + p
                        )

        @pl.when(live)
        def _(gi=gi):
            if tilemap is None:
                src = sacc[:].astype(wg_ref.dtype)
                contrib = jax.lax.dot_general(
                    src, wg_ref[gi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                contrib = _fold_dot(
                    lambda k0, k1: sacc[:, k0 * 128 : k1 * 128].astype(
                        wg_ref.dtype
                    ),
                    wg_ref[gi], tilemap, bs, kx * (TCP // 128),
                    wg_ref.shape[-1],
                )
            if gi == 0:
                if GO == 1:
                    acc_ref[:] = io_ref[:] + contrib
                else:

                    @pl.when(go == 0)
                    def _():
                        acc_ref[:] = io_ref[:] + contrib

                    @pl.when(go > 0)
                    def _():
                        acc_ref[:] = out_ref[:] + contrib
            else:
                acc_ref[:] = acc_ref[:] + contrib

    @pl.when(live)
    def _():
        out_ref[:] = acc_ref[:]

    # dummy slot: pass the main output through unchanged
    @pl.when(jnp.logical_not(live) & (go == 0))
    def _():
        out_ref[:] = io_ref[:]


def span_conv_apply(
    x_keys,  # (Vin,) int32 sorted input site keys
    x_feats,  # (Vin, T*cin) input features (zeros at padding/non-occ)
    out_coords,  # (V, 3)
    out_valid,  # (V,)
    weight,  # (K, cin, cout)
    plan: SpanPlan,
    T: int,
    kt: int = 1,
    T_out: int | None = None,
    t0_off: int = 0,
):
    """Single-part wrapper over span_conv_parts. Returns (V, T_out*cout)."""
    if T_out is None:
        T_out = T
    cin, cout = weight.shape[1], weight.shape[2]
    part = ConvPart(cin, cout, T, kt, 0, 0, t0_off)
    return span_conv_parts(
        x_keys, x_feats, [weight], (part,), out_coords, out_valid, plan,
        T_out,
    )


@functools.partial(jax.jit, static_argnames=("parts", "T_out"))
def span_conv_parts(
    x_keys,  # (Vin,) int32 sorted input site keys
    feats_cat,  # (Vin, TC_tot) lane-blocked part features (zeros at padding)
    weights,  # list of (kx*G*kt_i, cin_i, cout_i), aligned with `parts`
    parts: tuple,  # tuple[ConvPart] (static)
    out_coords,  # (V, 3)
    out_valid,  # (V,)
    plan: SpanPlan,
    T_out: int,
):
    """Run the span kernel (+ jumbo coverage pass) with a precomputed
    plan over a multi-part input (see ConvPart). Returns (V, TO_tot) f32."""
    kernel3 = plan.kernel3
    span, bs = plan.span, plan.bs
    stride3, pad3, in_dims = plan.stride3, plan.pad3, plan.in_dims
    kx = int(kernel3[0])
    groups = _groups_yz(kernel3)
    G = len(groups)
    for w, pt in zip(weights, parts):
        assert w.shape[0] == kx * G * pt.kt
    TC = feats_cat.shape[1]
    TO = max(pt.out_off + T_out * pt.cout for pt in parts)
    # lane-pad feature/output widths to the 128-lane DMA tiling; the
    # hardware pads every array to 128 lanes anyway, this makes it explicit
    TCP = -(-TC // 128) * 128
    TOP = -(-TO // 128) * 128
    V = out_coords.shape[0]
    NB = -(-V // bs)
    Vp = NB * bs
    jbcap = plan.jbcap
    JW = plan.jstart.shape[-1]  # 2*jwin - 1 head+tail segment windows
    NBP = NB + jbcap  # jumbo dummy slots park on trailing trash blocks

    import os

    if os.environ.get("INSMOS_SPAN_DEBUG"):
        per_g = kx * TCP * TOP * (2 if weights[0].dtype == jnp.bfloat16 else 4)
        GI_ = max(1, min(G, (4 << 20) // per_g))
        GO_ = -(-G // GI_)
        GP_ = GO_ * GI_
        print(
            f"[span] V={V} Vin={x_keys.shape[0]} bs={bs} NB={NB} span={span}"
            f" kx={kx} G={G} GI={GI_} GP={GP_} jbcap={jbcap} JW={JW}"
            f" sbse={GP_ * NB * 4}B jstart={GP_ * jbcap * JW * 4}B"
            f" TCP={TCP} TOP={TOP} parts={len(parts)}",
            flush=True,
        )
    dtype = (
        weights[0].dtype if weights[0].dtype == jnp.bfloat16 else jnp.float32
    )
    wg = fold_weights_parts(
        weights, parts, kx, G, T_out, dtype, TC, TO
    )  # (G, kx*TC, TO)
    wg = jnp.pad(
        wg.reshape(G, kx, TC, TO), ((0, 0), (0, 0), (0, TCP - TC), (0, TOP - TO))
    ).reshape(G, kx * TCP, TOP)

    def padV(a, fill):
        return jnp.concatenate(
            [a, jnp.full((Vp - V,) + a.shape[1:], fill, a.dtype)]
        ) if Vp > V else a

    ocoords = padV(out_coords, 0)
    ovalid = padV(out_valid.astype(jnp.int32), 0)
    # keys2: 16-strided, span-wide key windows (row r = keys[16r : 16r+span])
    # — a lane-major layout the DMA engine can slice at any 8-row offset
    Vin = x_keys.shape[0]
    nr16 = Vin // 16 + 17
    kpad = jnp.concatenate(
        [x_keys, jnp.full((nr16 * 16 + span - Vin,), KEY_SENTINEL, jnp.int32)]
    )
    keys2 = jnp.concatenate(
        [kpad[j * 16 : j * 16 + nr16 * 16].reshape(nr16, 16) for j in range(span // 16)],
        axis=1,
    )  # (nr16, span)
    feats_pad = jnp.concatenate(
        [
            jnp.pad(feats_cat.astype(dtype), ((0, 0), (0, TCP - TC))),
            jnp.zeros((span + 16, TCP), dtype),
        ]
    )

    site_pack = jnp.stack(
        [
            ocoords[:, 0].reshape(NB, bs),
            ocoords[:, 1].reshape(NB, bs),
            ocoords[:, 2].reshape(NB, bs),
            ovalid.reshape(NB, bs),
        ] + [jnp.zeros((NB, bs), jnp.int32)] * 4,
        axis=1,
    )  # (NB, 8, bs)

    # pack span start; sign bit marks DEAD blocks (no valid output site —
    # slab validity is a sorted prefix), whose matmuls the kernel skips
    # entirely (DMAs still issue unconditionally; PERF.md Mosaic note)
    dead = ovalid.reshape(NB, bs).sum(axis=1) == 0  # (NB,)
    sbse = jnp.where(dead[None, :], plan.sb | (-0x80000000), plan.sb)

    # groups per grid step: as many as keep this step's folded weights
    # within a ~4 MB VMEM budget (the whole group loop then runs inside one
    # step with double-buffered span DMAs — per-step overhead amortized)
    per_g = kx * TCP * TOP * jnp.dtype(dtype).itemsize
    GI = max(1, min(G, (4 << 20) // per_g))
    GO = -(-G // GI)
    GP = GO * GI
    gp = plan.gp
    jstart, jexcl = plan.jstart, plan.jexcl
    if GP > G:  # pad: weights zero (contribute nothing), spans copy row 0
        wg = jnp.concatenate(
            [wg, jnp.zeros((GP - G, kx * TCP, TOP), wg.dtype)]
        )
        sbse = jnp.concatenate(
            [sbse, jnp.broadcast_to(sbse[:1], (GP - G, NB))]
        )
        gp = jnp.concatenate([gp, jnp.zeros((GP - G, 2), jnp.int32)])
        if jbcap:
            jstart = jnp.concatenate(
                [jstart, jnp.broadcast_to(jstart[:1], (GP - G, jbcap, JW))]
            )
            jexcl = jnp.concatenate(
                [jexcl, jnp.broadcast_to(jexcl[:1], (GP - G, jbcap, JW))]
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB, GO),
        in_specs=[
            pl.BlockSpec((1, 8, bs), lambda b, go, *_: (b, 0, 0)),
            pl.BlockSpec((GI, kx * TCP, TOP), lambda b, go, *_: (go, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bs, TOP), lambda b, go, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, span), jnp.int32),
            pltpu.VMEM((2, span, TCP), dtype),
            pltpu.VMEM((bs, TOP), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    tilemap = (
        _fold_tilemap(parts, kx, T_out, TCP, TOP)
        if _tilemap_enabled()
        else None
    )
    kern = functools.partial(
        _kernel, kx=kx, G=G, GI=GI, span=span, bs=bs, in_dims=in_dims,
        stride3=stride3, pad3=pad3, tilemap=tilemap,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NBP * bs, TOP), jnp.float32),
        interpret=_interpret(),
    )(
        sbse, gp,
        site_pack,
        wg, keys2, feats_pad,
    )

    if jbcap:
        def _blk(j, go, jb, *_):
            return (jnp.where(jb[j] >= 0, jb[j], NB + j), 0)

        jgrid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # jblk, jstart, jexcl, gp
            grid=(jbcap, GO),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, bs),
                    lambda j, go, jb, *_: (jnp.clip(jb[j], 0, NB - 1), 0, 0),
                ),
                pl.BlockSpec((GI, kx * TCP, TOP), lambda j, go, *_: (go, 0, 0)),
                pl.BlockSpec((bs, TOP), _blk),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bs, TOP), _blk),
            scratch_shapes=[
                pltpu.VMEM((2, 8, span), jnp.int32),
                pltpu.VMEM((2, span, TCP), dtype),
                pltpu.VMEM((bs, kx * TCP), jnp.float32),
                pltpu.VMEM((bs, TOP), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        jkern = functools.partial(
            _jumbo_kernel, kx=kx, G=G, GI=GI, JW=JW, span=span, bs=bs,
            in_dims=in_dims, stride3=stride3, pad3=pad3, tilemap=tilemap,
        )
        # (GP, jbcap, JW) -> (GP*JW, jbcap): SMEM operands are lane-padded
        # on the minor dim to 128, so JW must not be minor
        jstart2 = jnp.moveaxis(jstart, -1, 1).reshape(GP * JW, jbcap)
        jexcl2 = jnp.moveaxis(jexcl, -1, 1).reshape(GP * JW, jbcap)
        out = pl.pallas_call(
            jkern,
            grid_spec=jgrid,
            out_shape=jax.ShapeDtypeStruct((NBP * bs, TOP), jnp.float32),
            input_output_aliases={6: 0},
            interpret=_interpret(),
        )(
            plan.jblk, jstart2, jexcl2, gp,
            site_pack, wg, out, keys2, feats_pad,
        )
    return out[:V, :TO]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Packed-window span conv — the small-channel fast path.
#
# The wide kernel's per-site cost is G*(kx*span*TCP + kx*TCP*TOP) with TCP =
# ceil(T*cin/128)*128: at T*cin << 128 (the whole UNet stride-1/2 tier at
# C=16/32, the MotionNet stem at T*cin = 10) most of every extraction and
# fold dot multiplies lane PADDING. When kx*(T*cin + ndig + 3) <= 128 the
# packed kernel instead:
#
#   1. packs, per input row s, the kx-tap window [feats[s..s+kx-1] plus
#      base-128 KEY digits and ROW-INDEX digits of each tap row] into one
#      128-lane row (keys/rows ride as digits <= 127, exactly representable
#      in bf16 through the extraction dot),
#   2. per (block, group) computes ONE lower-bound one-hot
#      (kspan >= q) & (kprev < q) — site keys are sorted and unique, so it
#      has exactly one 1 — and extracts the whole window with ONE dot
#      (bs, span) @ (span, 128): kx times fewer extraction FLOPs,
#   3. aligns taps by digit-equality selects (tap d of site q = the
#      extracted row whose key digits equal q+d's; presence gaps fall out
#      exactly, VPU selects on static lane slices),
#   4. applies ONE global folded weight (KK = G*kx*T*cin rows, not
#      G*kx*TCP) per block: G*kx/ceil(KK/128) times fewer fold FLOPs.
#
# Coverage/exclusion stay EXACT under the same SpanPlan: extracted rows
# beyond a window's span are masked by the row-index digits
# (rowv < window_end), and jumbo windows anchor at rows >= their exclusion
# bound (kspan masked below it), so every tap row is contributed by exactly
# the window whose [start, start+span) covers it — the plan's residual-gap
# certification is unchanged.
# ---------------------------------------------------------------------------


def _ndig_for(in_dims) -> int:
    n_cells = int(np.prod(in_dims))
    return max(1, math.ceil(math.log2(n_cells + 2) / 7))


def packed_layout(kernel3, T, cin, in_dims):
    """Returns (TD, ndig, lanes) of the packed layout, or None when the
    kx-tap window does not fit 128 lanes."""
    kx = int(kernel3[0])
    ndig = _ndig_for(in_dims)
    TC = T * cin
    TD = TC + ndig + 3  # feats + key digits + row-index digits
    TD8 = -(-TD // 8) * 8
    if kx * TD8 <= 128:
        TD = TD8  # 8-aligned lane offsets when they fit
    elif kx * TD > 128:
        return None
    return TD, ndig, 128


def _pack_feats(x_keys, feats_tc, kx, TD, TC, ndig, span, dtype):
    """(Vin, TC) + keys -> (Vin + span + 16, 128) packed rows: row s holds
    kx tap blocks [feats[s+j], key-digits[s+j], row-digits[s+j]]."""
    Vin = x_keys.shape[0]
    tail = kx + span + 16
    kpad = jnp.concatenate(
        [x_keys, jnp.full((tail,), KEY_SENTINEL, jnp.int32)]
    )
    rows = jnp.arange(Vin + tail, dtype=jnp.int32)
    cols = [jnp.concatenate([feats_tc.astype(dtype), jnp.zeros((tail, TC), dtype)])]
    for p in range(ndig):
        cols.append(((kpad >> (7 * p)) & 127).astype(dtype)[:, None])
    for p in range(3):
        cols.append(((rows >> (7 * p)) & 127).astype(dtype)[:, None])
    f1 = jnp.concatenate(cols, axis=-1)  # (Vin + tail, TC + ndig + 3)
    if f1.shape[-1] < TD:
        f1 = jnp.pad(f1, ((0, 0), (0, TD - f1.shape[-1])))
    n_out = Vin + span + 16
    fp = jnp.concatenate(
        [f1[j : j + n_out] for j in range(kx)], axis=-1
    )  # (n_out, kx*TD)
    if fp.shape[-1] < 128:
        fp = jnp.pad(fp, ((0, 0), (0, 128 - fp.shape[-1])))
    return fp


def _packed_extract(
    kspan, fslot, q, row_ok, xbase, covend, kx, TD, TC, ndig, X_dim, dtype,
    excl_rows=None,
):
    """Shared main/jumbo packed extraction for one (block, group, window):
    lower-bound one-hot -> one dot -> digit-aligned (bs, kx*TC) taps."""
    bs = q.shape[0]
    span = kspan.shape[-1]
    if excl_rows is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        kspan = jnp.where(lane + excl_rows >= 0, kspan, -2)
        # excl_rows = start*16 - excl (<= 0 lanes masked)
    kprev = jnp.concatenate(
        [jnp.full((1, 1), -(2**30), jnp.int32), kspan[:, : span - 1]],
        axis=1,
    )
    qs = jnp.where(row_ok, q, -0x7FFFFFF)
    oh = ((kspan >= qs[:, None]) & (kprev < qs[:, None])).astype(dtype)
    X = jax.lax.dot_general(
        oh, fslot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, 128)

    out_parts = []
    covf = covend.astype(jnp.float32)
    for d in range(kx):
        ok_d = row_ok & (xbase + d >= 0) & (xbase + d < X_dim)
        qd = q + d
        acc = jnp.zeros((bs, TC), jnp.float32)
        for j in range(kx):
            base = j * TD
            m = ok_d
            for p in range(ndig):
                dig = ((qd >> (7 * p)) & 127).astype(jnp.float32)
                m = m & (X[:, base + TC + p] == dig)
            rowv = (
                X[:, base + TC + ndig]
                + 128.0 * X[:, base + TC + ndig + 1]
                + 16384.0 * X[:, base + TC + ndig + 2]
            )
            m = m & (rowv < covf)
            # Mosaic can't insert a minor dim on i1 vectors ("only supported
            # for 32-bit types") — widen the mask to f32 first and multiply
            mf = m.astype(jnp.float32)
            acc = acc + mf[:, None] * X[:, base : base + TC]
        out_parts.append(acc)
    return jnp.concatenate(out_parts, axis=-1)  # (bs, kx*TC)


def _packed_kernel(
    sbse_ref,  # (G, NB) int32 span starts (sign bit = dead block)
    gp_ref,  # (G, 2)
    site_ref,  # (1, 8, BS)
    wg_ref,  # (KKP, TOP) global folded weight
    keys2_ref,  # ANY
    fp_ref,  # ANY (Vin + span + 16, 128) packed
    out_ref,  # (BS, TOP) f32
    kscr,  # (2, 8, SPAN) int32
    fscr,  # (2, SPAN, 128)
    src_scr,  # (BS, KKP) f32
    sems,
    *,
    kx,
    G,
    TD,
    TC,
    ndig,
    KKP,
    span,
    bs,
    in_dims,
    stride3,
    pad3,
):
    b = pl.program_id(0)
    X_dim, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3

    def copies(gi, slot):
        r = sbse_ref[gi, b] & 0xFFFF
        s = pl.multiple_of(r * 16, 16)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        ck = pltpu.make_async_copy(
            keys2_ref.at[pl.ds(r8, 8), :], kscr.at[slot], sems.at[slot, 0]
        )
        cf = pltpu.make_async_copy(
            fp_ref.at[pl.ds(s, span), :], fscr.at[slot], sems.at[slot, 1]
        )
        return ck, cf

    live = sbse_ref[0, b] >= 0
    ox = site_ref[0, 0, :]
    oy = site_ref[0, 1, :]
    oz = site_ref[0, 2, :]
    valid = site_ref[0, 3, :] > 0
    xbase = ox * sx - px

    # scratch pad lanes beyond KK feed zero weight rows — but inf/nan
    # garbage times zero is nan, so they must be zeroed explicitly
    KK = G * kx * TC
    if KKP > KK:
        src_scr[:, KK:KKP] = jnp.zeros((bs, KKP - KK), jnp.float32)

    for c in copies(0, 0):
        c.start()
    for gi in range(G):
        slot = gi % 2
        if gi + 1 < G:
            for c in copies(gi + 1, 1 - slot):
                c.start()
        for c in copies(gi, slot):
            c.wait()
        ky_i = gp_ref[gi, 0]
        kz_i = gp_ref[gi, 1]
        iy = oy * sy - py + ky_i
        iz = oz * sz - pz + kz_i
        row_ok = valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        q = (iz * Y + iy) * X_dim + xbase
        r = sbse_ref[gi, b] & 0xFFFF

        @pl.when(live)
        def _(gi=gi, slot=slot, row_ok=row_ok, q=q, r=r):
            subl = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)
            kspan = jnp.sum(
                jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
                axis=0, keepdims=True,
            )
            covend = r * 16 + span
            src = _packed_extract(
                kspan, fscr[slot], q, row_ok, xbase, covend, kx, TD, TC,
                ndig, X_dim, wg_ref.dtype,
            )
            src_scr[:, gi * kx * TC : (gi + 1) * kx * TC] = src

    @pl.when(live)
    def _():
        out_ref[:] = jax.lax.dot_general(
            src_scr[:].astype(wg_ref.dtype), wg_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _packed_jumbo_kernel(
    jblk_ref,  # (jbcap,)
    jst_ref,  # (G*JW, jbcap)
    jex_ref,  # (G*JW, jbcap)
    gp_ref,  # (G, 2)
    site_ref,
    wg_ref,  # (KKP, TOP)
    io_ref,  # (BS, TOP) main output (aliased)
    keys2_ref,
    fp_ref,
    out_ref,
    kscr,
    fscr,
    src_scr,  # (BS, KKP) f32 — per-window contributions accumulate here
    sems,
    *,
    kx,
    G,
    JW,
    TD,
    TC,
    ndig,
    KKP,
    span,
    bs,
    in_dims,
    stride3,
    pad3,
):
    j = pl.program_id(0)
    X_dim, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3

    seq = [(gi, w) for gi in range(G) for w in range(JW)]

    def copies(it, slot):
        gi, w = seq[it]
        r = jst_ref[gi * JW + w, j]
        s = pl.multiple_of(r * 16, 16)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        ck = pltpu.make_async_copy(
            keys2_ref.at[pl.ds(r8, 8), :], kscr.at[slot], sems.at[slot, 0]
        )
        cf = pltpu.make_async_copy(
            fp_ref.at[pl.ds(s, span), :], fscr.at[slot], sems.at[slot, 1]
        )
        return ck, cf

    live = jblk_ref[j] >= 0
    ox = site_ref[0, 0, :]
    oy = site_ref[0, 1, :]
    oz = site_ref[0, 2, :]
    valid = site_ref[0, 3, :] > 0
    xbase = ox * sx - px

    KK = G * kx * TC
    if KKP > KK:
        src_scr[:, KK:KKP] = jnp.zeros((bs, KKP - KK), jnp.float32)

    for c in copies(0, 0):
        c.start()
    for gi in range(G):
        ky_i = gp_ref[gi, 0]
        kz_i = gp_ref[gi, 1]
        iy = oy * sy - py + ky_i
        iz = oz * sz - pz + kz_i
        row_ok = valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        q = (iz * Y + iy) * X_dim + xbase

        for w in range(JW):
            it = gi * JW + w
            slot = it % 2
            if it + 1 < G * JW:
                for c in copies(it + 1, 1 - slot):
                    c.start()
            for c in copies(it, slot):
                c.wait()
            r = jst_ref[gi * JW + w, j]
            excl = jex_ref[gi * JW + w, j]

            @pl.when(live)
            def _(gi=gi, w=w, slot=slot, row_ok=row_ok, q=q, r=r, excl=excl):
                subl = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)
                kspan = jnp.sum(
                    jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
                    axis=0, keepdims=True,
                )
                covend = r * 16 + span
                src = _packed_extract(
                    kspan, fscr[slot], q, row_ok, xbase, covend, kx, TD, TC,
                    ndig, X_dim, wg_ref.dtype,
                    excl_rows=r * 16 - excl,
                )
                lo = gi * kx * TC
                hi = (gi + 1) * kx * TC
                if w == 0:
                    src_scr[:, lo:hi] = src
                else:
                    src_scr[:, lo:hi] = src_scr[:, lo:hi] + src

    @pl.when(live)
    def _():
        out_ref[:] = io_ref[:] + jax.lax.dot_general(
            src_scr[:].astype(wg_ref.dtype), wg_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[:] = io_ref[:]


@functools.partial(
    jax.jit, static_argnames=("T", "kt", "T_out", "t0_off")
)
def span_conv_packed(
    x_keys,  # (Vin,) int32 sorted
    x_feats,  # (Vin, T*cin), zeros at padding/non-occ
    weight,  # (kx*G*kt, cin, cout)
    out_coords,  # (V, 3)
    out_valid,  # (V,)
    plan: SpanPlan,
    T: int,
    kt: int = 1,
    T_out: int | None = None,
    t0_off: int = 0,
):
    """Packed-window span conv (see module section above). Exact under the
    same plan/overflow semantics as span_conv_parts; eligibility via
    packed_layout. Returns (V, T_out*cout) f32."""
    if T_out is None:
        T_out = T
    kernel3 = plan.kernel3
    span, bs = plan.span, plan.bs
    stride3, pad3, in_dims = plan.stride3, plan.pad3, plan.in_dims
    kx = int(kernel3[0])
    G = len(_groups_yz(kernel3))
    cin, cout = weight.shape[1], weight.shape[2]
    TC = T * cin
    lay = packed_layout(kernel3, T, cin, in_dims)
    assert lay is not None, "packed span conv: window does not fit 128 lanes"
    TD, ndig, _ = lay
    TO = T_out * cout
    TOP = -(-TO // 128) * 128
    KK = G * kx * TC
    KKP = -(-KK // 128) * 128
    V = out_coords.shape[0]
    NB = -(-V // bs)
    Vp = NB * bs
    jbcap = plan.jbcap
    JW = plan.jstart.shape[-1]
    NBP = NB + jbcap

    dtype = weight.dtype if weight.dtype == jnp.bfloat16 else jnp.float32

    # folded weight rows are (g, d, t, c)-ordered — exactly the packed
    # src lane order (group-major, tap-major, t-major)
    wg = fold_weights(
        weight, kx, G, kt, T, dtype, T_out=T_out, t0_off=t0_off
    )  # (G, kx*TC, TO)
    wg = wg.reshape(KK, TO)
    wg = jnp.pad(wg, ((0, KKP - KK), (0, TOP - TO)))

    def padV(a, fill):
        return jnp.concatenate(
            [a, jnp.full((Vp - V,) + a.shape[1:], fill, a.dtype)]
        ) if Vp > V else a

    ocoords = padV(out_coords, 0)
    ovalid = padV(out_valid.astype(jnp.int32), 0)
    Vin = x_keys.shape[0]
    nr16 = Vin // 16 + 17
    kpad = jnp.concatenate(
        [x_keys, jnp.full((nr16 * 16 + span - Vin,), KEY_SENTINEL, jnp.int32)]
    )
    keys2 = jnp.concatenate(
        [kpad[j * 16 : j * 16 + nr16 * 16].reshape(nr16, 16) for j in range(span // 16)],
        axis=1,
    )
    fp = _pack_feats(x_keys, x_feats, kx, TD, TC, ndig, span, dtype)

    site_pack = jnp.stack(
        [
            ocoords[:, 0].reshape(NB, bs),
            ocoords[:, 1].reshape(NB, bs),
            ocoords[:, 2].reshape(NB, bs),
            ovalid.reshape(NB, bs),
        ] + [jnp.zeros((NB, bs), jnp.int32)] * 4,
        axis=1,
    )  # (NB, 8, bs)
    dead = ovalid.reshape(NB, bs).sum(axis=1) == 0
    sbse = jnp.where(dead[None, :], plan.sb | (-0x80000000), plan.sb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 8, bs), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((KKP, TOP), lambda b, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bs, TOP), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, span), jnp.int32),
            pltpu.VMEM((2, span, 128), dtype),
            pltpu.VMEM((bs, KKP), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kern = functools.partial(
        _packed_kernel, kx=kx, G=G, TD=TD, TC=TC, ndig=ndig, KKP=KKP,
        span=span, bs=bs, in_dims=in_dims, stride3=stride3, pad3=pad3,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NBP * bs, TOP), jnp.float32),
        interpret=_interpret(),
    )(sbse, plan.gp, site_pack, wg, keys2, fp)

    if jbcap:
        jgrid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(jbcap,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, bs),
                    lambda j, jb, *_: (jnp.clip(jb[j], 0, NB - 1), 0, 0),
                ),
                pl.BlockSpec((KKP, TOP), lambda j, *_: (0, 0)),
                pl.BlockSpec(
                    (bs, TOP),
                    lambda j, jb, *_: (jnp.where(jb[j] >= 0, jb[j], NB + j), 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (bs, TOP),
                lambda j, jb, *_: (jnp.where(jb[j] >= 0, jb[j], NB + j), 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 8, span), jnp.int32),
                pltpu.VMEM((2, span, 128), dtype),
                pltpu.VMEM((bs, KKP), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        jkern = functools.partial(
            _packed_jumbo_kernel, kx=kx, G=G, JW=JW, TD=TD, TC=TC,
            ndig=ndig, KKP=KKP, span=span, bs=bs, in_dims=in_dims,
            stride3=stride3, pad3=pad3,
        )
        jstart2 = jnp.moveaxis(plan.jstart, -1, 1).reshape(
            plan.jstart.shape[0] * JW, jbcap
        )
        jexcl2 = jnp.moveaxis(plan.jexcl, -1, 1).reshape(
            plan.jexcl.shape[0] * JW, jbcap
        )
        out = pl.pallas_call(
            jkern,
            grid_spec=jgrid,
            out_shape=jax.ShapeDtypeStruct((NBP * bs, TOP), jnp.float32),
            input_output_aliases={6: 0},
            interpret=_interpret(),
        )(
            plan.jblk, jstart2, jexcl2, plan.gp,
            site_pack, wg, out, keys2, fp,
        )
    return out[:V, :TO]


def span_conv_slab(
    x: Slab,
    weight,
    out: Slab,
    kernel,  # (kx, ky, kz[, kt])
    stride3=(1, 1, 1),
    pad3=None,
) -> tuple[Slab, jax.Array]:
    """One-shot wrapper (plan + conv); returns (result slab, span-overflow
    row count)."""
    plan = make_span_plan(
        x.keys, out.coords, out.valid, tuple(kernel[:3]),
        stride3=tuple(stride3),
        pad3=None if pad3 is None else tuple(pad3),
        in_dims=tuple(x.dims),
    )
    return plan.conv(x, weight, out, kernel), plan.n_overflow


