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

    # statically unrolled: n_iter is ~17-19 and the body is a few tiny ops,
    # so a lax.fori_loop spends more in per-while overhead (~37 us each,
    # ~700 of these per step) than in the search itself
    for _ in range(n_iter):
        mid = (lo + hi) // 2
        v = jnp.take(keys, mid)
        less = v < queries
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
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


def _residue_ok(parts, kx, TC, TCP) -> bool:
    """Residue-packed extraction eligibility: the kx tap-lane blocks all
    fit in ONE 128-lane tile (kx * TC_tot <= 128). Then the per-tap
    one-hot extraction dots collapse into ONE multi-hot range dot against
    residue-packed features (`_residue_feats`): each residue class
    (key mod kx) has at most one key in a kx-window of consecutive
    integers, so lane block c of the product holds exactly tap
    d = (c - q mod kx) mod kx — recovered by per-site selection among kx
    rotated fold weights (`_residue_weights`). Extraction FLOPs drop kx x
    on the stem (kx=5, T*cin=10): the kernel's dominant dot at cin=1.

    The extraction is purely SPATIAL: kt, t0_off and the multi-part
    layout only shape the folded (G, kx, TC, TO) weight, which the
    rotated fold matrices consume as-is — so any conv whose packed lane
    width fits qualifies (round-5: covers block8's second conv at L1
    (kt=3, TC=16) and the occ-folded down convs (multi-part, TC=cin*T+T),
    not just the kt=1 single-part stem/UNet convs)."""
    return kx * TC <= 128 and TCP == 128


def _residue_feats(feats_cat, x_keys, kx, TC, dtype):
    """(Vin, TC) -> (Vin, 128): lane block (key mod kx)*TC..+TC holds the
    row's features; other lanes zero. Padding rows are all-zero already."""
    Vin = feats_cat.shape[0]
    c = jnp.remainder(x_keys, kx)  # grid keys are >= 0; sentinel harmless
    out = jnp.zeros((Vin, 128), dtype)
    f = feats_cat.astype(dtype)
    for cv in range(kx):
        out = out.at[:, cv * TC : cv * TC + TC].set(
            jnp.where((c == cv)[:, None], f, 0)
        )
    return out


def _residue_weights(wg_unpadded, kx, TC, TOP, dtype):
    """(G, kx, TC, TO) folded tap weights -> (G, kx*128, TOP) rotated fold
    matrices: rows [c0*128 + c*TC + j] = tap ((c - c0) mod kx) weight row
    j, so P @ W[c0] is the conv output for sites with q mod kx == c0."""
    G, kx_, TC_, TO = wg_unpadded.shape
    assert (kx_, TC_) == (kx, TC)
    w = jnp.zeros((G, kx, 128, TOP), dtype)
    for c0 in range(kx):
        for c in range(kx):
            w = w.at[:, c0, c * TC : (c + 1) * TC, :TO].set(
                wg_unpadded[:, (c - c0) % kx].astype(dtype)
            )
    return w.reshape(G, kx * 128, TOP)


def _residue_contrib(kspan, q, xbase, row_ok, f, w_rows, kx, X, dtype):
    """Shared residue-extraction compute for both kernels: multi-hot range
    dot + kx rotated folds + per-site rotation select. `w_rows` is this
    group's (kx*128, TOP) rotated weight; `kspan` (1, SPAN) keys (already
    exclusion-masked by the caller where needed)."""
    dlo = jnp.maximum(0, -xbase)
    dhi = jnp.minimum(kx - 1, X - 1 - xbase)
    qlo = jnp.where(row_ok & (dlo <= dhi), q + dlo, 1)
    qhi = jnp.where(row_ok & (dlo <= dhi), q + dhi, 0)
    M = (
        (kspan >= qlo[:, None]) & (kspan <= qhi[:, None])
    ).astype(dtype)
    P = jax.lax.dot_general(
        M, f, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)  # (BS, 128)
    # minor-dim expansion must happen on the 32-bit int, not the i1
    # compare result (Mosaic: "Insertion of minor dim ... only supported
    # for 32-bit types")
    c0_col = jnp.remainder(jnp.remainder(q, kx) + kx, kx)[:, None]
    contrib = None
    for cv in range(kx):
        A = jax.lax.dot_general(
            P, w_rows[cv * 128 : (cv + 1) * 128, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel = jnp.where(c0_col == cv, A, 0.0)
        contrib = sel if contrib is None else contrib + sel
    return contrib


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
    residue=False,
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
        emp_g = (sbse_ref[g, b] >> 16) & 1  # plan-certified zero pair

        if gi == 0:  # initialize the accumulator once per go step

            @pl.when(live)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(live & (emp_g == 0))
        def _(gi=gi, slot=slot, row_ok=row_ok, q=q, r=r):
            # select the wanted key row from the 8-row aligned block
            subl = jax.lax.broadcasted_iota(jnp.int32, (8, SPAN), 0)
            kspan = jnp.sum(
                jnp.where(subl == (r - (r // 8) * 8), kscr[slot], 0),
                axis=0, keepdims=True,
            )  # (1, SPAN)

            f = fscr[slot]
            if residue:
                contrib = _residue_contrib(
                    kspan, q, xbase, row_ok, f, wg_ref[gi], kx, X,
                    wg_ref.dtype,
                )
                acc_ref[:] = acc_ref[:] + contrib
                return

            # Direct equality extraction: site keys are UNIQUE ints, so
            # the one-hot for kernel x-position d is simply
            # (kspan == q + d) — no rank reductions (cross-lane sums were
            # the kernel's VPU wall). Invalid rows get an impossible
            # negative query; absent neighbours match nothing and
            # contribute exact zeros. One one-hot matmul per d — the MXU
            # does the gather AND the slot alignment.
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
    emp: jax.Array  # (G, NB) int32: 1 = provably EMPTY pair (no input key
    # in [min_q, max_q + kx) — zero contribution; kernels skip its compute)
    gp: jax.Array  # (G, 2) int32 (ky_i, kz_i)
    n_overflow: jax.Array  # () int32 coverage-gate counter (0 == exact)
    gs: jax.Array  # (4, JS) int32 greedy coverage slots, rows = (group,
    # block [-1 = dead slot], span-start tile, exclusion row); sorted by
    # (block, group) so output-block revisits in the slot kernel are
    # consecutive, dead slots last
    kernel3: tuple = dataclasses.field(metadata={"static": True})
    stride3: tuple = dataclasses.field(metadata={"static": True})
    pad3: tuple = dataclasses.field(metadata={"static": True})
    in_dims: tuple = dataclasses.field(metadata={"static": True})
    span: int = dataclasses.field(default=SPAN, metadata={"static": True})
    bs: int = dataclasses.field(default=BS, metadata={"static": True})
    js: int = dataclasses.field(default=0, metadata={"static": True})
    gwin: int = dataclasses.field(default=12, metadata={"static": True})
    jp: int = dataclasses.field(default=0, metadata={"static": True})

    def conv(self, x: Slab, weight, out: Slab, kernel, chunk=None,
             t0_off: int = 0) -> Slab:
        """window_conv-compatible entry (chunk ignored).

        (A packed-window small-channel kernel variant was built and
        measured 2.5x SLOWER end-to-end — per-row packing scatter +
        narrow-lane DMA cost more than the saved extraction dots; see
        PERF.md round-3 findings. Removed; the wide per-tap kernel is the
        one production path.)"""
        kt = kernel[3] if len(kernel) == 4 else 1
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
    slots, gwin, pairs, Vin,
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
    if slots is None:
        slots = 0 if NB < 4 else min(4096, max(128, NB))
    if pairs is None:
        pairs = slots

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
        """Kernel-real queries with OUT-OF-GRID rows -> fill (excluded
        from anchoring; the kernel masks them too)."""
        iy = c3[:, 1] * sy - py + ky[:, None]
        iz = c3[:, 2] * sz - pz + kz[:, None]
        row_ok = (v[None] > 0) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        q = (iz * Y + iy) * X + (c3[:, 0] * sx - px)[None]
        return jnp.where(row_ok, q, fill)  # (G, ...)

    BIG = jnp.iinfo(jnp.int32).max
    vblk = ovalid.reshape(NB, bs)
    nvalid_blk = vblk.sum(axis=1)  # (NB,)

    # Anchor each (group, block) span at the block's TRUE min query and
    # end it at the TRUE max query — an exact per-block interval. (The
    # earlier head/last-site anchoring assumed queries are monotone in
    # site order; that FAILS in blocks straddling a y/z grid boundary,
    # where a later site's valid window can precede the head site's —
    # found by the round-5 residue probe as a silent 3-row coverage hole
    # with n_overflow == 0: the certificate only checked the END side.)
    q_all = block_q(ocoords, ovalid, BIG)  # (G, Vp)
    qb = q_all.reshape(G, NB, bs)
    firsts = jnp.min(qb, axis=2)  # (G, NB); all-invalid -> BIG
    lasts = jnp.max(jnp.where(qb == BIG, -1, qb), axis=2)  # -> -1
    ctx = dict(
        kernel3=tuple(kernel3), stride3=tuple(stride3), pad3=tuple(pad3),
        in_dims=tuple(in_dims), span=span, bs=bs, js=slots, gwin=gwin,
        jp=pairs,
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
                r.pop("slots", None), r.pop("gwin", 12),
                r.pop("pairs", None), Vin,
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
        "kernel3", "stride3", "pad3", "in_dims", "span", "bs", "slots",
        "gwin", "pairs", "exact_stats",
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
    slots: int | None = None,
    gwin: int = 12,
    pairs: int | None = None,
    exact_stats: bool = False,
) -> SpanPlan:
    """Compute per-(group, block) span starts by bisection over the sorted
    input keys.

    Main pass: every block's window is HEAD-anchored at its first site's
    key position. (group, block) pairs whose key interval exceeds the
    span get GREEDY coverage windows: starting from the main window's end,
    each extra window is anchored at the first still-uncovered query (one
    bisection per pair per round), so windows land exactly on the query
    clusters — on LiDAR ring data most jump pairs need only 2-3 windows
    (tools/probe_spans on the HDL-64E fixture), where evenly-spaced
    sentinel anchoring wasted its budget. Each extra window becomes one
    flat SLOT processed by the slot kernel (grid step = one window).

    Budgets (all static): `pairs` = max jump pairs given greedy coverage,
    `gwin` = max extra windows per pair, `slots` = total slot capacity.
    `n_overflow` counts exactly: still-uncovered (site, group) window rows
    after the greedy rounds, plus bs-conservative counts for pairs/slots
    beyond the budgets — 0 certifies EXACTLY no dropped contributions
    (greedy windows are anchored at the minimum uncovered query, so rows
    between coverage runs match no query; see _plan_finish), and bench.py
    gates on it.

    Pass exact_stats=True (tools/sweeps) for a per-site uncovered-row
    count (materializes (G, V) positions — tools only).
    """
    firsts, lasts_kx, ctx = _plan_ctx(
        out_coords, out_valid, kernel3, stride3, pad3, in_dims, span, bs,
        slots, gwin, pairs, x_keys.shape[0],
    )
    n_iter = max(1, math.ceil(math.log2(x_keys.shape[0] + 1)))
    pos2 = _bisect(x_keys, jnp.stack([firsts, lasts_kx]), n_iter)
    return _plan_finish(x_keys, pos2, ctx, exact_stats=exact_stats)


def _plan_finish(x_keys, pos2, ctx, exact_stats: bool = False) -> SpanPlan:
    kernel3, stride3, pad3 = ctx["kernel3"], ctx["stride3"], ctx["pad3"]
    in_dims, span, bs = ctx["in_dims"], ctx["span"], ctx["bs"]
    js, gwin, jp, kx, G, NB = (
        ctx["js"], ctx["gwin"], ctx["jp"], ctx["kx"], ctx["G"], ctx["NB"]
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
    # empty pair: no input key in [min_q, max_q + kx) — the extraction
    # one-hots match nothing, so the kernels skip the pair's dots entirely
    # (free at plan time: both interval ends are already bisected).
    emp = (pos2[1] <= pos2[0]).astype(jnp.int32)
    live_b = nvalid_blk > 0
    jump = (send - sb * 16 > span) & live_b[None]  # (G, NB)

    gp = jnp.stack([ky, kz], axis=1)  # (G, 2)

    # ---------------- greedy coverage slots ----------------------------
    # Every jump (group, block) pair gets windows placed GREEDILY: window
    # w+1 is anchored at the minimum still-uncovered query (its bisected
    # position, floored to a 16-row tile). A query q is covered by the
    # union [.., E) iff q + kx <= keys[E] (pos(v) <= E <=> v <= keys[E]).
    # Exactness of the union check: rows strictly between two coverage
    # runs match no query — any matching query q would be below the next
    # anchor (the minimum uncovered), hence covered, hence all its rows
    # lie below the previous end; contradiction. So the single final
    # check per row (q + kx <= keys[E_final]) certifies full coverage.
    BIGQ = 0x7FFFFF00  # sentinel above any grid key, safe against +kx
    if js > 0:
        GNB = G * NB
        iota_p = jnp.arange(GNB, dtype=jnp.int32)
        jf = jump.reshape(-1)
        n_pairs = jnp.sum(jf)
        sel = _compact_by_sort(
            jnp.where(jf, iota_p, INT32_MAX), iota_p, jp, 0
        )
        sel_ok = jnp.arange(jp) < n_pairs
        pg = sel // NB
        pb = sel % NB
        # per-pair block site queries. Valid in-grid rows only: for them
        # the clamped monotone plan query equals the kernel-real query.
        site_idx = (
            pb[:, None] * bs + jnp.arange(bs, dtype=jnp.int32)[None]
        ).reshape(-1)
        c3 = jnp.take(ocoords, site_idx, axis=0).reshape(jp, bs, 3)
        v = jnp.take(ovalid, site_idx).reshape(jp, bs)
        kyp = jnp.take(ky, pg)
        kzp = jnp.take(kz, pg)
        iy = c3[..., 1] * sy - py + kyp[:, None]
        iz = c3[..., 2] * sz - pz + kzp[:, None]
        rowok = (
            (v > 0) & sel_ok[:, None]
            & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        )
        qa = jnp.where(
            rowok, (iz * Y + iy) * X + (c3[..., 0] * sx - px), BIGQ
        )  # (jp, bs)

        kpad_keys = jnp.concatenate(
            [x_keys, jnp.full((1,), 0x7FFFFFFF, jnp.int32)]
        )

        def key_at(pos):  # keys[pos] with end clamp
            return jnp.take(kpad_keys, jnp.clip(pos, 0, Vin))

        sb_p = jnp.take(sb.reshape(-1), sel)
        E = sb_p * 16 + span  # (jp,) coverage-end position (absolute rows)
        sl_g, sl_b, sl_r, sl_e = [], [], [], []

        def greedy_round(qa_t, pg_t, pb_t, E_t):
            Kcov = key_at(E_t)
            unc = (qa_t + kx > Kcov[:, None]) & (qa_t < BIGQ)
            A = jnp.min(jnp.where(unc, qa_t, BIGQ), axis=1)
            need = A < BIGQ
            posA = _bisect(x_keys, jnp.where(need, A, 0), n_iter)
            r_w = posA // 16
            sl_g.append(jnp.where(need, pg_t, 0))
            sl_b.append(jnp.where(need, pb_t, -1))
            sl_r.append(jnp.where(need, r_w, 0))
            sl_e.append(jnp.where(need, E_t, 0))
            return jnp.where(need, jnp.maximum(E_t, r_w * 16 + span), E_t)

        # two-tier rounds: a few rounds over ALL pairs cover the typical
        # 2-3-cluster case; the long tail (far-field pairs needing tens of
        # windows) is COMPACTED to a small set before the remaining
        # rounds, so per-round bisection cost tracks the actual work
        # (tools/probe_spans cluster histogram on the HDL-64E fixture)
        tier1 = min(gwin, 4)
        for _w in range(tier1):
            E = greedy_round(qa, pg, pb, E)
        if gwin > tier1:
            Kcov = key_at(E)
            undone = jnp.any(
                (qa + kx > Kcov[:, None]) & (qa < BIGQ), axis=1
            )
            # tier-2 pair budget: pairs beyond it keep tier-1 coverage and
            # surface as n_viol. The S=4 multi-stream bench measured 50-71
            # uncovered rows at jp//8 (gwin raises changed NOTHING —
            # the overflow was this cap, not rounds); tier-2 round cost
            # scales with jp2, so keep it proportional but floored higher.
            jp2 = max(256, jp // 4)
            iota2 = jnp.arange(jp, dtype=jnp.int32)
            sel2 = _compact_by_sort(
                jnp.where(undone, iota2, INT32_MAX), iota2, jp2, 0
            )
            ok2 = jnp.arange(jp2) < jnp.sum(undone)
            qa2 = jnp.where(
                ok2[:, None], jnp.take(qa, sel2, axis=0), BIGQ
            )
            pg2 = jnp.take(pg, sel2)
            pb2 = jnp.where(ok2, jnp.take(pb, sel2), -1)
            E2 = jnp.take(E, sel2)
            for _w in range(gwin - tier1):
                E2 = greedy_round(qa2, pg2, pb2, E2)
            # write tier-2 coverage back so the final residual check (and
            # pairs dropped beyond jp2, which keep their tier-1 E) stays
            # exact over the FULL selected set
            E = E.at[jnp.where(ok2, sel2, jp - 1)].max(
                jnp.where(ok2, E2, 0), mode="drop"
            )
        # exact residual: rows still uncovered after the greedy budget
        Kcov = key_at(E)
        n_viol = jnp.sum((qa + kx > Kcov[:, None]) & (qa < BIGQ))

        # flatten -> sort by (block, group) -> cap at js slots
        fb = jnp.concatenate(sl_b)
        fg = jnp.concatenate(sl_g)
        fr = jnp.concatenate(sl_r)
        fe = jnp.concatenate(sl_e)
        liveslot = fb >= 0
        n_slots = jnp.sum(liveslot)
        order = jnp.where(liveslot, fb * G + fg, INT32_MAX)
        _, sfb, sfg, sfr, sfe = jax.lax.sort(
            (order, fb, fg, fr, fe), num_keys=1
        )

        def cap(a, fill):
            if a.shape[0] >= js:
                return a[:js]
            return jnp.concatenate(
                [a, jnp.full((js - a.shape[0],), fill, a.dtype)]
            )

        gs = jnp.stack([cap(sfg, 0), cap(sfb, -1), cap(sfr, 0), cap(sfe, 0)])
        n_overflow = (
            n_viol
            + jnp.maximum(n_pairs - jp, 0) * bs
            + jnp.maximum(n_slots - js, 0) * bs
        )
    else:
        n_overflow = jnp.sum(jnp.where(jump, bs, 0))
        gs = jnp.zeros((4, 0), jnp.int32)

    if exact_stats:
        n_overflow = _exact_uncovered(
            x_keys, ocoords, ovalid, ky, kz, kx, stride3, pad3, in_dims,
            span, bs, sb, gs, n_iter,
        )

    return SpanPlan(
        sb=sb, se=se, emp=emp, gp=gp, n_overflow=n_overflow, gs=gs,
        kernel3=tuple(kernel3), stride3=tuple(stride3), pad3=tuple(pad3),
        in_dims=tuple(in_dims), span=span, bs=bs, js=js, gwin=gwin, jp=jp,
    )


def _exact_uncovered(
    x_keys, ocoords, ovalid, ky, kz, kx, stride3, pad3, in_dims, span, bs,
    sb, gs, n_iter,
):
    """Tools-only exact count of (site, group) WINDOW ROWS not covered by
    the main window plus the plan's greedy slots (0 when the production
    counter is 0; the production counter is the certifying gate).

    Uses the same union-coverage identity as the plan: scatter-max the
    slot window ends into a (G, NB) coverage-end grid, then a row is
    covered iff q + kx <= keys[E(g, block)] (rows between coverage runs
    match no query — see _plan_finish)."""
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3
    Vp = ocoords.shape[0]
    NB = Vp // bs
    G = sb.shape[0]
    Vin = x_keys.shape[0]

    E = sb * 16 + span  # (G, NB) main-window coverage ends
    if gs.shape[1]:
        g, b, r, _ = gs
        ok = b >= 0
        flat = jnp.where(ok, jnp.maximum(b, 0) * G + g, G * NB)
        E = (
            jnp.moveaxis(E, 0, 1).reshape(-1)
            .at[flat].max(jnp.where(ok, r * 16 + span, 0), mode="drop")
        )
        E = jnp.moveaxis(E.reshape(NB, G), 1, 0)

    kpad_keys = jnp.concatenate(
        [x_keys, jnp.full((1,), 0x7FFFFFFF, jnp.int32)]
    )
    blk = jnp.arange(Vp, dtype=jnp.int32) // bs  # (Vp,)
    Kcov = jnp.take(
        kpad_keys,
        jnp.clip(jnp.take_along_axis(E, blk[None], axis=1), 0, Vin),
    )  # (G, Vp)

    iy = ocoords[:, 1] * sy - py + ky[:, None]
    iz = ocoords[:, 2] * sz - pz + kz[:, None]
    row_ok = (
        (ovalid[None] > 0)
        & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    )
    q_all = (iz * Y + iy) * X + (ocoords[:, 0] * sx - px)[None]
    # start side (positional, exact): window keys exist below the span
    # start iff the first key >= q sits before sb*16 AND is < q + kx.
    # With true-min anchoring this is structurally 0; counted so the
    # exact counter certifies both ends independent of anchoring.
    pos_all = _bisect(
        x_keys, jnp.where(row_ok, q_all, 0),
        max(1, math.ceil(math.log2(Vin + 1))),
    )
    k_at_pos = jnp.take(kpad_keys, jnp.clip(pos_all, 0, Vin))
    start_at = jnp.take_along_axis(sb * 16, blk[None], axis=1)  # (G, Vp)
    start_viol = (pos_all < start_at) & (k_at_pos < q_all + kx)
    return jnp.sum(row_ok & ((q_all + kx > Kcov) | start_viol))


def _gw_kernel(
    # scalar prefetch
    gs_ref,  # (4, JS) int32: rows = (group, block [-1 dead], start tile,
    # exclusion row); sorted by (block, group), dead slots last
    gp_ref,  # (GP, 2) int32 (ky_i, kz_i)
    # blocked inputs
    site_ref,  # (1, 8, BS) int32 at the slot's block
    wg_ref,  # (1, kx*TCP, TOP) the slot's group's folded weights
    io_ref,  # (BS, TOP) f32 — main kernel's output block (aliased)
    # ANY inputs
    keys2_ref,
    feats_ref,
    # output (aliased onto the main output buffer)
    out_ref,  # (BS, TOP) f32
    # scratch
    kscr,  # (8, SPAN) int32
    fscr,  # (SPAN, TCP)
    sems,  # DMA (2,)
    *,
    kx,
    G,
    span,
    bs,
    in_dims,
    stride3,
    pad3,
    tilemap=None,
    residue=False,
):
    """Greedy coverage slots: one grid step = ONE extra window of ONE
    (group, block) pair (flat slot list from _plan_finish). Each step DMAs
    its span, equality-extracts the kx taps, folds with the slot's group
    weights and accumulates onto the main kernel's output block via
    input/output aliasing. Slots are sorted by block so revisits of an
    output block are CONSECUTIVE grid steps (the block stays resident —
    no stale read-back through the alias), with the first slot of each
    block adding onto io_ref and later slots onto out_ref. The exclusion
    row bound masks span rows already covered by the pair's earlier
    windows (greedy windows can overlap only below their exclusion)."""
    SPAN = span
    j = pl.program_id(0)
    X, Y, Z = in_dims
    sx, sy, sz = stride3
    px, py, pz = pad3

    b = gs_ref[1, j]
    live = b >= 0
    g = gs_ref[0, j]
    r = gs_ref[2, j]
    excl = gs_ref[3, j]

    # branch-free DMAs (conditional DMAs crash the TPU runtime — PERF.md);
    # dead slots DMA row 0 and their contribution is discarded
    s = pl.multiple_of(r * 16, 16)
    r8 = pl.multiple_of((r // 8) * 8, 8)
    ck = pltpu.make_async_copy(
        keys2_ref.at[pl.ds(r8, 8), :], kscr, sems.at[0]
    )
    cf = pltpu.make_async_copy(
        feats_ref.at[pl.ds(s, SPAN), :], fscr, sems.at[1]
    )
    ck.start()
    cf.start()

    ox = site_ref[0, 0, :]
    oy = site_ref[0, 1, :]
    oz = site_ref[0, 2, :]
    valid = site_ref[0, 3, :] > 0
    xbase = ox * sx - px
    ky_i = gp_ref[g, 0]
    kz_i = gp_ref[g, 1]
    iy = oy * sy - py + ky_i
    iz = oz * sz - pz + kz_i
    row_ok = valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    q = (iz * Y + iy) * X + xbase  # (BS,)

    ck.wait()
    cf.wait()

    prev_b = gs_ref[1, jnp.maximum(j - 1, 0)]
    fresh = (j == 0) | (prev_b != b)

    # dead slots (budget padding at the tail) skip all compute — they
    # cost one span DMA only
    @pl.when(live)
    def _():
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, SPAN), 0)
        kspan = jnp.sum(
            jnp.where(subl == (r - (r // 8) * 8), kscr[:], 0),
            axis=0, keepdims=True,
        )  # (1, SPAN)
        # rows below the exclusion bound were covered by the pair's
        # earlier windows — mask them to a value no query can equal
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)
        kspan2 = jnp.where(r * 16 + lane >= excl, kspan, -2)

        f = fscr[:]
        if residue:
            contrib = _residue_contrib(
                kspan2, q, xbase, row_ok, f, wg_ref[0], kx, X, wg_ref.dtype
            )

            @pl.when(fresh)
            def _():
                out_ref[:] = io_ref[:] + contrib

            @pl.when(jnp.logical_not(fresh))
            def _():
                out_ref[:] = out_ref[:] + contrib

            return
        parts = []
        for d in range(kx):
            ok_d = row_ok & (xbase + d >= 0) & (xbase + d < X)
            qd = jnp.where(ok_d, q + d, -0x7FFFFFF)
            oh = (kspan2 == qd[:, None]).astype(wg_ref.dtype)
            parts.append(
                jax.lax.dot_general(
                    oh, f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        if tilemap is None:
            src = jnp.concatenate(parts, axis=1).astype(wg_ref.dtype)
            contrib = jax.lax.dot_general(
                src, wg_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BS, TOP)
        else:
            TCP_ = fscr.shape[-1]
            kpd = TCP_ // 128

            def src_of(k0, k1):
                segs = []
                k = k0
                while k < k1:
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
                src_of, wg_ref[0], tilemap, bs, kx * kpd, wg_ref.shape[-1]
            )

        @pl.when(fresh)
        def _():
            out_ref[:] = io_ref[:] + contrib

        @pl.when(jnp.logical_not(fresh))
        def _():
            out_ref[:] = out_ref[:] + contrib

    # dead slots all park on one trash block; define it once
    @pl.when(jnp.logical_not(live) & fresh)
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
    JS = plan.gs.shape[1]  # greedy coverage slot capacity
    NBP = NB + 1  # dead slots all park on ONE trailing trash block

    import os

    if os.environ.get("INSMOS_SPAN_DEBUG"):
        per_g = kx * TCP * TOP * (2 if weights[0].dtype == jnp.bfloat16 else 4)
        GI_ = max(1, min(G, (4 << 20) // per_g))
        GO_ = -(-G // GI_)
        GP_ = GO_ * GI_
        print(
            f"[span] V={V} Vin={x_keys.shape[0]} bs={bs} NB={NB} span={span}"
            f" kx={kx} G={G} GI={GI_} GP={GP_} JS={JS}"
            f" sbse={GP_ * NB * 4}B gs={4 * JS * 4}B"
            f" TCP={TCP} TOP={TOP} parts={len(parts)}",
            flush=True,
        )
    dtype = (
        weights[0].dtype if weights[0].dtype == jnp.bfloat16 else jnp.float32
    )
    residue = _residue_ok(parts, kx, TC, TCP) and os.environ.get(
        "INSMOS_RESIDUE", "1"
    ) != "0"
    wg = fold_weights_parts(
        weights, parts, kx, G, T_out, dtype, TC, TO
    )  # (G, kx*TC, TO)
    if residue:
        wg = _residue_weights(
            wg.reshape(G, kx, TC, TO), kx, TC, TOP, dtype
        )  # (G, kx*128, TOP) rotated fold matrices
    else:
        wg = jnp.pad(
            wg.reshape(G, kx, TC, TO),
            ((0, 0), (0, 0), (0, TCP - TC), (0, TOP - TO)),
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
            _residue_feats(feats_cat, x_keys, kx, TC, dtype)
            if residue
            else jnp.pad(feats_cat.astype(dtype), ((0, 0), (0, TCP - TC))),
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

    # pack span start; bit 16 marks EMPTY (group, block) pairs (no input
    # key in the pair's query interval — plan-time exact, ~11% of live
    # pairs on the HDL-64E fixture, tools/probe_empty_pairs.py), whose
    # dots the kernel skips; sign bit marks DEAD blocks (no valid output
    # site — slab validity is a sorted prefix), which skip all compute
    # (DMAs still issue unconditionally; PERF.md Mosaic note)
    dead = ovalid.reshape(NB, bs).sum(axis=1) == 0  # (NB,)
    sbse = plan.sb | (plan.emp << 16)
    sbse = jnp.where(dead[None, :], sbse | (-0x80000000), sbse)

    # groups per grid step: as many as keep this step's folded weights
    # within a ~4 MB VMEM budget (the whole group loop then runs inside one
    # step with double-buffered span DMAs — per-step overhead amortized)
    per_g = kx * TCP * TOP * jnp.dtype(dtype).itemsize
    GI = max(1, min(G, (4 << 20) // per_g))
    GO = -(-G // GI)
    GP = GO * GI
    gp = plan.gp
    if GP > G:  # pad: weights zero (contribute nothing), spans copy row 0
        wg = jnp.concatenate(
            [wg, jnp.zeros((GP - G, kx * TCP, TOP), wg.dtype)]
        )
        sbse = jnp.concatenate(
            [sbse, jnp.broadcast_to(sbse[:1] | (1 << 16), (GP - G, NB))]
        )
        gp = jnp.concatenate([gp, jnp.zeros((GP - G, 2), jnp.int32)])

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
        if _tilemap_enabled() and not residue
        else None
    )
    kern = functools.partial(
        _kernel, kx=kx, G=G, GI=GI, span=span, bs=bs, in_dims=in_dims,
        stride3=stride3, pad3=pad3, tilemap=tilemap, residue=residue,
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

    if JS:
        def _blk(j, gs, *_):
            return (jnp.where(gs[1, j] >= 0, gs[1, j], NB), 0)

        ggrid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # gs, gp
            grid=(JS,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, bs),
                    lambda j, gs, *_: (jnp.clip(gs[1, j], 0, NB - 1), 0, 0),
                ),
                pl.BlockSpec(
                    (1, kx * TCP, TOP), lambda j, gs, *_: (gs[0, j], 0, 0)
                ),
                pl.BlockSpec((bs, TOP), _blk),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bs, TOP), _blk),
            scratch_shapes=[
                pltpu.VMEM((8, span), jnp.int32),
                pltpu.VMEM((span, TCP), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        gkern = functools.partial(
            _gw_kernel, kx=kx, G=G, span=span, bs=bs,
            in_dims=in_dims, stride3=stride3, pad3=pad3, tilemap=tilemap,
            residue=residue,
        )
        out = pl.pallas_call(
            gkern,
            grid_spec=ggrid,
            out_shape=jax.ShapeDtypeStruct((NBP * bs, TOP), jnp.float32),
            input_output_aliases={4: 0},
            interpret=_interpret(),
        )(
            plan.gs, gp,
            site_pack, wg, out, keys2, feats_pad,
        )
    return out[:V, :TO]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


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


