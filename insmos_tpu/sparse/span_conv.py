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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slab import Slab, _groups_yz
from .tensor import KEY_SENTINEL

BS = 128  # sites per block
SPAN = 256  # input span rows fetched per (block, group)


def _bisect(keys, queries, n_iter):
    """Vectorized first-index-with-key >= query over a sorted array."""
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


def fold_weights(weight, kx, G, kt, T, dtype):
    """(K, cin, cout) -> (G, kx*T*cin, T*cout) with the t-kernel folded in
    as a (T, T) band — identical layout to window_conv's wg."""
    K, cin, cout = weight.shape
    lo = (kt - 1) // 2
    w5 = weight.reshape(kt, G, kx, cin, cout)
    bands = jnp.stack(
        [jnp.eye(T, k=-(it - lo), dtype=dtype) for it in range(kt)]
    )
    return jnp.einsum(
        "igdco,itp->gdtcpo", w5.astype(dtype), bands
    ).reshape(G, kx * T * cin, T * cout)


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
            src = jnp.concatenate(parts, axis=1).astype(wg_ref.dtype)

            contrib = jax.lax.dot_general(
                src, wg_ref[gi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BS, TOP)
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
    n_overflow: jax.Array  # () int32 rows beyond even the dual-span cover
    kernel3: tuple = dataclasses.field(metadata={"static": True})
    stride3: tuple = dataclasses.field(metadata={"static": True})
    pad3: tuple = dataclasses.field(metadata={"static": True})
    in_dims: tuple = dataclasses.field(metadata={"static": True})
    span: int = dataclasses.field(default=SPAN, metadata={"static": True})
    bs: int = dataclasses.field(default=BS, metadata={"static": True})

    def conv(self, x: Slab, weight, out: Slab, kernel, chunk=None) -> Slab:
        """window_conv-compatible entry (chunk ignored)."""
        kt = kernel[3] if len(kernel) == 4 else 1
        feats = span_conv_apply(
            x.keys, x.mask_feats(), out.coords, out.valid, weight,
            self.sb, self.se, self.gp, x.T, self.kernel3, kt,
            self.stride3, self.pad3, self.in_dims, self.span, self.bs,
        )
        res = out.replace_feats(feats)
        return res.replace_feats(res.mask_feats())

    def conv_with_occ(self, x: Slab, weight, out: Slab, kernel) -> Slab:
        """Strided conv that ALSO propagates occupancy (OR over gathered
        children) in the same kernel pass: the input grows a per-t ones
        channel and the weight a diagonal occ->occ output channel — free
        when T*(cin+1) stays within the 128-lane padding. Replaces
        span_strided_occ's separate pass for down convs."""
        kt = kernel[3] if len(kernel) == 4 else 1
        assert kt == 1, "occ folding assumes a t-kernel of 1 (down convs)"
        K, cin, cout = weight.shape
        T = x.T
        f = x.mask_feats()
        occf = jnp.where(x.valid[:, None], x.occ, False).astype(f.dtype)
        cols = []
        for t in range(T):
            cols.append(f[:, t * cin : (t + 1) * cin])
            cols.append(occf[:, t : t + 1])
        fa = jnp.concatenate(cols, axis=-1)  # (V, T*(cin+1))
        wa = (
            jnp.zeros((K, cin + 1, cout + 1), weight.dtype)
            .at[:, :cin, :cout].set(weight)
            .at[:, cin, cout].set(1.0)
        )
        feats = span_conv_apply(
            x.keys, fa, out.coords, out.valid, wa,
            self.sb, self.se, self.gp, T, self.kernel3, 1,
            self.stride3, self.pad3, self.in_dims, self.span, self.bs,
        )  # (V, T*(cout+1))
        co = cout + 1
        out_cols = []
        occ_cols = []
        for t in range(T):
            out_cols.append(feats[:, t * co : t * co + cout])
            occ_cols.append(feats[:, t * co + cout : (t + 1) * co])
        out_feats = jnp.concatenate(out_cols, axis=-1)
        occ = (jnp.concatenate(occ_cols, axis=-1) > 0.5) & out.valid[:, None]
        res = Slab(
            out.keys, out.coords, occ, out_feats, out.valid, out.dims, out.T
        )
        return res.replace_feats(res.mask_feats())


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel3", "stride3", "pad3", "in_dims", "span", "bs", "exact_stats",
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
    exact_stats: bool = False,
) -> SpanPlan:
    """Compute per-(group, block) span starts by bisection over the sorted
    input keys.

    For rare blocks whose key interval exceeds the span (a skipped z/y
    region), the window anchors at whichever end covers the block's
    MEDIAN site, keeping the majority side; the minority's contributions
    drop and are counted. The production overflow counter is a cheap
    proxy (3 sentinel sites per block: first/median/last); pass
    exact_stats=True (tools/sweeps) for the exact per-site coverage count,
    which materializes a (G, V) query array (~60 ms at L1 scale).
    """
    kx = int(kernel3[0])
    if pad3 is None:
        pad3 = tuple((k - 1) // 2 for k in kernel3)
    groups = _groups_yz(kernel3)
    V = out_coords.shape[0]
    Vin = x_keys.shape[0]
    NB = -(-V // bs)
    Vp = NB * bs

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
        iy = c3[:, 1] * sy - py + ky[:, None]
        iz = c3[:, 2] * sz - pz + kz[:, None]
        q = (iz * Y + iy) * X + (c3[:, 0] * sx - px)[None]
        return jnp.where(v[None] > 0, q, fill)  # (G, NB)

    BIG = jnp.iinfo(jnp.int32).max
    # per-block last/median VALID site (q is monotone within a block for
    # every group, so three sentinel sites characterize the interval)
    vblk = ovalid.reshape(NB, bs)
    nvalid_blk = vblk.sum(axis=1)  # (NB,)
    base = jnp.arange(NB, dtype=jnp.int32) * bs
    last_i = base + jnp.maximum(nvalid_blk - 1, 0)
    mid_i = base + jnp.maximum(nvalid_blk // 2 - 0, 0)

    firsts = block_q(ocoords[::bs], ovalid[::bs], BIG)
    lasts = block_q(
        jnp.take(ocoords, last_i, axis=0), (nvalid_blk > 0).astype(jnp.int32), -1
    )
    mids = block_q(
        jnp.take(ocoords, mid_i, axis=0), (nvalid_blk > 0).astype(jnp.int32), -1
    )
    n_iter = max(1, math.ceil(math.log2(Vin + 1)))
    # one stacked bisection serves all three query sets
    pos3 = _bisect(
        x_keys, jnp.stack([firsts, lasts + kx, mids]), n_iter
    )
    sb_head = pos3[0] // 16  # tile units
    send = pos3[1]
    mid_pos = pos3[2]
    sb_tail = jnp.maximum(send - span, 0) // 16
    jump = send - sb_head * 16 > span
    # anchor at the end that covers the median site
    use_tail = jump & (mid_pos >= sb_head * 16 + span)
    sb = jnp.where(use_tail, sb_tail, sb_head)
    se = -(-send // 16)

    if exact_stats:
        # exact: (site, group) pairs whose present window cells are not
        # fully inside the chosen fetch window
        iy_all = ocoords[:, 1] * sy - py + ky[:, None]
        iz_all = ocoords[:, 2] * sz - pz + kz[:, None]
        q_all = (iz_all * Y + iy_all) * X + (ocoords[:, 0] * sx - px)[None]
        q_all = jnp.where(ovalid[None] > 0, q_all, -1)
        q_blk = q_all.reshape(-1, NB, bs)
        kpad2 = jnp.concatenate(
            [x_keys, jnp.full((1,), 0x7FFFFFFF, jnp.int32)]
        )
        kend = jnp.take(kpad2, jnp.minimum(sb * 16 + span, Vin))
        kbefore = jnp.where(
            sb > 0, jnp.take(kpad2, jnp.clip(sb * 16 - 1, 0, Vin)), -1
        )
        ok = (
            (q_blk + kx <= kend[..., None])
            & (kbefore[..., None] < q_blk)
            & (q_blk >= 0)
        )
        n_overflow = jnp.sum((q_blk >= 0).astype(jnp.int32)) - jnp.sum(ok)
    else:
        # proxy: jump blocks times half a block (the anchored side is kept)
        n_overflow = jnp.sum(jnp.where(jump, bs // 2, 0))

    gp = jnp.stack([ky, kz], axis=1)  # (G, 2)
    return SpanPlan(
        sb=sb, se=se, gp=gp, n_overflow=n_overflow,
        kernel3=tuple(kernel3), stride3=tuple(stride3), pad3=tuple(pad3),
        in_dims=tuple(in_dims), span=span, bs=bs,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "kernel3", "kt", "stride3", "pad3", "in_dims", "span", "bs",
    ),
)
def span_conv_apply(
    x_keys,  # (Vin,) int32 sorted input site keys
    x_feats,  # (Vin, T*cin) input features (zeros at padding/non-occ)
    out_coords,  # (V, 3)
    out_valid,  # (V,)
    weight,  # (K, cin, cout)
    sb,  # (G, NB) from make_span_plan
    se,  # (G, NB)
    gp,  # (G, 2)
    T: int,
    kernel3,
    kt: int = 1,
    stride3=(1, 1, 1),
    pad3=None,
    in_dims=None,
    span: int = SPAN,
    bs: int = BS,
):
    """Run the span kernel with a precomputed plan. Returns out_feats
    (V, T*cout) f32."""
    kx = int(kernel3[0])
    groups = _groups_yz(kernel3)
    G = len(groups)
    K, cin, cout = weight.shape
    assert K == kx * G * kt
    TC = T * cin
    TO = T * cout
    # lane-pad feature/output widths to the 128-lane DMA tiling; the
    # hardware pads every array to 128 lanes anyway, this makes it explicit
    TCP = -(-TC // 128) * 128
    TOP = -(-TO // 128) * 128
    V = out_coords.shape[0]
    NB = -(-V // bs)
    Vp = NB * bs

    dtype = weight.dtype if weight.dtype == jnp.bfloat16 else jnp.float32
    wg = fold_weights(weight, kx, G, kt, T, dtype)  # (G, kx*TC, TO)
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
            jnp.pad(x_feats.astype(dtype), ((0, 0), (0, TCP - TC))),
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

    # pack span start + length; sign bit marks DEAD blocks (no valid output
    # site — slab validity is a sorted prefix), whose matmuls the kernel
    # skips entirely (DMAs still issue unconditionally; PERF.md Mosaic note)
    dead = ovalid.reshape(NB, bs).sum(axis=1) == 0  # (NB,)
    sbse = sb | jnp.minimum(se - sb, 0x7FFF) << 16
    sbse = jnp.where(dead[None, :], sbse | (-0x80000000), sbse)

    # groups per grid step: as many as keep this step's folded weights
    # within a ~4 MB VMEM budget (the whole group loop then runs inside one
    # step with double-buffered span DMAs — per-step overhead amortized)
    per_g = kx * TCP * TOP * jnp.dtype(dtype).itemsize
    GI = max(1, min(G, (4 << 20) // per_g))
    GO = -(-G // GI)
    GP = GO * GI
    if GP > G:  # pad: weights zero (contribute nothing), spans copy row 0
        wg = jnp.concatenate(
            [wg, jnp.zeros((GP - G, kx * TCP, TOP), wg.dtype)]
        )
        sbse = jnp.concatenate(
            [sbse, jnp.broadcast_to(sbse[:1], (GP - G, NB))]
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

    kern = functools.partial(
        _kernel, kx=kx, G=G, GI=GI, span=span, bs=bs, in_dims=in_dims,
        stride3=stride3, pad3=pad3,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vp, TOP), jnp.float32),
        interpret=_interpret(),
    )(
        sbse, gp,
        site_pack,
        wg, keys2, feats_pad,
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


def span_strided_occ(x: Slab, plan: SpanPlan, out: Slab) -> Slab:
    """out.occ = OR over gathered children's occupancy, via the span kernel
    with all-ones weights on occ-as-features (replaces strided_occ for the
    span engine)."""
    kernel3 = plan.kernel3
    K = int(np.prod(kernel3))
    occ_feats = jnp.where(
        x.valid[:, None], x.occ, False
    ).astype(jnp.float32)  # (V, T*1)
    ones = jnp.ones((K, 1, 1), jnp.float32)
    acc = span_conv_apply(
        x.keys, occ_feats, out.coords, out.valid, ones,
        plan.sb, plan.se, plan.gp, x.T, kernel3, 1,
        plan.stride3, plan.pad3, plan.in_dims, plan.span, plan.bs,
    )  # (V, T)
    occ = (acc > 0.5) & out.valid[:, None]
    return Slab(out.keys, out.coords, occ, out.feats, out.valid, out.dims, out.T)
