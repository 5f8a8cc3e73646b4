"""MotionNet: a 4D (x, y, z, t) sparse UNet over the scan window.

TPU-native rebuild of the reference's MinkowskiEngine path
(models/backbones_3d/motionnet.py + models/MinkowskiEngine/minkunet.py with
CustomMinkUNet channels PLANES=(8,16,32,64,64,32,16,8), INIT_DIM=8, D=4,
MinkUNet14 layer counts of 1 and the deepest level removed).

Structure (channels; kernels as (spatial, temporal)):
  stem    subm (5,1)            in -> 8
  down1   strided (2,1) s(2,1)   8 -> 8   + block1 BasicBlock(8 -> 8, 3^4)
  down2   strided (2,1) s(2,1)   8 -> 8   + block2 BasicBlock(8 -> 16)
  down3   strided (2,1) s(2,1)  16 -> 16  + block3 BasicBlock(16 -> 32)
  up5     inverse (2,1)         32 -> 32  ; cat block2 -> 48; block6 -> 32
  up6     inverse (2,1)         32 -> 16  ; cat block1 -> 24; block7 -> 16
  up7     inverse (2,1)         16 -> 8   ; cat stem   -> 16; block8 -> 8
  final   1x1 conv (bias)        8 -> out (3 motion classes)

Runs on the slab engine (sparse/slab.py): sites are the 3D union of the
pose-aligned window's voxels with a dense T axis, so every spatial
neighbour fetch serves all scans at once and t-kernel offsets are static
shifts. The t axis is the scan slot (0..W-1): a pure translation of the
reference's -9..0 quantized timestamps, which conv offsets cannot observe.

Deviation from the reference (documented): the reference convolves the full
uncropped cloud; we bound coordinates to cfg.motionnet.crop_range (UNet
range + receptive-field margin) so everything is fixed-capacity. Points
outside the crop receive zero motion features; they are out of the 3D
UNet's range too, so final predictions are unaffected except via boundary
halos. Site-capacity overflows are counted and returned (`stats`), not
silent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..sparse.slab import (
    Slab,
    build_slab,
    compact_rows,
    derive_strided_sites,
    dilate_mask,
    gather_slots,
    linearize3,
    parent_index,
    site_grid,
    slice_slots,
    strided_occ,
    take_rows,
    window_tables,
)
from ..sparse.span_conv import make_span_plan, make_span_plans
from .blocks import init_basic_block, init_conv_bn
from .blocks_slab import (
    basic_block_slab_cat,
    basic_block_slab_pruned,
    cat_slab,
    inverse_block_slab,
    subm_block_slab,
)
from .layers import init_linear, mm

def use_span_engine(cfg: Config, train: bool) -> bool:
    """Span (Pallas) engine for inference on accelerator backends; the XLA
    windowed path for training (differentiable) and CPU."""
    mode = cfg.runtime.sparse_engine
    if mode == "window":
        return False
    if mode == "span":
        return True
    return (not train) and jax.default_backend() != "cpu"


def _bn_of(cfg):  # MinkowskiEngine BatchNorm defaults, cfg-scalable
    return {
        "momentum": min(1.0, 0.1 * cfg.train.bn_momentum_scale),
        "eps": 1e-5,
    }

_K_STEM = (5, 5, 5, 1)
_K_DOWN = (2, 2, 2, 1)
_K_BLOCK = (3, 3, 3, 3)
_K3_STEM = (5, 5, 5)
_K3_DOWN = (2, 2, 2)
_K3_BLOCK = (3, 3, 3)
_S2 = (2, 2, 2)
_P0 = (0, 0, 0)


def init_motionnet(key, cfg: Config):
    mc = cfg.model.motionnet
    pl = mc.planes
    d0 = mc.init_dim
    ks = jax.random.split(key, 16)
    params, state = {}, {}

    def add(name, p_s):
        p, s = p_s
        params[name] = p
        state[name] = s

    add("stem", init_conv_bn(ks[0], _K_STEM, 1, d0))
    add("down1", init_conv_bn(ks[1], _K_DOWN, d0, d0))
    add("block1", init_basic_block(ks[2], _K_BLOCK, d0, pl[0], downsample=d0 != pl[0]))
    add("down2", init_conv_bn(ks[3], _K_DOWN, pl[0], pl[0]))
    add("block2", init_basic_block(ks[4], _K_BLOCK, pl[0], pl[1], downsample=True))
    add("down3", init_conv_bn(ks[5], _K_DOWN, pl[1], pl[1]))
    add("block3", init_basic_block(ks[6], _K_BLOCK, pl[1], pl[2], downsample=True))

    add("up5", init_conv_bn(ks[7], _K_DOWN, pl[2], pl[5]))
    add("block6", init_basic_block(ks[8], _K_BLOCK, pl[5] + pl[1], pl[5], downsample=True))
    add("up6", init_conv_bn(ks[9], _K_DOWN, pl[5], pl[6]))
    add("block7", init_basic_block(ks[10], _K_BLOCK, pl[6] + pl[0], pl[6], downsample=True))
    add("up7", init_conv_bn(ks[11], _K_DOWN, pl[6], pl[7]))
    add("block8", init_basic_block(ks[12], _K_BLOCK, pl[7] + d0, pl[7], downsample=True))
    params["final"] = init_linear(ks[13], pl[7], mc.out_channels, bias=True)
    return params, state


def _level_dims(dims3, factor):
    cdiv = lambda a, b: -(-a // b)
    return tuple(cdiv(d, factor) for d in dims3)


def _run_fresh_stem(params, state, cfg, c3_new, pv_new, dims1, span, chunk,
                    bn, stats):
    """T=1 stem pass over the NEW scan's own slab (~0.25x window sites).
    Site capacity is the measured per-scan union (~48-55k voxels from a
    ~125k-point scan), NOT the point capacity — config stem_scan_capacity.
    Returns (nslab, p2slot_scan, fresh stem output)."""
    scan_cap = cfg.model.motionnet.stem_scan_capacity
    nslab, p2s, _, n_drop = build_slab(
        c3_new, jnp.zeros(c3_new.shape[:1], jnp.int32), pv_new, dims1, 1,
        scan_cap,
    )
    stats["dropped"].append(n_drop)
    nslab = nslab.replace_feats(
        (jnp.full((scan_cap, 1), 0.5, jnp.float32) * nslab.occ).astype(
            jnp.float32
        )
    )
    if span:
        # fixture: 1635 live slots / min gwin 32 (tools/probe_gwin.py)
        ntbl = make_span_plan(
            nslab.keys, nslab.coords, nslab.valid, _K3_STEM, in_dims=dims1,
            span=192, slots=3072, gwin=40, pairs=2560,
        )
        stats["span_overflow"].append(ntbl.n_overflow)
    else:
        ntbl = window_tables(
            site_grid(nslab), dims1, nslab.coords, nslab.valid, _K3_STEM,
            vin=scan_cap,
        )
    fresh, _ = subm_block_slab(
        params["stem"], state["stem"], nslab, _K_STEM, ntbl, chunk=chunk, **bn
    )
    return nslab, p2s, fresh


def _incremental_stem(params, state, cfg, x, coords3, point_valid, dims1,
                      span, chunk, bn, stem_cache, stats, cache_shift=None):
    """Fixed-frame streaming stem: T=1 pass on the new scan's slab + a
    key-matched gather of the previous step's cached slots (shifted one
    slot left). Exact because the stem's t-kernel is 1: slot t's output
    is supported on scan t's own site set and depends on no other scan,
    so it is stationary under the window shift in a fixed voxel frame
    (every (site, t<=W-2) pair occupied in this window was present in the
    previous window's slab). See tools/proto_incremental_stem.py.

    ``cache_shift`` ((3,) int32, optional) is the integer-voxel translation
    applied to the stored window this step (pipeline tf = pure translation
    by cache_shift * voxel): a site at new-frame coords c was at c +
    cache_shift in the previous step's frame, so cache queries are shifted
    instead of re-sorting the cache (stem outputs are translation-
    equivariant under integer-voxel shifts). Sites whose shifted coords
    fall outside the grid (the crop just moved onto them) miss and get
    zero history — they lie in the crop margin beyond the 3D UNet's range
    (config.py crop_range vs point_cloud_range)."""
    from ..sparse.span_conv import _bisect
    from ..sparse.slab import linearize3
    from ..sparse.tensor import KEY_SENTINEL as KEY_SENTINEL_

    W, P = point_valid.shape
    cap0 = x.capacity
    C = params["stem"]["conv"]["w"].shape[-1]

    nslab, _, fresh = _run_fresh_stem(
        params, state, cfg, coords3.reshape(W, P, 3)[W - 1],
        point_valid[W - 1], dims1, span, chunk, bn, stats,
    )
    scan_cap = cfg.model.motionnet.stem_scan_capacity

    # cached slots: previous window's (site, t) -> this window's (site, t-1)
    n_iter = max(1, int(np.ceil(np.log2(cap0 + 1))))
    if cache_shift is None:
        qkeys = x.keys
    else:
        # integer-voxel window translation: query the cache at the site's
        # PREVIOUS-frame coords (c + shift); OOB -> sentinel (no match)
        qkeys = linearize3(x.coords + cache_shift[None, :], dims1)
        qkeys = jnp.where(x.valid, qkeys, jnp.int32(KEY_SENTINEL_))
    pos = _bisect(stem_cache["keys"], qkeys, n_iter)
    pos = jnp.clip(pos, 0, cap0 - 1)
    hit = (
        (jnp.take(stem_cache["keys"], pos) == qkeys)
        & x.valid
        & (qkeys != KEY_SENTINEL_)
    )
    rows = jnp.take(stem_cache["feats"], pos, axis=0)  # (cap0, W*C)
    rows = jnp.where(hit[:, None], rows, 0.0)
    shifted = jnp.concatenate(
        [rows[:, C:], jnp.zeros((cap0, C), rows.dtype)], axis=1
    )
    # fresh slot W-1, key-matched from the scan slab
    fpos = _bisect(nslab.keys, x.keys, n_iter)
    fpos = jnp.clip(fpos, 0, scan_cap - 1)
    fhit = (jnp.take(nslab.keys, fpos) == x.keys) & x.valid
    fr = jnp.take(fresh.feats, fpos, axis=0)  # (cap0, C)
    fr = jnp.where(fhit[:, None], fr, 0.0)
    merged = shifted.at[:, (W - 1) * C :].set(fr)
    out = x.replace_feats(merged)
    return out.replace_feats(out.mask_feats())


def motionnet_forward(params, state, cfg: Config, points, point_valid, *,
                      train: bool, prune: bool | None = None,
                      stem_cache: dict | None = None, cache_shift=None,
                      win_cache: dict | None = None,
                      emit_cache: bool = False):
    """points: (W, P, 4+) pose-aligned window; point_valid: (W, P).

    Returns (motion feats for the CURRENT scan (P, C), new_state, stats
    dict with site counts and overflow counters per level). Only the
    current scan's features are consumed downstream (reference
    models/models.py:322-324), which licenses the t-pruned inference
    schedule below.

    `stem_cache` ({"keys": (cap,), "feats": (cap, W*C)}, from the previous
    streaming step) switches the stem to the incremental fixed-frame path:
    the cached slots are key-match gathered onto the new window's site set
    (shifted one slot), and only the NEW scan's slot is computed — a T=1
    stem pass over the new scan's own ~4x-smaller slab. Exact vs the
    direct stem (kt=1: each slot depends only on its own scan's sites;
    tools/proto_incremental_stem.py + tests/test_model.py). The refreshed
    cache is returned in stats["stem_cache"].
    """
    mc = cfg.model.motionnet
    W, P = points.shape[:2]
    chunk = cfg.runtime.conv_chunk
    dims1 = mc.grid_size
    caps = mc.site_capacities

    lo = jnp.asarray(mc.crop_range[:3], points.dtype)
    stats = {"sites": [], "dropped": []}
    ns = {}
    bn = dict(bn_args=_bn_of(cfg), train=train)
    span = use_span_engine(cfg, train)
    if prune is None:
        prune = not train
    stats["span_overflow"] = []

    # incrementally-maintained window site set (streaming fixed-frame
    # mode): consecutive windows share 9/10 scans related by an integer-
    # voxel translation, so the L1 slab is the previous step's site set
    # SHIFTED + occupancy-rolled + merged with the new scan's sites — one
    # (cap0 + scan_cap)-row sort replaces build_slab's W*P-point 3-key
    # sort + occ scatter AND the stem cache's 2*cap0-row bisection merge
    # (slab.maintain_window_slab; exact, tests/test_model.py).
    maintained = stem_cache is not None and win_cache is not None
    nslab = p2s_scan = fresh_stem = stem_shifted = new_pos = None
    if maintained:
        assert not train and prune
        C0 = params["stem"]["conv"]["w"].shape[-1]
        c3_new = jnp.floor(
            (points[W - 1, :, :3] - lo) * 10.0
        ).astype(jnp.int32)
        nslab, p2s_scan, fresh_stem = _run_fresh_stem(
            params, state, cfg, c3_new, point_valid[W - 1], dims1, span,
            chunk, bn, stats,
        )
        from ..sparse.slab import maintain_window_slab
        from ..sparse.tensor import KEY_SENTINEL as _SENTW

        shift_arr = (
            cache_shift if cache_shift is not None
            else jnp.zeros((3,), jnp.int32)
        )
        keys1, coords1, occ1, stem_shifted, new_pos, n1, dropM = (
            maintain_window_slab(
                win_cache["keys"], win_cache["occ"], stem_cache["feats"],
                nslab.keys, nslab.valid, shift_arr, dims1, W, C0, caps[0],
            )
        )
        slab1 = Slab(
            keys1, coords1, occ1, jnp.zeros((caps[0], 0), jnp.float32),
            keys1 != _SENTW, dims1, W,
        )
        p2slot = None  # current-scan mapping built at the final gather
        stats["sites"].append(n1)
        stats["dropped"].append(dropM)
    else:
        xyz = points[..., :3].reshape(W * P, 3)
        coords3 = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)  # 0.1 m
        tcol = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
        ).reshape(W * P)
        slab1, p2slot, n1, drop1 = build_slab(
            coords3, tcol, point_valid.reshape(W * P), dims1, W, caps[0]
        )
        stats["sites"].append(n1)
        stats["dropped"].append(drop1)
    x = slab1.replace_feats(
        (jnp.full((caps[0], W), 0.5, jnp.float32) * slab1.occ).astype(jnp.float32)
    )

    # ---- per-level site derivation, grids, tables/plans --------------
    # decoder spatial pruning (span inference): only the current scan's
    # sites are consumed from the decoder (models/models.py:322-324), so
    # blocks 6/7/8 + up convs run on reach-2 halos of the current scan
    # per level instead of the full window unions (measured needed-site
    # ratios I1 0.47 / I2 0.55 / I4 0.68 — PERF.md round-4 lever).
    prune_dec = bool(prune and span and W > 1 and mc.decoder_prune)
    slabs = {1: x}
    tables = {}
    down_tables = {}
    parent_idx = {}
    dims = {1: dims1}
    for lvl, (fin, fout, cap) in enumerate(
        ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3]))
    ):
        dims[fout] = _level_dims(dims1, fout)
        grid = None if span else site_grid(slabs[fin])
        s_in = slabs[fin]
        nxt, n_s, n_d = derive_strided_sites(
            s_in, _K3_DOWN, _S2, _P0, dims[fout], cap
        )
        stats["sites"].append(n_s)
        stats["dropped"].append(n_d)
        if span:
            # All this level's plans (stem/block/down) bisect the SAME
            # sorted key array — one merged sort serves every query batch
            # (make_span_plans). Spans are sized to the p99 interval
            # (tools/probe_spans); the tail goes through the jumbo
            # coverage pass, whose exact counter bench.py gates at 0.
            # Strided out-blocks crossing a y/z row boundary skip huge key
            # ranges (p999 ~25k rows) -> generous jumbo coverage there;
            # occupancy is folded into the down conv itself
            # (conv_with_occ), so no separate occ pass runs.
            # slots/gwin/pairs sized from fixture-measured need x ~1.4
            # margin (tools/probe_gwin.py: L1 block 2221 slots / gwin 32,
            # downs gwin 4) — every tier-2 greedy round costs ~19 tiny
            # dispatches even with nothing uncovered, so oversized gwin
            # was ~10-15 ms/step of pure overhead (round-5 trace). The
            # bench hard-gates n_overflow == 0, so a regression is loud.
            reqs = []
            # the fin==1 block plan's ONLY consumer is block8 (decoder);
            # with decoder pruning it is replaced by the pruned-set plan
            if fin != 1 or not prune_dec:
                reqs.append(
                    dict(
                        out_coords=s_in.coords, out_valid=s_in.valid,
                        kernel3=_K3_BLOCK, in_dims=dims[fin], bs=128,
                        # span 192: extraction FLOPs and span DMA scale
                        # with span; greedy coverage absorbs the extra
                        # jump pairs (budgets re-validated on all stream
                        # worlds, tools/validate_plan_budgets.py)
                        span=192,
                        # block@L1 gwin stays high: the ref-exact bench
                        # stream measured a far-field pair needing >48
                        # windows (108 uncovered rows) that the static
                        # fixture (even rotated) never shows; tier-2
                        # rounds on the compacted pair set cost ~40 us
                        # each, so the safety is cheap
                        slots={1: 3200, 2: 1536, 4: 512}[fin],
                        gwin={1: 64, 2: 32, 4: 24}[fin],
                        pairs={1: 3072, 2: 1024, 4: 512}[fin],
                    )
                )
            reqs.append(
                dict(
                    out_coords=nxt.coords, out_valid=nxt.valid,
                    kernel3=_K3_DOWN, stride3=_S2, pad3=_P0,
                    in_dims=dims[fin], bs=128, span=256,
                    # gwin 12 -> 24: the S=4 multi-stream bench (different
                    # raycast worlds, moving ego) measured 50 uncovered
                    # rows at down8 with gwin 12; tier-2 rounds on these
                    # small plans are cheap
                    slots={2: 1024, 4: 512, 8: 384}[fout], gwin=24,
                    pairs={2: 2048, 4: 1024, 8: 512}[fout],
                )
            )
            if fin == 1 and stem_cache is None:
                # (the incremental-stem path plans over the new scan's
                # slab instead — see _incremental_stem)
                reqs.append(
                    dict(
                        out_coords=s_in.coords, out_valid=s_in.valid,
                        kernel3=_K3_STEM, in_dims=dims[fin], span=256,
                        slots=12288, gwin=64, pairs=4096,
                    )
                )
            plans = make_span_plans(s_in.keys, reqs)
            pi = 0
            if fin != 1 or not prune_dec:
                tables[fin] = plans[pi]
                pi += 1
            down_tables[fout] = plans[pi]
            pi += 1
            if len(plans) > pi:
                tables["stem"] = plans[pi]
        else:
            if fin == 1 and stem_cache is None:
                tables["stem"] = window_tables(
                    grid, dims[fin], s_in.coords, s_in.valid, _K3_STEM,
                    vin=caps[0],
                )
            tables[fin] = window_tables(
                grid, dims[fin], s_in.coords, s_in.valid, _K3_BLOCK,
                vin=s_in.capacity,
            )
            down_tables[fout] = window_tables(
                grid, dims[fin], nxt.coords, nxt.valid, _K3_DOWN,
                stride3=_S2, pad3=_P0, vin=s_in.capacity,
            )
            nxt = strided_occ(s_in, down_tables[fout], nxt)
        slabs[fout] = nxt
    s8 = slabs[8]
    grid8 = site_grid(s8)
    tables[8] = (
        make_span_plan(
            s8.keys, s8.coords, s8.valid, _K3_BLOCK, in_dims=dims[8],
            bs=128, span=384, slots=128, gwin=8,
        )
        if span
        else window_tables(
            grid8, dims[8], s8.coords, s8.valid, _K3_BLOCK, vin=s8.capacity
        )
    )
    # ---- decoder spatial pruning: halo site subsets + plans ----------
    dec_tbl = {}
    dec_tpl = {}
    dec_idx = {}
    if prune_dec:
        from ..sparse.tensor import KEY_SENTINEL as _SENT

        dcaps = [min(c, s) for c, s in zip(mc.decoder_capacities, caps[:3])]

        def _sel_level(slab_l, src_keys, src_sel, dimsL, cap):
            """Reach-2 Chebyshev halo of the source sites, intersected
            with the level's union site set, compacted (order-preserving,
            keys stay sorted). Overflow joins the motion_dropped gate."""
            m = dilate_mask(src_keys, src_sel, dimsL, 2, slab_l.keys,
                            slab_l.valid)
            idx, nov = compact_rows(m, cap)
            keys = jnp.where(
                idx >= 0, jnp.take(slab_l.keys, jnp.maximum(idx, 0)), _SENT
            )
            coords = take_rows(slab_l.coords, idx)
            vld = idx >= 0
            tpl = Slab(
                keys, coords, jnp.zeros((cap, slab_l.T), bool),
                jnp.zeros((cap, 0), jnp.float32), vld, slab_l.dims, slab_l.T,
            )
            return tpl, idx, nov

        s1 = slabs[1]
        dec_tpl[1], dec_idx[1], nov1 = _sel_level(
            s1, s1.keys, s1.occ[:, W - 1] & s1.valid, dims[1], dcaps[0]
        )
        pk2 = linearize3(dec_tpl[1].coords // 2, dims[2])
        dec_tpl[2], dec_idx[2], nov2 = _sel_level(
            slabs[2], pk2, dec_tpl[1].valid, dims[2], dcaps[1]
        )
        pk4 = linearize3(dec_tpl[2].coords // 2, dims[4])
        dec_tpl[4], dec_idx[4], nov4 = _sel_level(
            slabs[4], pk4, dec_tpl[2].valid, dims[4], dcaps[2]
        )
        stats["dropped"] += [nov1, nov2, nov4]
        # budgets: fixture-measured need (tools/probe_dec_plans.py: L1 1143
        # slots / gwin 32, L2 484/24, L4 148/12) x ~1.5 margin on slots;
        # gwin stays HIGH everywhere: the S=4 multi-stream bench (other
        # raycast worlds, moving ego) measured 71 uncovered rows at dec L4
        # with gwin 24, and tier-2 greedy rounds run on a compacted pair
        # set (~40 us each) so the safety is cheap. Hard-gated at 0.
        for lvl, (slts, gw, prs) in (
            (1, (2304, 48, 2048)), (2, (1024, 32, 768)), (4, (512, 40, 384))
        ):
            dec_tbl[lvl] = make_span_plan(
                dec_tpl[lvl].keys, dec_tpl[lvl].coords, dec_tpl[lvl].valid,
                _K3_BLOCK, in_dims=dims[lvl], bs=128, span=192, slots=slts,
                gwin=gw, pairs=prs,
            )
    if span:
        stats["span_overflow"] = stats["span_overflow"] + [
            t.n_overflow
            for t in (
                [tables["stem"]] if stem_cache is None else []
            ) + [
                dec_tbl[1] if prune_dec else tables[1],
                tables[2], tables[4], tables[8],
                down_tables[2], down_tables[4], down_tables[8],
            ] + ([dec_tbl[2], dec_tbl[4]] if prune_dec else [])
        ]
    # parent indices for the up path (fine -> its stride-2 parent); with
    # decoder pruning the fine sets are the pruned halos and the coarse
    # row space is the pruned coarse set (except L8, which stays full)
    for fin, fout in ((4, 8), (2, 4), (1, 2)):
        if prune_dec:
            grid = grid8 if fout == 8 else site_grid(dec_tpl[fout])
            parent_idx[fin] = parent_index(grid, dims[fout], dec_tpl[fin])
        else:
            grid = grid8 if fout == 8 else site_grid(slabs[fout])
            parent_idx[fin] = parent_index(grid, dims[fout], slabs[fin])

    # ---------------- t-pruning schedule ------------------------------
    # Only the CURRENT scan's output is consumed (reference
    # models/models.py:322-324), and every 3^4 conv extends the temporal
    # receptive field by one slot — so at inference each tensor only needs
    # a trailing slot window (computed EXACTLY: occ-masked features at
    # (site, t) depend only on scans within reach of t). Training keeps
    # the full window: its BatchNorm batch statistics run over all 4D
    # sites, matching the reference.
    # absolute first-needed slot per tensor, anchored to the window END:
    # every 3^4 conv consumes one earlier slot, so the chain steps down by
    # 1 from b8o = W-1. (A min(t, W-1) clamp here was WRONG for W < 10 —
    # it collapsed consecutive stages to the same slot, so deeper convs
    # read slots their producers never computed; caught by the torch e2e
    # oracle at W=2, tests/test_torch_e2e.py. At W=10 the values are
    # unchanged: b2o=1 .. b8o=9.)
    tl = {
        "b2o": W - 9, "b3m": W - 8, "b3o": W - 7, "b6m": W - 6,
        "b6o": W - 5, "b7m": W - 4, "b7o": W - 3, "b8m": W - 2,
        "b8o": W - 1,
    } if prune and W > 1 else {}

    def t0_of(name):
        return max(tl.get(name, 0), 0)

    def sl(slab_full, t0):
        return slice_slots(slab_full, t0, W - t0) if t0 else slab_full

    def resl(tensor, t0_cur, t0_new):
        assert t0_new >= t0_cur
        return (
            slice_slots(tensor, t0_new - t0_cur, W - t0_new)
            if t0_new > t0_cur else tensor
        )

    def block_cat(name, a, b, t0_in, tbl, mid_name, out_name):
        """Residual block over cat(a, b). Span path: channel-split conv
        (no interleaved cat materialized — blocks_slab.basic_block_slab_cat);
        window path: cat_slab + the oracle block."""
        if not span:
            return block(name, cat_slab(a, b), t0_in, tbl, mid_name, out_name)
        mid_t0, out_t0 = t0_of(mid_name), t0_of(out_name)
        y, ns[name] = basic_block_slab_cat(
            params[name], state[name], a, b, _K_BLOCK, tbl,
            resl(a, t0_in, mid_t0), resl(a, t0_in, out_t0),
            t_off1=mid_t0 - t0_in, t_off2=out_t0 - mid_t0, **bn,
        )
        return y, out_t0

    def block(name, x_t, t0_in, tbl, mid_name, out_name):
        # mid/out templates are slot slices of the INPUT tensor: same site
        # set AND real occupancy (the level slabs carry empty occ on the
        # span path, where the down conv computes occ itself)
        mid_t0, out_t0 = t0_of(mid_name), t0_of(out_name)
        y, ns[name] = basic_block_slab_pruned(
            params[name], state[name], x_t, _K_BLOCK, tbl,
            resl(x_t, t0_in, mid_t0), resl(x_t, t0_in, out_t0),
            t_off1=mid_t0 - t0_in, t_off2=out_t0 - mid_t0, chunk=chunk, **bn,
        )
        return y, out_t0

    # ---------------- encoder ----------------
    if maintained:
        # cache slots 0..W-2 were re-rowed by maintain_window_slab; write
        # the fresh scan's stem output into slot W-1 at its merged rows
        C0 = params["stem"]["conv"]["w"].shape[-1]
        safe_new = jnp.where(
            nslab.valid & (new_pos >= 0), new_pos, caps[0]
        )
        col = (
            jnp.zeros((caps[0] + 1, C0), stem_shifted.dtype)
            .at[safe_new].set(fresh_stem.feats, mode="drop")[: caps[0]]
        )
        merged = jax.lax.dynamic_update_slice(
            stem_shifted, col, (0, (W - 1) * C0)
        )
        out_stem = x.replace_feats(merged)
        out_stem = out_stem.replace_feats(out_stem.mask_feats())
        ns["stem"] = state["stem"]
    elif stem_cache is not None:
        assert not train, "incremental stem is an inference-only path"
        out_stem = _incremental_stem(
            params, state, cfg, x, coords3, point_valid, dims1, span, chunk,
            bn, stem_cache, stats, cache_shift=cache_shift,
        )
        ns["stem"] = state["stem"]
    else:
        out_stem, ns["stem"] = subm_block_slab(
            params["stem"], state["stem"], x, _K_STEM, tables["stem"], chunk=chunk, **bn
        )
    if stem_cache is not None or emit_cache:
        stats["stem_cache"] = {"keys": x.keys, "feats": out_stem.feats}
        stats["win"] = {"keys": slab1.keys, "occ": slab1.occ}
    y, ns["down1"] = subm_block_slab(
        params["down1"], state["down1"], out_stem, _K_DOWN, down_tables[2],
        out=slabs[2], chunk=chunk, with_occ=span, **bn,
    )
    out_b1, _ = block("block1", y, 0, tables[2], "b1m", "b1o")
    y, ns["down2"] = subm_block_slab(
        params["down2"], state["down2"], out_b1, _K_DOWN, down_tables[4],
        out=slabs[4], chunk=chunk, with_occ=span, **bn,
    )
    out_b2, t_b2 = block("block2", y, 0, tables[4], "b2m", "b2o")
    y, ns["down3"] = subm_block_slab(
        params["down3"], state["down3"], out_b2, _K_DOWN, down_tables[8],
        out=sl(slabs[8], t_b2), chunk=chunk, with_occ=span, **bn,
    )
    y, t_b3 = block("block3", y, t_b2, tables[8], "b3m", "b3o")

    # ---------------- decoder ----------------
    # inverse-conv fine templates: the occ-bearing encoder outputs, slot-
    # sliced to the coarse tensor's range. With decoder pruning the
    # laterals are row-gathered onto the halo subsets (same keys order,
    # occupancy rides along), and the blocks use the pruned-set plans —
    # exact on every consumed output: the final gather reads current-scan
    # sites only, each conv's needed inputs lie within reach 2, and
    # occupancy masking zeroes any farther (unconsumed) rows.
    if prune_dec:

        def _prune_lat(t: Slab, lvl):
            idx = dec_idx[lvl]
            tpl = dec_tpl[lvl]
            occ = take_rows(t.occ, idx, fill=False)
            return Slab(
                tpl.keys, tpl.coords, occ, take_rows(t.feats, idx),
                tpl.valid, t.dims, t.T,
            )

        lat4 = _prune_lat(out_b2, 4)
        lat2 = _prune_lat(out_b1, 2)
        lat1 = _prune_lat(out_stem, 1)
        tbl4, tbl2, tbl1 = dec_tbl[4], dec_tbl[2], dec_tbl[1]
    else:
        lat4, lat2, lat1 = out_b2, out_b1, out_stem
        tbl4, tbl2, tbl1 = tables[4], tables[2], tables[1]
    y, ns["up5"] = inverse_block_slab(
        params["up5"], state["up5"], y, resl(lat4, t_b2, t_b3),
        parent_idx[4], **bn,
    )
    y, t_b6 = block_cat(
        "block6", y, resl(lat4, t_b2, t_b3), t_b3, tbl4, "b6m", "b6o"
    )
    y, ns["up6"] = inverse_block_slab(
        params["up6"], state["up6"], y, resl(lat2, 0, t_b6), parent_idx[2],
        **bn,
    )
    y, t_b7 = block_cat(
        "block7", y, resl(lat2, 0, t_b6), t_b6, tbl2, "b7m", "b7o"
    )
    y, ns["up7"] = inverse_block_slab(
        params["up7"], state["up7"], y, resl(lat1, 0, t_b7), parent_idx[1],
        **bn,
    )
    y, t_b8 = block_cat(
        "block8", y, resl(lat1, 0, t_b7), t_b7, tbl1, "b8m", "b8o"
    )

    w_f = params["final"]["w"]
    cout = w_f.shape[-1]
    Tf = y.T  # W - t_b8 (1 when pruned)
    # per-t 1x1 conv, flat: block-diagonal kron weight + tiled bias
    logits = mm(y.feats, jnp.kron(jnp.eye(Tf, dtype=w_f.dtype), w_f)) + jnp.tile(
        params["final"]["b"], Tf
    )
    out = y.replace_feats(logits)
    out = out.replace_feats(out.mask_feats())
    if Tf == W:
        per_point = gather_slots(out, p2slot, cout).reshape(W, P, cout)
        cur = per_point[W - 1]
    else:
        assert t_b8 == W - 1 and Tf == 1
        if maintained:
            # current points -> nslab site -> merged window row
            sp = jnp.clip(p2s_scan, 0, new_pos.shape[0] - 1)
            mrow = jnp.take(new_pos, sp)
            site_or_neg = jnp.where((p2s_scan >= 0) & (mrow >= 0), mrow, -1)
        else:
            p2s_cur = p2slot[(W - 1) * P :]
            site_or_neg = jnp.where(p2s_cur >= 0, p2s_cur // W, -1)
        if prune_dec:
            # map full-union site rows to pruned-halo rows by key match
            # (current-scan sites are in the halo by construction; a miss
            # can only come from halo-capacity overflow, which the
            # motion_dropped hard gate already counts)
            from ..sparse.span_conv import _bisect
            from ..sparse.tensor import KEY_SENTINEL as _SENT2

            cap0 = slab1.capacity
            keys_pad = jnp.concatenate(
                [slab1.keys, jnp.full((1,), _SENT2, jnp.int32)]
            )
            skeys = jnp.take(
                keys_pad, jnp.where(site_or_neg >= 0, site_or_neg, cap0)
            )
            capp = dec_tpl[1].capacity
            n_it = max(1, int(np.ceil(np.log2(capp + 1))))
            pos = jnp.clip(
                _bisect(dec_tpl[1].keys, skeys, n_it), 0, capp - 1
            )
            hit = (
                (jnp.take(dec_tpl[1].keys, pos) == skeys)
                & (site_or_neg >= 0)
            )
            site_or_neg = jnp.where(hit, pos, -1)
        cur = gather_slots(out, site_or_neg, cout)
    return cur, ns, stats
