"""UNetV2: 3D sparse encoder/decoder with detection branch and instance
fusion — the core network (reference models/backbones_3d/spconv_unet.py).

Encoder (channels 16/32/64/128 at strides 1/2/4/8, spconv_unet.py:120-158):
  conv_input subm(in -> 16) ; conv1 subm(16) ;
  conv2 strided(16 -> 32, s2) + 2 subm ; conv3 strided(32 -> 64, s2) + 2 subm ;
  conv4 strided(64 -> 128, s2) + 2 subm ;
  conv_out strided z-only (kernel (1,1,3) in our (x,y,z) order, stride
  (1,1,2), pad 0) -> the encoded tensor handed to the BEV/detection branch.

Decoder with instance fusion (spconv_unet.py:180-221, 319-402): at each
level, predicted boxes (scaled into that level's grid units) mark voxels
with a per-class one-hot instance feature computed ON DEVICE
(ops.box_class_features replaces the 4 host Array_Index round-trips); the
concat is fused by a subm conv, then the UR block (lateral residual +
channel_reduction + inverse conv) restores the next finer site set.

All convs run on the slab engine (sparse/slab.py, T=1): windowed gathers
with per-level window tables for subm/strided convs; inverse convs replay
the recorded site derivation pairs (spconv SparseInverseConv3d semantics,
spconv_unet.py:181-207). The mos head is a Linear(16 -> 3) on stride-1
voxels, devoxelized to points (spconv_unet.py:406-410).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.points_in_boxes import box_class_features
from ..sparse import SparseTensor, strided_conv_sites, to_dense_bev
from ..sparse.convs import inverse_conv_pairs
from ..sparse.slab import (
    Slab,
    site_grid,
    slab_from_sparse,
    sparse_from_slab,
    window_tables,
)
from .blocks import init_basic_block, init_conv_bn
from .blocks_slab import basic_block_slab, cat_slab, subm_block_slab
from .layers import batch_norm, init_linear, relu

def _bn_of(cfg):  # reference norm_fn (spconv_unet.py:118), cfg-scalable
    return {
        "momentum": min(1.0, 0.01 * cfg.train.bn_momentum_scale),
        "eps": 1e-3,
    }
_K3 = (3, 3, 3)
_S2 = (2, 2, 2)
_P1 = (1, 1, 1)
_KZ = (1, 1, 3)  # z-only kernel: reference (3,1,1) in its (z,y,x) layout
_SZ = (1, 1, 2)
_PZ = (0, 0, 0)


def init_unet3d(key, cfg: Config):
    ch = cfg.model.unet_channels  # (16, 32, 64, 128)
    nc = cfg.model.head.num_class
    cin = cfg.model.point_features + 3
    ks = iter(jax.random.split(key, 40))
    params, state = {}, {}

    def add(name, p_s):
        p, s = p_s
        params[name] = p
        state[name] = s

    add("conv_input", init_conv_bn(next(ks), _K3, cin, ch[0]))
    add("conv1", init_conv_bn(next(ks), _K3, ch[0], ch[0]))
    for lvl in (2, 3, 4):
        add(f"conv{lvl}_down", init_conv_bn(next(ks), _K3, ch[lvl - 2], ch[lvl - 1]))
        add(f"conv{lvl}_a", init_conv_bn(next(ks), _K3, ch[lvl - 1], ch[lvl - 1]))
        add(f"conv{lvl}_b", init_conv_bn(next(ks), _K3, ch[lvl - 1], ch[lvl - 1]))
    add("conv_out", init_conv_bn(next(ks), _KZ, ch[3], ch[3]))

    # decoder + fusion
    params["inv_conv_out"] = {
        "conv": {
            "w": jax.random.normal(next(ks), (3, ch[3], ch[3])) * (1.0 / (3 * ch[3]) ** 0.5)
        }
    }
    add("fuse4", init_conv_bn(next(ks), _K3, ch[3] + nc, ch[3]))
    add("fuse3", init_conv_bn(next(ks), _K3, ch[2] + nc, ch[2]))
    add("fuse2", init_conv_bn(next(ks), _K3, ch[1] + nc, ch[1]))
    add("fuse1", init_conv_bn(next(ks), _K3, ch[0] + nc, ch[0]))
    add("fuse1_final", init_conv_bn(next(ks), _K3, ch[0] + nc, ch[0]))

    for lvl, c in ((4, ch[3]), (3, ch[2]), (2, ch[1]), (1, ch[0])):
        add(f"up_t{lvl}", init_basic_block(next(ks), _K3, c, c, downsample=False))
        add(f"up_m{lvl}", init_conv_bn(next(ks), _K3, 2 * c, c))
    add("inv4", init_conv_bn(next(ks), _K3, ch[3], ch[2]))
    add("inv3", init_conv_bn(next(ks), _K3, ch[2], ch[1]))
    add("inv2", init_conv_bn(next(ks), _K3, ch[1], ch[0]))
    add("up_out", init_conv_bn(next(ks), _K3, ch[0], ch[0]))

    params["mos_head"] = init_linear(next(ks), ch[0], 3, bias=True)
    return params, state


def _channel_reduction(feats, cout: int):
    """(N, Cin) -> (N, cout) summing groups of Cin//cout adjacent channels
    (spconv_unet.py:223-238)."""
    n, cin = feats.shape
    return feats.reshape(n, cout, cin // cout).sum(axis=2)


def _inverse_block(p, s, ns, name, coarse: Slab, fine_sites, pairs, kidx, *, cfg, train):
    """Inverse conv (pairs replay) + BN + ReLU, slab-wrapped."""
    y = inverse_conv_pairs(
        sparse_from_slab(coarse), p[name]["conv"]["w"], fine_sites, pairs,
        kidx, kernel_size=_K3, stride=_S2, pad=_P1,
    )
    f, bn_s = batch_norm(
        p[name]["bn"], s[name]["bn"], y.feats, train=train, mask=y.valid, **_bn_of(cfg)
    )
    ns[name] = {"bn": bn_s}
    return slab_from_sparse(y.replace_feats(relu(f) * y.valid[:, None]))


def _ur_block(params, state, ns, names, lat: Slab, bot: Slab, table, fine_sites,
              pairs=None, *, cfg, train, last=False):
    """UR_block_forward (spconv_unet.py:213-221): lateral residual fusion;
    the trailing inverse conv restores the next finer site set (or stays a
    subm conv at the last level)."""
    t_name, m_name, inv_name = names
    bn = dict(bn_args=_bn_of(cfg), train=train)
    x_t, ns[t_name] = basic_block_slab(
        params[t_name], state[t_name], lat, _K3, table, **bn
    )
    cat = cat_slab(bot, x_t)
    x_m, ns[m_name] = subm_block_slab(
        params[m_name], state[m_name], cat, _K3, table, **bn
    )
    red = _channel_reduction(cat.feats, x_m.num_features)
    fused = x_m.replace_feats(x_m.feats + red)
    fused = fused.replace_feats(fused.mask_feats())
    if last:
        out, ns[inv_name] = subm_block_slab(
            params[inv_name], state[inv_name], fused, _K3, table, **bn
        )
        return out
    prs, kis = pairs
    return _inverse_block(
        params, state, ns, inv_name, fused, fine_sites, prs, kis, cfg=cfg,
        train=train
    )


def unet3d_forward(
    params,
    state,
    cfg: Config,
    x: SparseTensor,  # voxelized current scan, features (V, 7)
    boxes_fn,  # callable(bev (H, W, C)) -> (boxes (M, 8) world, valid (M,))
    *,
    train: bool,
):
    """Returns (mos voxel logits (V, 3), bev map, new_state, stats)."""
    mc = cfg.model
    gx, gy, gz = cfg.data.grid_size
    caps = mc.unet_capacities
    ns = {}
    bn = dict(bn_args=_bn_of(cfg), train=train)

    cdiv = lambda a, b: -(-a // b)
    dims = {s: (cdiv(gx, s), cdiv(gy, s), cdiv(gz, s)) for s in (1, 2, 4, 8)}

    stats = {"sites": [], "dropped": []}

    # ------------- site derivation + window tables / span plans -------
    from .minkunet4d import use_span_engine
    from ..sparse.span_conv import make_span_plan, make_span_plans

    span = use_span_engine(cfg, train)
    level_sites = {1: x}  # SparseTensor site sets (for pairs/inverse)
    slabs = {1: slab_from_sparse(x)}
    tables = {}
    down_tables = {}
    pair_maps = {}
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        fin = stride // 2
        s_in = slabs[fin]
        grid = None if span else site_grid(s_in)
        sites, prs, kis = strided_conv_sites(
            level_sites[fin], _K3, _S2, _P1, dims[stride], caps[lvl - 1],
            with_pairs=True,
        )
        pair_maps[stride] = (prs, kis)
        level_sites[stride] = sites
        nxt = slab_from_sparse(sites.sites())
        if span:
            # one merged bisection sort per level (make_span_plans)
            tables[fin], down_tables[stride] = make_span_plans(
                s_in.keys,
                [
                    # budgets = fixture-measured live slots / min gwin x
                    # ~1.4 margin (tools/probe_gwin.py; bench hard-gates
                    # n_overflow == 0, so regressions fail loudly)
                    dict(
                        out_coords=s_in.coords, out_valid=s_in.valid,
                        kernel3=_K3, in_dims=dims[fin], bs=128, span=192,
                        # L1 budgets carry extra slack: the ref-exact bench
                        # stream (rotating heading, per-step re-voxelized)
                        # measured 21 uncovered rows at slots=768/gwin=32
                        # (BENCH round-5 gate), which the fixture-derived
                        # budgets never showed
                        # L2/L4 gwin raised: the S=4 multi-stream bench
                        # (different worlds) measured 3 uncovered rows at
                        # the UNet L2 block plan with gwin 24
                        slots={1: 1536, 2: 768, 4: 384}[fin],
                        gwin={1: 48, 2: 32, 4: 24}[fin],
                        pairs={1: 1024, 2: 512, 4: 256}[fin],
                    ),
                    dict(
                        out_coords=nxt.coords, out_valid=nxt.valid,
                        kernel3=_K3, stride3=_S2, pad3=_P1,
                        in_dims=dims[fin], bs=128,
                        span=384 if stride == 8 else 256,
                        slots=512 if stride < 8 else 128, gwin=12,
                        pairs=1024 if stride < 8 else 512,
                    ),
                ],
            )
        else:
            tables[fin] = window_tables(
                grid, dims[fin], s_in.coords, s_in.valid, _K3,
                vin=s_in.capacity,
            )
            down_tables[stride] = window_tables(
                grid, dims[fin], nxt.coords, nxt.valid, _K3,
                stride3=_S2, pad3=_P1, vin=s_in.capacity,
            )
        slabs[stride] = nxt
        stats["sites"].append(jnp.sum(sites.valid))
    s8 = slabs[8]
    grid8 = None if span else site_grid(s8)
    # conv_out: z-only stride-2 -> encoded sites (stride 8 in xy, 16 in z)
    dims_out = (dims[8][0], dims[8][1], (dims[8][2] - _KZ[2]) // _SZ[2] + 1)
    sites_out, prs_out, kis_out = strided_conv_sites(
        level_sites[8], _KZ, _SZ, _PZ, dims_out, caps[4], with_pairs=True
    )
    if span:
        tables[8], out_tbl = make_span_plans(
            s8.keys,
            [
                dict(
                    out_coords=s8.coords, out_valid=s8.valid, kernel3=_K3,
                    in_dims=dims[8], bs=128, span=384, slots=128, gwin=8,
                ),
                dict(
                    out_coords=sites_out.coords, out_valid=sites_out.valid,
                    kernel3=_KZ, stride3=_SZ, pad3=_PZ, in_dims=dims[8],
                    bs=128, span=384, slots=128, gwin=8, pairs=256,
                ),
            ],
        )
    else:
        tables[8] = window_tables(
            grid8, dims[8], s8.coords, s8.valid, _K3, vin=s8.capacity
        )
        out_tbl = window_tables(
            grid8, dims[8], sites_out.coords, sites_out.valid, _KZ,
            stride3=_SZ, pad3=_PZ, vin=s8.capacity,
        )
    slab_out = slab_from_sparse(sites_out.sites())
    stats["span_overflow"] = (
        [
            tables[1].n_overflow, tables[2].n_overflow, tables[4].n_overflow,
            tables[8].n_overflow, down_tables[2].n_overflow,
            down_tables[4].n_overflow, down_tables[8].n_overflow,
            out_tbl.n_overflow,
        ]
        if span
        else []
    )

    # ---------------- encoder ----------------
    y, ns["conv_input"] = subm_block_slab(
        params["conv_input"], state["conv_input"],
        slabs[1].replace_feats(x.masked_feats()), _K3, tables[1], **bn,
    )
    x_conv1, ns["conv1"] = subm_block_slab(
        params["conv1"], state["conv1"], y, _K3, tables[1], **bn
    )
    enc = {1: x_conv1}
    y = x_conv1
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        y, ns[f"conv{lvl}_down"] = subm_block_slab(
            params[f"conv{lvl}_down"], state[f"conv{lvl}_down"], y, _K3,
            down_tables[stride], out=slabs[stride], **bn,
        )
        y, ns[f"conv{lvl}_a"] = subm_block_slab(
            params[f"conv{lvl}_a"], state[f"conv{lvl}_a"], y, _K3, tables[stride], **bn
        )
        y, ns[f"conv{lvl}_b"] = subm_block_slab(
            params[f"conv{lvl}_b"], state[f"conv{lvl}_b"], y, _K3, tables[stride], **bn
        )
        enc[stride] = y
    encoded, ns["conv_out"] = subm_block_slab(
        params["conv_out"], state["conv_out"], y, _KZ, out_tbl, out=slab_out, **bn
    )

    # ---------------- detection branch on the dense BEV ----------------
    bev = to_dense_bev(sparse_from_slab(encoded))  # (Y/8, X/8, C*Z)
    boxes_world, box_valid = boxes_fn(bev)

    # ---------------- decoder with instance fusion ---------------------
    sparse_inv = inverse_conv_pairs(
        sparse_from_slab(encoded), params["inv_conv_out"]["conv"]["w"],
        level_sites[8].sites(), prs_out, kis_out,
        kernel_size=_KZ, stride=_SZ, pad=_PZ,
    )
    y = slab_from_sparse(sparse_inv.replace_feats(sparse_inv.masked_feats()))

    # boxes in per-level grid units (spconv_unet.py:325-331); yaw is scale-
    # invariant because x/y voxel sizes are equal.
    vs = jnp.asarray(cfg.data.voxel_size)
    lo = jnp.asarray(cfg.data.point_cloud_range[:3])

    def to_grid(b7, stride):
        ctr = (b7[:, 0:3] - lo[None]) / (vs[None] * stride)
        dms = b7[:, 3:6] / (vs[None] * stride)
        return jnp.concatenate([ctr, dms, b7[:, 6:8]], axis=-1)

    nc = mc.head.num_class

    def fuse(level_slab: Slab, stride, fuse_name):
        """instance one-hot on this level's sites -> concat -> subm conv
        (spconv_unet.py:332-347 via Array_Index, on device)."""
        inst = box_class_features(
            level_slab.coords.astype(jnp.float32), to_grid(boxes_world, stride),
            nc, box_valid,
        ) * level_slab.valid[:, None]
        cat = level_slab.replace_feats(
            jnp.concatenate([level_slab.feats, inst], axis=-1)
        )
        out, ns[fuse_name] = subm_block_slab(
            params[fuse_name], state[fuse_name], cat, _K3, tables[stride], **bn
        )
        return out, inst

    y, _ = fuse(y, 8, "fuse4")
    x_up4 = _ur_block(
        params, state, ns, ("up_t4", "up_m4", "inv4"), y, y, tables[8],
        level_sites[4].sites(), pair_maps[8], cfg=cfg, train=train,
    )
    y, _ = fuse(x_up4, 4, "fuse3")
    x_up3 = _ur_block(
        params, state, ns, ("up_t3", "up_m3", "inv3"), enc[4], y, tables[4],
        level_sites[2].sites(), pair_maps[4], cfg=cfg, train=train,
    )
    y, _ = fuse(x_up3, 2, "fuse2")
    x_up2 = _ur_block(
        params, state, ns, ("up_t2", "up_m2", "inv2"), enc[2], y, tables[2],
        level_sites[1].sites(), pair_maps[2], cfg=cfg, train=train,
    )
    y, inst1 = fuse(x_up2, 1, "fuse1")
    x_up1 = _ur_block(
        params, state, ns, ("up_t1", "up_m1", "up_out"), enc[1], y, tables[1],
        None, cfg=cfg, train=train, last=True,
    )

    # final fusion reuses the stride-1 instance features (spconv_unet.py:401)
    cat = x_up1.replace_feats(jnp.concatenate([x_up1.feats, inst1], axis=-1))
    y, ns["fuse1_final"] = subm_block_slab(
        params["fuse1_final"], state["fuse1_final"], cat, _K3, tables[1], **bn
    )

    from .layers import mm
    logits = mm(y.feats, params["mos_head"]["w"]) + params["mos_head"]["b"]
    mos_logits = logits * y.valid[:, None]
    return mos_logits, bev, ns, stats
