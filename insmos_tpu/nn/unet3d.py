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

The mos head is a Linear(16 -> 3) on stride-1 voxels, devoxelized to points
(spconv_unet.py:406-410).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.points_in_boxes import box_class_features
from ..sparse import (
    SparseTensor,
    inverse_conv,
    neighbor_table,
    strided_conv_sites,
    to_dense_bev,
)
from .blocks import (
    init_basic_block,
    init_conv_bn,
    inverse_block_pairs,
    strided_block_pairs,
)
from .layers import init_linear

_BN = {"momentum": 0.01, "eps": 1e-3}  # reference norm_fn (spconv_unet.py:118)
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


def _ur_block_bricks(
    params, state, ns, names, lat_b, bot_b, table, level_sites, fine_sites,
    pairs=None, *, train, last=False,
):
    """UR_block_forward (spconv_unet.py:213-221) in brick space: lateral
    residual fusion; the trailing inverse conv crosses levels through the
    canonical sparse form (or stays a brick subm at the last level)."""
    from ..sparse.bricks import bricks_to_voxel_feats
    from .blocks_bricks import basic_block_bricks, subm_block_bricks

    t_name, m_name, inv_name = names
    bn = dict(bn_args=_BN, train=train)
    x_t, ns[t_name] = basic_block_bricks(
        params[t_name], state[t_name], lat_b, _K3, table, **bn
    )
    cat = x_t.replace_feats(jnp.concatenate([bot_b.feats, x_t.feats], -1))
    x_m, ns[m_name] = subm_block_bricks(
        params[m_name], state[m_name], cat, _K3, table, **bn
    )
    red = _channel_reduction_b(cat.feats, x_m.num_features)
    fused = x_m.replace_feats(x_m.feats + red)
    if last:
        out, ns[inv_name] = subm_block_bricks(
            params[inv_name], state[inv_name], fused, _K3, table, **bn
        )
        return out  # Bricks at the same level
    fused_sp = level_sites.replace_feats(bricks_to_voxel_feats(fused))
    prs, kis = pairs
    out, ns[inv_name] = inverse_block_pairs(
        params[inv_name], state[inv_name], fused_sp, fine_sites, prs, kis, **bn
    )
    return out  # SparseTensor at the finer level


def _channel_reduction_b(feats, cout: int):
    """channel_reduction on (B, BX, Cin) brick features."""
    b, s, cin = feats.shape
    return feats.reshape(b, s, cout, cin // cout).sum(axis=3)


def _instance_feats(x: SparseTensor, boxes_grid, box_valid, num_classes):
    """Per-voxel one-hot instance features from boxes in this level's grid
    units (spconv_unet.py:332-347 via Array_Index)."""
    return box_class_features(
        x.coords.astype(jnp.float32), boxes_grid, num_classes, box_valid
    ) * x.valid[:, None]


def unet3d_forward(
    params,
    state,
    cfg: Config,
    x: SparseTensor,  # voxelized current scan, features (V, 7)
    boxes_fn,  # callable(bev (H, W, C)) -> (boxes (M, 8) world, valid (M,))
    *,
    train: bool,
):
    """Returns (mos voxel logits (V, 3), bev map, new_state).

    All submanifold convs run in brick space (one brick layout + neighbour
    table per level); strided/inverse convs cross levels through the
    canonical sorted-voxel form. `boxes_fn` runs the detection branch on the
    dense BEV of the encoded tensor.
    """
    from ..sparse.bricks import (
        brick_neighbor_table,
        bricks_to_voxel_feats,
        build_bricks,
        voxel_feats_to_bricks,
    )
    from .blocks_bricks import subm_block_bricks

    mc = cfg.model
    gx, gy, gz = cfg.data.grid_size
    caps = mc.unet_capacities
    ns = {}
    bn = dict(bn_args=_BN, train=train)

    cdiv = lambda a, b: -(-a // b)
    dims = {
        s: (cdiv(cdiv(gx, s), 16) * 16, cdiv(gy, s), cdiv(gz, s))
        for s in (1, 2, 4, 8)
    }

    # ---------------- encoder ----------------
    bricks = {}
    tables = {}
    bricks[1] = build_bricks(x, max(256, caps[0] // 4))
    tables[1] = brick_neighbor_table(bricks[1], _K3)
    y_b, ns["conv_input"] = subm_block_bricks(
        params["conv_input"], state["conv_input"], bricks[1], _K3, tables[1], **bn
    )
    x_conv1_b, ns["conv1"] = subm_block_bricks(
        params["conv1"], state["conv1"], y_b, _K3, tables[1], **bn
    )

    level_sites = {1: x}
    enc_bricks = {1: x_conv1_b}
    pair_maps = {}
    y = x.replace_feats(bricks_to_voxel_feats(x_conv1_b))
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        sites, prs, kis = strided_conv_sites(
            y, _K3, _S2, _P1, dims[stride], caps[lvl - 1], with_pairs=True
        )
        pair_maps[stride] = (prs, kis)
        y, ns[f"conv{lvl}_down"] = strided_block_pairs(
            params[f"conv{lvl}_down"], state[f"conv{lvl}_down"], y, sites, prs, kis, **bn
        )
        level_sites[stride] = sites
        bricks[stride] = build_bricks(y, max(256, caps[lvl - 1] // 4))
        tables[stride] = brick_neighbor_table(bricks[stride], _K3)
        y_b, ns[f"conv{lvl}_a"] = subm_block_bricks(
            params[f"conv{lvl}_a"], state[f"conv{lvl}_a"], bricks[stride], _K3,
            tables[stride], **bn,
        )
        y_b, ns[f"conv{lvl}_b"] = subm_block_bricks(
            params[f"conv{lvl}_b"], state[f"conv{lvl}_b"], y_b, _K3,
            tables[stride], **bn,
        )
        enc_bricks[stride] = y_b
        y = sites.replace_feats(bricks_to_voxel_feats(y_b))

    # conv_out: z-only stride-2 -> encoded tensor (stride 8 in xy, 16 in z)
    dims_out = (dims[8][0], dims[8][1], (dims[8][2] - _KZ[2]) // _SZ[2] + 1)
    sites_out, prs_out, kis_out = strided_conv_sites(
        y, _KZ, _SZ, _PZ, dims_out, caps[4], with_pairs=True
    )
    encoded, ns["conv_out"] = strided_block_pairs(
        params["conv_out"], state["conv_out"], y, sites_out, prs_out, kis_out, **bn
    )

    # ---------------- detection branch on the dense BEV ----------------
    bev = to_dense_bev(encoded)  # (Y/8, X/8, C*Z)
    boxes_world, box_valid = boxes_fn(bev)

    # ---------------- decoder with instance fusion ---------------------
    from ..sparse.convs import inverse_conv_pairs

    sparse_inv = inverse_conv_pairs(
        encoded, params["inv_conv_out"]["conv"]["w"], level_sites[8].sites(),
        prs_out, kis_out,
    )

    # boxes in per-level grid units (spconv_unet.py:325-331); yaw is scale-
    # invariant because x/y voxel sizes are equal.
    vs = jnp.asarray(cfg.data.voxel_size)
    lo = jnp.asarray(cfg.data.point_cloud_range[:3])

    def to_grid(b7, stride):
        ctr = (b7[:, 0:3] - lo[None]) / (vs[None] * stride)
        dms = b7[:, 3:6] / (vs[None] * stride)
        return jnp.concatenate([ctr, dms, b7[:, 6:8]], axis=-1)

    nc = mc.head.num_class

    def fuse(level_feats_b, base_bricks, level_sparse, stride, fuse_name):
        """instance one-hot on this level's sites -> concat -> subm conv."""
        inst = _instance_feats(
            level_sparse, to_grid(boxes_world, stride), box_valid, nc
        )
        inst_b = voxel_feats_to_bricks(base_bricks, inst)
        cat = level_feats_b.replace_feats(
            jnp.concatenate([level_feats_b.feats, inst_b.feats], -1)
        )
        out, ns[fuse_name] = subm_block_bricks(
            params[fuse_name], state[fuse_name], cat, _K3,
            tables[stride_key(stride)], **bn,
        )
        return out, inst_b

    def stride_key(s):
        return s

    inv_b = voxel_feats_to_bricks(bricks[8], sparse_inv.masked_feats())
    lvl_sparse8 = level_sites[8].replace_feats(sparse_inv.feats)
    y_b, _ = fuse(inv_b, bricks[8], lvl_sparse8, 8, "fuse4")
    x_up4 = _ur_block_bricks(
        params, state, ns, ("up_t4", "up_m4", "inv4"), y_b, y_b, tables[8],
        level_sites[8], level_sites[4].sites(), pair_maps[8], train=train,
    )

    up4_b = voxel_feats_to_bricks(bricks[4], x_up4.masked_feats())
    y_b, _ = fuse(up4_b, bricks[4], level_sites[4].replace_feats(x_up4.feats), 4, "fuse3")
    x_up3 = _ur_block_bricks(
        params, state, ns, ("up_t3", "up_m3", "inv3"), enc_bricks[4], y_b, tables[4],
        level_sites[4], level_sites[2].sites(), pair_maps[4], train=train,
    )

    up3_b = voxel_feats_to_bricks(bricks[2], x_up3.masked_feats())
    y_b, _ = fuse(up3_b, bricks[2], level_sites[2].replace_feats(x_up3.feats), 2, "fuse2")
    x_up2 = _ur_block_bricks(
        params, state, ns, ("up_t2", "up_m2", "inv2"), enc_bricks[2], y_b, tables[2],
        level_sites[2], level_sites[1].sites(), pair_maps[2], train=train,
    )

    up2_b = voxel_feats_to_bricks(bricks[1], x_up2.masked_feats())
    y_b, inst1_b = fuse(up2_b, bricks[1], level_sites[1].replace_feats(x_up2.feats), 1, "fuse1")
    x_up1_b = _ur_block_bricks(
        params, state, ns, ("up_t1", "up_m1", "up_out"), enc_bricks[1], y_b, tables[1],
        level_sites[1], None, train=train, last=True,
    )

    # final fusion reuses the stride-1 instance features (spconv_unet.py:401)
    cat = x_up1_b.replace_feats(jnp.concatenate([x_up1_b.feats, inst1_b.feats], -1))
    y_b, ns["fuse1_final"] = subm_block_bricks(
        params["fuse1_final"], state["fuse1_final"], cat, _K3, tables[1], **bn
    )

    from .layers import mm
    logits_b = mm(y_b.feats, params["mos_head"]["w"]) + params["mos_head"]["b"]
    logits_b = logits_b * y_b.occ[..., None]
    mos_logits = bricks_to_voxel_feats(y_b.replace_feats(logits_b))
    return mos_logits, bev, ns
