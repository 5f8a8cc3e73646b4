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
from .blocks import basic_block, init_basic_block, init_conv_bn, inverse_block, strided_block, subm_block
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


def _ur_block(params, state, ns, names, x_lateral, x_bottom, fine_sites, *, train, last=False, table=None):
    """UR_block_forward (spconv_unet.py:213-221): lateral residual fusion.

    t: SparseBasicBlock on the lateral; m: subm conv on concat(bottom, t);
    out = conv_inv(m + channel_reduction(concat)); conv_inv is an inverse
    conv to the finer site set, or a subm block at the last level. All subm
    convs here share one precomputed neighbor table for this level's sites.
    """
    t_name, m_name, inv_name = names
    bn = dict(bn_args=_BN, train=train)
    x_t, ns[t_name] = basic_block(
        params[t_name], state[t_name], x_lateral, _K3, table=table, **bn
    )
    cat = x_t.replace_feats(jnp.concatenate([x_bottom.feats, x_t.feats], -1))
    x_m, ns[m_name] = subm_block(
        params[m_name], state[m_name], cat, _K3, table=table, **bn
    )
    red = _channel_reduction(cat.feats, x_m.num_features)
    fused = x_m.replace_feats(x_m.feats + red)
    if last:
        out, ns[inv_name] = subm_block(
            params[inv_name], state[inv_name], fused, _K3, table=table, **bn
        )
    else:
        out, ns[inv_name] = inverse_block(
            params[inv_name], state[inv_name], fused, _K3, _S2, _P1, fine_sites, **bn
        )
    return out


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
    """Returns (mos voxel logits (V, 3), bev map, pred boxes, new_state).

    `boxes_fn` runs the detection branch (BEV backbone + CenterHead + NMS)
    on the dense BEV of the encoded tensor and returns world-frame boxes
    with a trailing 1-indexed class column. It is a callable so the
    detection head can live in its own module while fusion stays here.
    """
    mc = cfg.model
    gx, gy, gz = cfg.data.grid_size
    caps = mc.unet_capacities
    ns = {}
    bn = dict(bn_args=_BN, train=train)

    tables = {1: neighbor_table(x, _K3)}
    y, ns["conv_input"] = subm_block(
        params["conv_input"], state["conv_input"], x, _K3, table=tables[1], **bn
    )
    x_conv1, ns["conv1"] = subm_block(
        params["conv1"], state["conv1"], y, _K3, table=tables[1], **bn
    )

    cdiv = lambda a, b: -(-a // b)
    dims = {
        s: (cdiv(gx, s), cdiv(gy, s), cdiv(gz, s)) for s in (1, 2, 4, 8)
    }
    feats_by_level = {1: x_conv1}
    y = x_conv1
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        sites = strided_conv_sites(y, _K3, _S2, _P1, dims[stride], caps[lvl - 1])
        y, ns[f"conv{lvl}_down"] = strided_block(
            params[f"conv{lvl}_down"], state[f"conv{lvl}_down"], y, _K3, _S2, _P1, sites, **bn
        )
        tables[stride] = neighbor_table(y, _K3)
        y, ns[f"conv{lvl}_a"] = subm_block(
            params[f"conv{lvl}_a"], state[f"conv{lvl}_a"], y, _K3, table=tables[stride], **bn
        )
        y, ns[f"conv{lvl}_b"] = subm_block(
            params[f"conv{lvl}_b"], state[f"conv{lvl}_b"], y, _K3, table=tables[stride], **bn
        )
        feats_by_level[stride] = y

    # conv_out: z-only stride-2 -> encoded tensor (stride 8 in xy, 16 in z)
    dims_out = (dims[8][0], dims[8][1], (dims[8][2] - _KZ[2]) // _SZ[2] + 1)
    sites_out = strided_conv_sites(y, _KZ, _SZ, _PZ, dims_out, caps[4])
    encoded, ns["conv_out"] = strided_block(
        params["conv_out"], state["conv_out"], y, _KZ, _SZ, _PZ, sites_out, **bn
    )

    # ---------------- detection branch on the dense BEV ----------------
    bev = to_dense_bev(encoded)  # (Y/8, X/8, C*Z)
    boxes_world, box_valid = boxes_fn(bev)

    # ---------------- decoder with instance fusion ---------------------
    sparse_inv = inverse_conv(
        encoded, params["inv_conv_out"]["conv"]["w"], _KZ, _SZ, _PZ,
        feats_by_level[8].sites(),
    )

    # boxes in stride-8 grid units (spconv_unet.py:325-331); yaw is scale-
    # invariant because x/y voxel sizes are equal.
    vs = jnp.asarray(cfg.data.voxel_size)
    lo = jnp.asarray(cfg.data.point_cloud_range[:3])
    def to_grid(b, stride):
        ctr = (b[:, 0:3] - lo[None]) / (vs[None] * stride)
        dms = b[:, 3:6] / (vs[None] * stride)
        return jnp.concatenate([ctr, dms, b[:, 6:8]], axis=-1)

    nc = mc.head.num_class
    boxes8 = to_grid(boxes_world, 8)
    inst = _instance_feats(sparse_inv, boxes8, box_valid, nc)
    cat = sparse_inv.replace_feats(jnp.concatenate([sparse_inv.feats, inst], -1))
    y, ns["fuse4"] = subm_block(
        params["fuse4"], state["fuse4"], cat, _K3, table=tables[8], **bn
    )
    x_up4 = _ur_block(
        params, state, ns, ("up_t4", "up_m4", "inv4"), y, y,
        feats_by_level[4].sites(), train=train, table=tables[8],
    )

    boxes4 = to_grid(boxes_world, 4)
    inst = _instance_feats(x_up4, boxes4, box_valid, nc)
    cat = x_up4.replace_feats(jnp.concatenate([x_up4.feats, inst], -1))
    y, ns["fuse3"] = subm_block(
        params["fuse3"], state["fuse3"], cat, _K3, table=tables[4], **bn
    )
    x_up3 = _ur_block(
        params, state, ns, ("up_t3", "up_m3", "inv3"), feats_by_level[4], y,
        feats_by_level[2].sites(), train=train, table=tables[4],
    )

    boxes2 = to_grid(boxes_world, 2)
    inst = _instance_feats(x_up3, boxes2, box_valid, nc)
    cat = x_up3.replace_feats(jnp.concatenate([x_up3.feats, inst], -1))
    y, ns["fuse2"] = subm_block(
        params["fuse2"], state["fuse2"], cat, _K3, table=tables[2], **bn
    )
    x_up2 = _ur_block(
        params, state, ns, ("up_t2", "up_m2", "inv2"), feats_by_level[2], y,
        feats_by_level[1].sites(), train=train, table=tables[2],
    )

    boxes1 = to_grid(boxes_world, 1)
    inst1 = _instance_feats(x_up2, boxes1, box_valid, nc)
    cat = x_up2.replace_feats(jnp.concatenate([x_up2.feats, inst1], -1))
    y, ns["fuse1"] = subm_block(
        params["fuse1"], state["fuse1"], cat, _K3, table=tables[1], **bn
    )
    x_up1 = _ur_block(
        params, state, ns, ("up_t1", "up_m1", "up_out"), feats_by_level[1], y,
        None, train=train, last=True, table=tables[1],
    )

    # final fusion reuses the stride-1 instance features (spconv_unet.py:401)
    cat = x_up1.replace_feats(jnp.concatenate([x_up1.feats, inst1], -1))
    y, ns["fuse1_final"] = subm_block(
        params["fuse1_final"], state["fuse1_final"], cat, _K3, table=tables[1], **bn
    )

    mos_logits = y.feats @ params["mos_head"]["w"] + params["mos_head"]["b"]
    mos_logits = jnp.where(y.valid[:, None], mos_logits, 0.0)
    return mos_logits, bev, ns
