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

Deviation from the reference (documented): the reference convolves the full
uncropped cloud; we bound coordinates to cfg.motionnet.crop_range (UNet
range + receptive-field margin) so everything is fixed-capacity. Points
outside the crop receive zero motion features; they are out of the 3D UNet's
range too, so final predictions are unaffected except via boundary halos.
The t axis is the scan slot (0..W-1): a pure translation of the reference's
-9..0 quantized timestamps, which conv offsets cannot observe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..sparse import (
    SparseTensor,
    devoxelize,
    neighbor_table,
    strided_conv_sites,
    unique_voxels,
)
from ..sparse.convs import strided_conv
from .blocks import (
    init_basic_block,
    init_conv_bn,
    init_sparse_conv,
    inverse_block_pairs,
    strided_block_pairs,
)
from .layers import init_linear

_BN = {"momentum": 0.1, "eps": 1e-5}  # MinkowskiEngine BatchNorm defaults

_K_STEM = (5, 5, 5, 1)
_K_DOWN = (2, 2, 2, 1)
_S_DOWN = (2, 2, 2, 1)
_P0 = (0, 0, 0, 0)
_K_BLOCK = (3, 3, 3, 3)


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


def _cat(a: SparseTensor, b: SparseTensor) -> SparseTensor:
    """Concatenate features of two tensors on the same site set (ME.cat)."""
    return a.replace_feats(jnp.concatenate([a.feats, b.feats], axis=-1))


def _level_dims(dims4, factor):
    cdiv = lambda a, b: -(-a // b)
    # x extent padded to a multiple of 16 (brick key arithmetic); padding
    # only enlarges key space — coordinates never occupy the pad cells
    x = cdiv(dims4[0], factor)
    return (
        cdiv(x, 16) * 16,
        cdiv(dims4[1], factor),
        cdiv(dims4[2], factor),
        dims4[3],
    )


def motionnet_forward(params, state, cfg: Config, points, point_valid, *, train: bool):
    """points: (W, P, 4+) pose-aligned window; point_valid: (W, P).

    Returns (motion_feats (W*P->P, C) for the CURRENT scan slot,
    per-point motion feats for ALL points (W, P, C), new_state).

    All submanifold convs run in brick space (sparse/bricks.py): build the
    brick layout + neighbour table once per level, then every conv is
    halo-row fetches + static shifts + matmuls. Strided and inverse convs
    cross levels through the canonical sorted-voxel form.
    """
    from ..sparse.bricks import (
        bricks_to_voxel_feats,
        brick_neighbor_table,
        build_bricks,
        voxel_feats_to_bricks,
    )
    from .blocks_bricks import basic_block_bricks, subm_block_bricks

    mc = cfg.model.motionnet
    W, P = points.shape[:2]
    chunk = cfg.runtime.conv_chunk
    brick_chunk = max(1, chunk // 16)
    gx, gy, gz = mc.grid_size
    dims4 = (gx, gy, gz, W)
    caps = mc.capacities

    lo = jnp.asarray(mc.crop_range[:3], points.dtype)
    xyz = points[..., :3].reshape(W * P, 3)
    vox = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)  # 0.1 m voxels
    t = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(W * P, 1)
    coords4 = jnp.concatenate([vox, t], axis=-1)

    sites1, p2v, _, _ = unique_voxels(
        coords4, dims4, caps[0], point_valid.reshape(W * P), first_occurrence_cap=False
    )
    x = sites1.replace_feats(
        jnp.full((caps[0], 1), 0.5, jnp.float32) * sites1.valid[:, None]
    )

    ns = {}
    bn = dict(bn_args=_BN, train=train)
    bbn = dict(bn_args=_BN, train=train, chunk=brick_chunk)

    # ---------------- L1: stem (and later block8) in brick space ----------
    b1 = build_bricks(x, max(256, caps[0] // 4))
    tbl1_stem = brick_neighbor_table(b1, _K_STEM)
    out_p1_b, ns["stem"] = subm_block_bricks(
        params["stem"], state["stem"], b1, _K_STEM, tbl1_stem, **bbn
    )
    out_p1 = sites1.replace_feats(bricks_to_voxel_feats(out_p1_b))

    # ---------------- encoder: paired strided downs + brick blocks --------
    d2 = _level_dims(dims4, 2)
    s2, pr2, ki2 = strided_conv_sites(
        out_p1, _K_DOWN, _S_DOWN, _P0, d2, caps[1], with_pairs=True
    )
    y, ns["down1"] = strided_block_pairs(
        params["down1"], state["down1"], out_p1, s2, pr2, ki2, **bn
    )
    b2 = build_bricks(y, max(256, caps[1] // 4))
    tbl2 = brick_neighbor_table(b2, _K_BLOCK)
    out_b1_b, ns["block1"] = basic_block_bricks(
        params["block1"], state["block1"], b2, _K_BLOCK, tbl2, **bbn
    )
    out_b1 = s2.replace_feats(bricks_to_voxel_feats(out_b1_b))

    d4 = _level_dims(dims4, 4)
    s4, pr4, ki4 = strided_conv_sites(
        out_b1, _K_DOWN, _S_DOWN, _P0, d4, caps[2], with_pairs=True
    )
    y, ns["down2"] = strided_block_pairs(
        params["down2"], state["down2"], out_b1, s4, pr4, ki4, **bn
    )
    b4 = build_bricks(y, max(256, caps[2] // 4))
    tbl4 = brick_neighbor_table(b4, _K_BLOCK)
    out_b2_b, ns["block2"] = basic_block_bricks(
        params["block2"], state["block2"], b4, _K_BLOCK, tbl4, **bbn
    )
    out_b2 = s4.replace_feats(bricks_to_voxel_feats(out_b2_b))

    d8 = _level_dims(dims4, 8)
    s8, pr8, ki8 = strided_conv_sites(
        out_b2, _K_DOWN, _S_DOWN, _P0, d8, caps[3], with_pairs=True
    )
    y, ns["down3"] = strided_block_pairs(
        params["down3"], state["down3"], out_b2, s8, pr8, ki8, **bn
    )
    b8 = build_bricks(y, max(256, caps[3] // 4))
    tbl8 = brick_neighbor_table(b8, _K_BLOCK)
    y8_b, ns["block3"] = basic_block_bricks(
        params["block3"], state["block3"], b8, _K_BLOCK, tbl8, **bbn
    )
    y8 = s8.replace_feats(bricks_to_voxel_feats(y8_b))

    # ---------------- decoder: inverse (sparse) + cat + blocks (bricks) ---
    y, ns["up5"] = inverse_block_pairs(
        params["up5"], state["up5"], y8, out_b2.sites(), pr8, ki8, **bn
    )
    cat4 = voxel_feats_to_bricks(b4, y.feats)
    cat4 = cat4.replace_feats(
        jnp.concatenate([cat4.feats, out_b2_b.feats], axis=-1)
    )
    y_b, ns["block6"] = basic_block_bricks(
        params["block6"], state["block6"], cat4, _K_BLOCK, tbl4, **bbn
    )
    y = s4.replace_feats(bricks_to_voxel_feats(y_b))

    y, ns["up6"] = inverse_block_pairs(
        params["up6"], state["up6"], y, out_b1.sites(), pr4, ki4, **bn
    )
    cat2 = voxel_feats_to_bricks(b2, y.feats)
    cat2 = cat2.replace_feats(
        jnp.concatenate([cat2.feats, out_b1_b.feats], axis=-1)
    )
    y_b, ns["block7"] = basic_block_bricks(
        params["block7"], state["block7"], cat2, _K_BLOCK, tbl2, **bbn
    )
    y = s2.replace_feats(bricks_to_voxel_feats(y_b))

    y, ns["up7"] = inverse_block_pairs(
        params["up7"], state["up7"], y, out_p1.sites(), pr2, ki2, **bn
    )
    cat1 = voxel_feats_to_bricks(b1, y.feats)
    cat1 = cat1.replace_feats(
        jnp.concatenate([cat1.feats, out_p1_b.feats], axis=-1)
    )
    tbl1_block = brick_neighbor_table(b1, _K_BLOCK)
    y_b, ns["block8"] = basic_block_bricks(
        params["block8"], state["block8"], cat1, _K_BLOCK, tbl1_block, **bbn
    )

    from .layers import mm
    logits_b = mm(y_b.feats, params["final"]["w"]) + params["final"]["b"]
    logits_b = logits_b * y_b.occ[..., None]
    logits = bricks_to_voxel_feats(y_b.replace_feats(logits_b))
    per_point = devoxelize(logits, p2v).reshape(W, P, -1)
    return per_point[W - 1], per_point, ns
