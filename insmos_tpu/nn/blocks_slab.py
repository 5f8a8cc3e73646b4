"""Slab-space network blocks (see sparse/slab.py).

BatchNorm statistics run over occupied (site, t) slots only — exactly the
rows the reference's BatchNorm1d sees; activations are re-masked so
non-occupied slots stay zero (the engine invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.slab import Slab, WindowTables, inverse_s2k2_conv, slice_slots
from .layers import mm, relu


def _bn_slab(p, s, y: Slab, *, train, bn_args):
    """BatchNorm over occupied (site, t) rows, FLAT on (V, T*C).

    Relies on the engine invariant that non-occupied slots hold exact
    zeros, so per-channel sums need no mask; the count is the occupancy
    count (identical for every channel). Statistics match torch
    BatchNorm1d over the real voxel rows (biased batch var, running var
    unbiased). The (V*T, C) reshape the naive version used would relayout
    into a tiny-trailing-dim form padded 16x by the tiler (PERF.md).
    """
    C = y.num_features
    T = y.T
    f = y.feats  # (V, T*C), zeros at non-occupied slots
    momentum, eps = bn_args["momentum"], bn_args["eps"]
    if train:
        n = jnp.clip(
            jnp.sum((y.occ & y.valid[:, None]).astype(jnp.float32)), 1.0, None
        )
        s1 = f.sum(axis=0).reshape(T, C).sum(axis=0)
        s2 = (f * f).sum(axis=0).reshape(T, C).sum(axis=0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        unbiased = var * n / jnp.clip(n - 1.0, 1.0, None)
        ns = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        ns = s
    scale = p["scale"] * jax.lax.rsqrt(var + eps)  # (C,)
    bias = p["bias"] - mean * scale
    out = f * jnp.tile(scale, T)[None] + jnp.tile(bias, T)[None]
    return out, ns


def subm_block_slab(p, s, x: Slab, kernel, tbl: WindowTables, out: Slab | None = None,
                    *, train, bn_args, chunk=None, with_occ=False):
    """conv + BN + ReLU. With `out`/strided tables this is the strided
    variant (post_act_block 'spconv'); otherwise submanifold. `tbl` is a
    WindowTables or span_conv.SpanPlan (both expose .conv). with_occ folds
    occupancy propagation into the conv pass (span strided convs)."""
    if with_occ:
        y = tbl.conv_with_occ(x, p["conv"]["w"], out, kernel)
    else:
        y = tbl.conv(x, p["conv"]["w"], out if out is not None else x, kernel, chunk=chunk)
    f, bn_s = _bn_slab(p["bn"], s["bn"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(relu(f))
    return y.replace_feats(y.mask_feats()), {"bn": bn_s}


def basic_block_slab_pruned(p, s, x: Slab, kernel, tbl, mid: Slab, out: Slab,
                            *, train, bn_args, t_off1=0, t_off2=0, chunk=None):
    """Residual block over a TRAILING slot window (t-pruned inference):
    conv1 maps x's slots to `mid`'s (offset t_off1), conv2 to `out`'s
    (offset t_off2); the identity path is the matching slot slice of x.
    Exact vs basic_block_slab on the shared slots (tests/test_slab.py) —
    only the current scan's output is consumed downstream
    (models/models.py:322-324), so the leading slots are dead compute."""
    ns = {}
    y = tbl.conv(x, p["conv1"]["w"], mid, kernel, chunk=chunk, t0_off=t_off1)
    f, ns["bn1"] = _bn_slab(p["bn1"], s["bn1"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(y.mask_feats(relu(f)))
    y = tbl.conv(y, p["conv2"]["w"], out, kernel, chunk=chunk, t0_off=t_off2)
    f, ns["bn2"] = _bn_slab(p["bn2"], s["bn2"], y, train=train, bn_args=bn_args)

    idt_in = slice_slots(x, t_off1 + t_off2, out.T)
    if "down" in p:
        w_dn = p["down"]["w"][0]
        idt = mm(idt_in.feats, jnp.kron(jnp.eye(out.T, dtype=w_dn.dtype), w_dn))
        idt, ns["down_bn"] = _bn_slab(
            p["down_bn"], s["down_bn"], idt_in.replace_feats(idt),
            train=train, bn_args=bn_args,
        )
    else:
        idt = idt_in.feats
    res = y.replace_feats(relu(f + idt))
    return res.replace_feats(res.mask_feats()), ns


def basic_block_slab_cat(p, s, a: Slab, b: Slab, kernel, tbl, mid: Slab,
                         out: Slab, *, train, bn_args, t_off1=0, t_off2=0):
    """basic_block_slab_pruned over the channel-concat of (a, b) WITHOUT
    materializing the interleaved cat (span engine only): conv1 and the
    1x1 identity downsample split their weights by input channel
    (conv(cat(a, b), W) == conv(a, W[:Ca]) + conv(b, W[Ca:])). Numerically
    identical to cat_slab + basic_block_slab_pruned (tests/test_span_conv);
    avoids cat_slab's per-t narrow-lane relayouts (~42 ms at L4 —
    tools/profile_motion_convs)."""
    ns = {}
    ca = a.num_features
    y = tbl.conv_cat(a, b, p["conv1"]["w"], mid, kernel, t0_off=t_off1)
    f, ns["bn1"] = _bn_slab(p["bn1"], s["bn1"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(y.mask_feats(relu(f)))
    y = tbl.conv(y, p["conv2"]["w"], out, kernel, t0_off=t_off2)
    f, ns["bn2"] = _bn_slab(p["bn2"], s["bn2"], y, train=train, bn_args=bn_args)

    ia = slice_slots(a, t_off1 + t_off2, out.T)
    ib = slice_slots(b, t_off1 + t_off2, out.T)
    w_dn = p["down"]["w"][0]
    eye = jnp.eye(out.T, dtype=w_dn.dtype)
    idt = mm(ia.feats, jnp.kron(eye, w_dn[:ca])) + mm(
        ib.feats, jnp.kron(eye, w_dn[ca:])
    )
    idt, ns["down_bn"] = _bn_slab(
        p["down_bn"], s["down_bn"], ia.replace_feats(idt),
        train=train, bn_args=bn_args,
    )
    res = y.replace_feats(relu(f + idt))
    return res.replace_feats(res.mask_feats()), ns


def inverse_block_slab(p, s, coarse: Slab, fine: Slab, parent_idx, *, train, bn_args):
    """Stride-2 kernel-2 inverse conv + BN + ReLU (ME transpose conv)."""
    y = inverse_s2k2_conv(coarse, p["conv"]["w"], fine, parent_idx)
    f, bn_s = _bn_slab(p["bn"], s["bn"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(relu(f))
    return y.replace_feats(y.mask_feats()), {"bn": bn_s}


def basic_block_slab(p, s, x: Slab, kernel, tbl: WindowTables, *, train, bn_args, chunk=None):
    """Residual block (MinkowskiEngine BasicBlock / spconv SparseBasicBlock)."""
    ns = {}
    y = tbl.conv(x, p["conv1"]["w"], x, kernel, chunk=chunk)
    f, ns["bn1"] = _bn_slab(p["bn1"], s["bn1"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(y.mask_feats(relu(f)))
    y = tbl.conv(y, p["conv2"]["w"], y, kernel, chunk=chunk)
    f, ns["bn2"] = _bn_slab(p["bn2"], s["bn2"], y, train=train, bn_args=bn_args)

    if "down" in p:
        # 1x1 downsample, flat: per-t weight = block-diagonal kron
        w_dn = p["down"]["w"][0]
        idt = mm(x.feats, jnp.kron(jnp.eye(x.T, dtype=w_dn.dtype), w_dn))
        idt, ns["down_bn"] = _bn_slab(
            p["down_bn"], s["down_bn"], x.replace_feats(idt),
            train=train, bn_args=bn_args,
        )
    else:
        idt = x.feats
    out = y.replace_feats(relu(f + idt))
    return out.replace_feats(out.mask_feats()), ns


def cat_slab(a: Slab, b: Slab) -> Slab:
    """Channel concat of two slabs on the same site set (ME.cat): interleave
    per-t column blocks so layout stays (V, T*(Ca+Cb)) — flat 2D slices,
    no (V, T, C) materialization."""
    T = a.T
    ca, cb = a.num_features, b.num_features
    cols = []
    for t in range(T):
        cols.append(a.feats[:, t * ca : (t + 1) * ca])
        cols.append(b.feats[:, t * cb : (t + 1) * cb])
    return a.replace_feats(jnp.concatenate(cols, axis=-1))
