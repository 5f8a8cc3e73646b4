"""Slab-space network blocks (see sparse/slab.py).

BatchNorm statistics run over occupied (site, t) slots only — exactly the
rows the reference's BatchNorm1d sees; activations are re-masked so
non-occupied slots stay zero (the engine invariant).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sparse.slab import Slab, WindowTables, inverse_s2k2_conv, window_conv
from .layers import batch_norm, mm, relu


def _bn_slab(p, s, y: Slab, *, train, bn_args):
    C = y.num_features
    V = y.capacity
    f, ns = batch_norm(
        p, s, y.feats.reshape(V * y.T, C),
        train=train, mask=y.occ_flat(), **bn_args,
    )
    return f.reshape(V, y.T * C), ns


def subm_block_slab(p, s, x: Slab, kernel, tbl: WindowTables, out: Slab | None = None,
                    *, train, bn_args, chunk=None):
    """conv + BN + ReLU. With `out`/strided tables this is the strided
    variant (post_act_block 'spconv'); otherwise submanifold."""
    y = window_conv(x, p["conv"]["w"], tbl, out if out is not None else x, kernel, chunk=chunk)
    f, bn_s = _bn_slab(p["bn"], s["bn"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(relu(f))
    return y.replace_feats(y.mask_feats()), {"bn": bn_s}


def inverse_block_slab(p, s, coarse: Slab, fine: Slab, parent_idx, *, train, bn_args):
    """Stride-2 kernel-2 inverse conv + BN + ReLU (ME transpose conv)."""
    y = inverse_s2k2_conv(coarse, p["conv"]["w"], fine, parent_idx)
    f, bn_s = _bn_slab(p["bn"], s["bn"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(relu(f))
    return y.replace_feats(y.mask_feats()), {"bn": bn_s}


def basic_block_slab(p, s, x: Slab, kernel, tbl: WindowTables, *, train, bn_args, chunk=None):
    """Residual block (MinkowskiEngine BasicBlock / spconv SparseBasicBlock)."""
    ns = {}
    y = window_conv(x, p["conv1"]["w"], tbl, x, kernel, chunk=chunk)
    f, ns["bn1"] = _bn_slab(p["bn1"], s["bn1"], y, train=train, bn_args=bn_args)
    y = y.replace_feats(y.mask_feats(relu(f)))
    y = window_conv(y, p["conv2"]["w"], tbl, y, kernel, chunk=chunk)
    f, ns["bn2"] = _bn_slab(p["bn2"], s["bn2"], y, train=train, bn_args=bn_args)

    if "down" in p:
        cin = x.num_features
        idt = mm(x.feats.reshape(-1, cin), p["down"]["w"][0])
        idt, ns["down_bn"] = batch_norm(
            p["down_bn"], s["down_bn"], idt,
            train=train, mask=x.occ_flat(), **bn_args,
        )
        idt = idt.reshape(x.capacity, -1)
    else:
        idt = x.feats
    out = y.replace_feats(relu(f.reshape(idt.shape) + idt))
    return out.replace_feats(out.mask_feats()), ns


def cat_slab(a: Slab, b: Slab) -> Slab:
    """Channel concat of two slabs on the same site set (ME.cat): interleave
    per-t features so layout stays (V, T*(Ca+Cb))."""
    V, T = a.capacity, a.T
    ca, cb = a.num_features, b.num_features
    fa = a.feats.reshape(V, T, ca)
    fb = b.feats.reshape(V, T, cb)
    return a.replace_feats(jnp.concatenate([fa, fb], axis=-1).reshape(V, T * (ca + cb)))
