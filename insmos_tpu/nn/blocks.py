"""Sparse network building blocks (conv+BN+ReLU combos, residual block).

These cover the composite layers of both reference backbones:
- post_act_block subm/spconv/inverseconv variants (spconv_unet.py:240-264)
- SparseBasicBlock (spconv_unet.py:71-106) and the MinkowskiEngine
  BasicBlock used by MinkUNet (3^D kernel, optional 1x1 downsample).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..sparse import SparseTensor, inverse_conv, strided_conv_sites, subm_gather_conv
from ..sparse.convs import inverse_conv_pairs, strided_conv, strided_conv_pairs
from .layers import batch_norm, init_bn, init_sparse_conv, mm, relu


def _kvol(kernel):
    return math.prod(kernel)


# ------------------------------------------------------ conv + bn + relu
def init_conv_bn(key, kernel, cin, cout):
    p = init_sparse_conv(key, _kvol(kernel), cin, cout)
    bn_p, bn_s = init_bn(cout)
    return {"conv": p, "bn": bn_p}, {"bn": bn_s}


def subm_block(p, s, x: SparseTensor, kernel, *, train, bn_args, chunk=None, table=None):
    y = subm_gather_conv(x, p["conv"]["w"], kernel, chunk=chunk, table=table)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.valid, **bn_args)
    return y.replace_feats(relu(f)), {"bn": bn_s}


def strided_block(p, s, x: SparseTensor, kernel, stride, pad, out_sites, *, train, bn_args, chunk=None):
    y = strided_conv(x, p["conv"]["w"], kernel, stride, pad, out_sites, chunk=chunk)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.valid, **bn_args)
    return y.replace_feats(relu(f)), {"bn": bn_s}


def inverse_block(p, s, x: SparseTensor, kernel, stride, pad, fine_sites, *, train, bn_args, chunk=None):
    y = inverse_conv(x, p["conv"]["w"], kernel, stride, pad, fine_sites, chunk=chunk)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.valid, **bn_args)
    return y.replace_feats(relu(f)), {"bn": bn_s}


# -------------------------------------------------------- residual blocks
def init_basic_block(key, kernel, cin, cout, downsample: bool):
    """Residual block: subm-conv/BN/ReLU/subm-conv/BN + identity, ReLU.

    downsample: 1x1 conv + BN on the identity path when cin != cout
    (MinkowskiEngine _make_layer; the spconv SparseBasicBlock never needs it).
    """
    keys = jax.random.split(key, 3)
    p1 = init_sparse_conv(keys[0], _kvol(kernel), cin, cout)
    p2 = init_sparse_conv(keys[1], _kvol(kernel), cout, cout)
    bn1_p, bn1_s = init_bn(cout)
    bn2_p, bn2_s = init_bn(cout)
    params = {"conv1": p1, "bn1": bn1_p, "conv2": p2, "bn2": bn2_p}
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if downsample:
        params["down"] = init_sparse_conv(keys[2], 1, cin, cout)
        dbn_p, dbn_s = init_bn(cout)
        params["down_bn"] = dbn_p
        state["down_bn"] = dbn_s
    return params, state


def basic_block(p, s, x: SparseTensor, kernel, *, train, bn_args, chunk=None, table=None):
    ns = {}
    if table is None:
        from ..sparse import neighbor_table

        table = neighbor_table(x, kernel, chunk=chunk)
    y = subm_gather_conv(x, p["conv1"]["w"], kernel, chunk=chunk, table=table)
    f, ns["bn1"] = batch_norm(p["bn1"], s["bn1"], y.feats, train=train, mask=y.valid, **bn_args)
    y = y.replace_feats(relu(f))
    y = subm_gather_conv(y, p["conv2"]["w"], kernel, chunk=chunk, table=table)
    f, ns["bn2"] = batch_norm(p["bn2"], s["bn2"], y.feats, train=train, mask=y.valid, **bn_args)

    if "down" in p:
        idt = mm(x.feats, p["down"]["w"][0])
        idt, ns["down_bn"] = batch_norm(
            p["down_bn"], s["down_bn"], idt, train=train, mask=x.valid, **bn_args
        )
    else:
        idt = x.feats
    return y.replace_feats(relu(f + idt)), ns


def strided_block_pairs(p, s, x, out_sites, pairs, kidx, *, train, bn_args):
    """Strided conv + BN + ReLU via derivation pairs (lookup-free)."""
    y = strided_conv_pairs(x, p["conv"]["w"], out_sites, pairs, kidx)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.valid, **bn_args)
    return y.replace_feats(relu(f)), {"bn": bn_s}


def inverse_block_pairs(p, s, coarse, fine_sites, pairs, kidx, *, train, bn_args):
    """Inverse conv + BN + ReLU via the recorded forward pairs."""
    y = inverse_conv_pairs(coarse, p["conv"]["w"], fine_sites, pairs, kidx)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.valid, **bn_args)
    return y.replace_feats(relu(f)), {"bn": bn_s}
