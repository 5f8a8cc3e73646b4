"""Brick-space network blocks (fast path; see sparse/bricks.py).

Mirrors nn/blocks.py but operates on Bricks: BN statistics masked by slot
occupancy, activations re-masked so padding slots stay zero.
"""

from __future__ import annotations

from ..sparse.bricks import Bricks, subm_conv_bricks
from .layers import batch_norm, mm, relu


def subm_block_bricks(p, s, b: Bricks, kernel, table, *, train, bn_args, chunk=None):
    y = subm_conv_bricks(b, p["conv"]["w"], kernel, table, chunk=chunk)
    f, bn_s = batch_norm(p["bn"], s["bn"], y.feats, train=train, mask=y.occ, **bn_args)
    return y.replace_feats(relu(f) * y.occ[..., None]), {"bn": bn_s}


def basic_block_bricks(p, s, b: Bricks, kernel, table, *, train, bn_args, chunk=None):
    """Residual block in brick space (see nn/blocks.py basic_block)."""
    ns = {}
    y = subm_conv_bricks(b, p["conv1"]["w"], kernel, table, chunk=chunk)
    f, ns["bn1"] = batch_norm(p["bn1"], s["bn1"], y.feats, train=train, mask=y.occ, **bn_args)
    y = y.replace_feats(relu(f) * y.occ[..., None])
    y = subm_conv_bricks(y, p["conv2"]["w"], kernel, table, chunk=chunk)
    f, ns["bn2"] = batch_norm(p["bn2"], s["bn2"], y.feats, train=train, mask=y.occ, **bn_args)

    if "down" in p:
        idt = mm(b.feats, p["down"]["w"][0])
        idt, ns["down_bn"] = batch_norm(
            p["down_bn"], s["down_bn"], idt, train=train, mask=b.occ, **bn_args
        )
    else:
        idt = b.feats
    out = relu(f + idt) * y.occ[..., None]
    return y.replace_feats(out), ns
