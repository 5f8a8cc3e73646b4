"""Dense 2D BEV backbone (reference models/backbones_2d/base_bev_backbone.py
with the config of config.yaml:112-119: one level of 1 + 5 3x3/128 convs
stride 1, then a x2 ConvTranspose to 256 channels). NHWC, plain XLA convs —
these map directly onto the MXU."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from .layers import batch_norm, conv2d, conv2d_transpose, init_bn, init_conv2d, relu

def _bn_of(cfg):
    return {
        "momentum": min(1.0, 0.01 * cfg.train.bn_momentum_scale),
        "eps": 1e-3,
    }


def init_bev_backbone(key, cfg: Config):
    b = cfg.model.bev
    cin = b.num_bev_features
    params, state = {"blocks": [], "deblocks": []}, {"blocks": [], "deblocks": []}
    ks = iter(jax.random.split(key, 64))
    for lvl in range(len(b.layer_nums)):
        convs, bns = [], []
        c_in = cin if lvl == 0 else b.num_filters[lvl - 1]
        for k in range(b.layer_nums[lvl] + 1):
            c_src = c_in if k == 0 else b.num_filters[lvl]
            convs.append(init_conv2d(next(ks), 3, 3, c_src, b.num_filters[lvl]))
            bns.append(init_bn(b.num_filters[lvl]))
        params["blocks"].append(
            {"convs": convs, "bns": [p for p, _ in bns]}
        )
        state["blocks"].append({"bns": [s for _, s in bns]})
        up_p = init_conv2d(
            next(ks), b.upsample_strides[lvl], b.upsample_strides[lvl],
            b.num_filters[lvl], b.num_upsample_filters[lvl],
        )
        up_bn_p, up_bn_s = init_bn(b.num_upsample_filters[lvl])
        params["deblocks"].append({"conv": up_p, "bn": up_bn_p})
        state["deblocks"].append({"bn": up_bn_s})
    return params, state


def bev_backbone_forward(params, state, cfg: Config, bev, *, train: bool):
    """bev: (H, W, C) -> (H*up, W*up, C_up); returns (y, new_state)."""
    b = cfg.model.bev
    ns = {"blocks": [], "deblocks": []}
    ups = []
    x = bev
    for lvl in range(len(b.layer_nums)):
        blk_p = params["blocks"][lvl]
        blk_s = state["blocks"][lvl]
        new_bns = []
        for k, (cp, bp, bs) in enumerate(
            zip(blk_p["convs"], blk_p["bns"], blk_s["bns"])
        ):
            stride = b.layer_strides[lvl] if k == 0 else 1
            x = conv2d(cp, x, stride=stride, padding="SAME")
            x, s2 = batch_norm(bp, bs, x, train=train, **_bn_of(cfg))
            x = relu(x)
            new_bns.append(s2)
        ns["blocks"].append({"bns": new_bns})
        dp = params["deblocks"][lvl]
        dstate = state["deblocks"][lvl]
        u = conv2d_transpose(dp["conv"], x, stride=b.upsample_strides[lvl])
        u, s2 = batch_norm(dp["bn"], dstate["bn"], u, train=train, **_bn_of(cfg))
        ups.append(relu(u))
        ns["deblocks"].append({"bn": s2})
    y = ups[0] if len(ups) == 1 else jnp.concatenate(ups, axis=-1)
    return y, ns
