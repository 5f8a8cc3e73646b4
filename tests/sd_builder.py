"""Synthetic reference-style state_dict builder (shared by the converter
round-trip test and the torch e2e oracle).

Key names and tensor layouts follow the reference checkpoints exactly
(spconv 2.x native (out, k0, k1, k2, in) with torch (z, y, x) kernel axes;
MinkowskiEngine (K, in, out); torch OIHW Conv2d; (in, out, kh, kw)
ConvTranspose2d) — see insmos_tpu/utils/convert.py for the derivations.
"""

from __future__ import annotations

import numpy as np


def make_synthetic_state_dict(cfg, params, seed: int = 0,
                              cls_bias: float | None = None) -> dict:
    """Reference-shaped random state_dict matching `params`' shapes.

    `cls_bias` overrides conv_cls.bias (e.g. +2.0 so sigmoid scores pass
    the 0.1 score gate and the detection/fusion path is exercised)."""
    sd = {}
    g = np.random.default_rng(seed)
    ch = cfg.model.unet_channels

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = g.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".bias"] = (0.1 * g.normal(size=c)).astype(np.float32)
        sd[prefix + ".running_mean"] = (
            0.1 * g.normal(size=c)
        ).astype(np.float32)
        sd[prefix + ".running_var"] = g.uniform(0.5, 2, c).astype(np.float32)

    def add_spconv(key, ours):
        K, cin, cout = np.asarray(ours).shape
        if K == 27:
            shape = (cout, 3, 3, 3, cin)
        elif K == 3:
            shape = (cout, 3, 1, 1, cin)  # z-only kernel in torch (z,y,x)
        else:
            raise AssertionError(K)
        # ~unit per-layer gain: keeps activations O(1) through the deep
        # stack so f32 e2e comparisons have meaningful tolerances
        sd[key] = (
            g.normal(size=shape) / np.sqrt(K * cin)
        ).astype(np.float32)

    U = "model.unet."
    u = params["unet"]
    add_spconv(U + "conv_input.0.weight", u["conv_input"]["conv"]["w"])
    add_bn(U + "conv_input.1", ch[0])
    add_spconv(U + "conv1.0.0.weight", u["conv1"]["conv"]["w"])
    add_bn(U + "conv1.0.1", ch[0])
    for lvl in (2, 3, 4):
        add_spconv(U + f"conv{lvl}.0.0.weight", u[f"conv{lvl}_down"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.0.1", ch[lvl - 1])
        add_spconv(U + f"conv{lvl}.1.0.weight", u[f"conv{lvl}_a"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.1.1", ch[lvl - 1])
        add_spconv(U + f"conv{lvl}.2.0.weight", u[f"conv{lvl}_b"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.2.1", ch[lvl - 1])
    add_spconv(U + "conv_out.0.weight", u["conv_out"]["conv"]["w"])
    add_bn(U + "conv_out.1", ch[3])
    add_spconv(U + "inv_conv_out.weight", u["inv_conv_out"]["conv"]["w"])
    for ours, theirs in {
        "fuse4": "conv_up_instance_block",
        "fuse3": "conv_up_instance_block_up4",
        "fuse2": "conv_up_instance_block_up3",
        "fuse1": "conv_up_instance_block_up2",
        "fuse1_final": "conv_up_instance_block_up1",
    }.items():
        add_spconv(U + theirs + ".0.weight", u[ours]["conv"]["w"])
        add_bn(U + theirs + ".1", u[ours]["bn"]["scale"].shape[0])
    for lvl in (4, 3, 2, 1):
        t = f"conv_up_t{lvl}"
        add_spconv(U + t + ".conv1.weight", u[f"up_t{lvl}"]["conv1"]["w"])
        add_spconv(U + t + ".conv2.weight", u[f"up_t{lvl}"]["conv2"]["w"])
        add_bn(U + t + ".bn1", u[f"up_t{lvl}"]["bn1"]["scale"].shape[0])
        add_bn(U + t + ".bn2", u[f"up_t{lvl}"]["bn2"]["scale"].shape[0])
        add_spconv(U + f"conv_up_m{lvl}.0.weight", u[f"up_m{lvl}"]["conv"]["w"])
        add_bn(U + f"conv_up_m{lvl}.1", u[f"up_m{lvl}"]["bn"]["scale"].shape[0])
    for name, ours in (
        ("inv_conv4", "inv4"), ("inv_conv3", "inv3"), ("inv_conv2", "inv2")
    ):
        add_spconv(U + name + ".0.weight", u[ours]["conv"]["w"])
        add_bn(U + name + ".1", u[ours]["bn"]["scale"].shape[0])
    add_spconv(U + "conv_up_out.0.0.weight", u["up_out"]["conv"]["w"])
    add_bn(U + "conv_up_out.0.1", ch[0])
    sd[U + "mos_seg_layer.weight"] = g.normal(size=(3, ch[0])).astype(np.float32)
    sd[U + "mos_seg_layer.bias"] = g.normal(size=3).astype(np.float32)

    B = "model.unet.bev_backbone."
    nf = cfg.model.bev.num_filters[0]
    torch_idx = [1] + [4 + 3 * i for i in range(cfg.model.bev.layer_nums[0])]
    cin = cfg.model.bev.num_bev_features
    for k, ti in enumerate(torch_idx):
        c_src = cin if k == 0 else nf
        sd[B + f"blocks.0.{ti}.weight"] = (
            g.normal(size=(nf, c_src, 3, 3)) / np.sqrt(9 * c_src)
        ).astype(np.float32)
        add_bn(B + f"blocks.0.{ti + 1}", nf)
    nuf = cfg.model.bev.num_upsample_filters[0]
    us = cfg.model.bev.upsample_strides[0]
    sd[B + "deblocks.0.0.weight"] = (
        g.normal(size=(nf, nuf, us, us)) / np.sqrt(nf)
    ).astype(np.float32)
    add_bn(B + "deblocks.0.1", nuf)

    H = "model.unet.center_head."
    nc = cfg.model.head.num_class
    sd[H + "conv_cls.weight"] = (
        0.3 * g.normal(size=(nc, nuf, 1, 1))
    ).astype(np.float32)
    sd[H + "conv_cls.bias"] = (
        np.full(nc, cls_bias, np.float32)
        if cls_bias is not None else g.normal(size=nc).astype(np.float32)
    )
    sd[H + "conv_box.weight"] = (
        0.02 * g.normal(size=(8, nuf, 1, 1))
    ).astype(np.float32)
    sd[H + "conv_box.bias"] = (0.1 * g.normal(size=8)).astype(np.float32)

    M = "model.motion_encoder.MinkUNet."
    m = params["motion"]

    def add_me(key, ours):
        sh = np.asarray(ours).shape
        fan = sh[0] * sh[1] if len(sh) == 3 else sh[0]
        sd[key] = (g.normal(size=sh) / np.sqrt(fan)).astype(np.float32)

    for ours, theirs, bn in (
        ("stem", "conv0p1s1", "bn0"), ("down1", "conv1p1s2", "bn1"),
        ("down2", "conv2p2s2", "bn2"), ("down3", "conv3p4s2", "bn3"),
        ("up5", "convtr5p8s2", "bntr5"), ("up6", "convtr6p4s2", "bntr6"),
        ("up7", "convtr7p2s2", "bntr7"),
    ):
        add_me(M + theirs + ".kernel", m[ours]["conv"]["w"])
        add_bn(M + bn + ".bn", m[ours]["bn"]["scale"].shape[0])
    for blk in ("block1", "block2", "block3", "block6", "block7", "block8"):
        add_me(M + blk + ".0.conv1.kernel", m[blk]["conv1"]["w"])
        add_me(M + blk + ".0.conv2.kernel", m[blk]["conv2"]["w"])
        add_bn(M + blk + ".0.norm1.bn", m[blk]["bn1"]["scale"].shape[0])
        add_bn(M + blk + ".0.norm2.bn", m[blk]["bn2"]["scale"].shape[0])
        if "down" in m[blk]:
            dsh = np.asarray(m[blk]["down"]["w"]).shape[1:]
            sd[M + blk + ".0.downsample.0.kernel"] = (
                g.normal(size=dsh) / np.sqrt(dsh[0])
            ).astype(np.float32)
            add_bn(
                M + blk + ".0.downsample.1.bn",
                m[blk]["down_bn"]["scale"].shape[0],
            )
    out_c = np.asarray(m["final"]["w"]).shape
    sd[M + "final.kernel"] = g.normal(size=out_c).astype(np.float32)
    sd[M + "final.bias"] = g.normal(size=out_c[-1]).astype(np.float32)
    return sd
