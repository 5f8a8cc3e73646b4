"""Dense pure-torch oracle of the FULL InsMOS pipeline at tiny scale.

An independent re-implementation of the reference network semantics
(models/models.py:269-377 composition; MinkowskiEngine CustomMinkUNet
motionnet.py + minkunet.py; spconv UNetV2 spconv_unet.py:120-416; BEV
backbone base_bev_backbone.py; CenterHead center_head.py:251-276) on FULLY
OCCUPIED dense grids, where every sparse op equals its dense counterpart:

- submanifold conv == dense cross-correlation (all sites present),
- strided sparse conv == dense strided conv (derived sites = full coarse
  grid on a fully occupied fine grid),
- SparseInverseConv3d == the pair-replay transpose, implemented here by
  direct offset scatter,
- ME 4D convs == per-(t_out, dt) conv3d sums (t-kernel zero-clipped at the
  window edge, like the t-band fold),
- TensorField.slice / gather_features_by_pc_voxel_id == grid lookups
  (one point per voxel).

Weights come from a REFERENCE-LAYOUT state_dict (tests/sd_builder.py):
spconv native (out, kz, ky, kx, in), ME (K, in, out) x-fastest, torch
OIHW / (in, out, kh, kw). The jax side consumes the SAME state_dict
through utils/convert.py — so the e2e diff covers converter + engines +
wiring together (VERDICT round-4 #4).

Dense tensors are torch (C, X, Y, Z) per time slot; BEV follows the
reference's (C*D, H, W) channel order with D=z, H=y, W=x.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# ------------------------------------------------------- weight adapters
def w_me(sd_w: np.ndarray, kernel):
    """ME (K, in, out), K x-fastest over (x, y, z[, t]) -> list over kt of
    torch conv3d weights (out, in, kx, ky, kz)."""
    K, cin, cout = sd_w.shape
    kx, ky, kz = kernel[:3]
    kt = kernel[3] if len(kernel) == 4 else 1
    w = sd_w.reshape(kt, kz, ky, kx, cin, cout)  # x fastest -> last spatial
    out = []
    for it in range(kt):
        wt = np.transpose(w[it], (4, 3, 2, 1, 0))  # (out, in, kx?...)
        # axes after transpose: (cout, cin, kx, ky, kz)? w[it] is
        # (kz, ky, kx, cin, cout): transpose (4, 3, 2, 1, 0) ->
        # (cout, cin, kx, ky, kz). yes.
        out.append(torch.tensor(np.ascontiguousarray(wt)))
    return out


def w_spconv(sd_w: np.ndarray):
    """spconv native (out, kz, ky, kx, in) -> torch conv3d
    (out, in, kx, ky, kz)."""
    wt = np.transpose(sd_w, (0, 4, 3, 2, 1))
    return torch.tensor(np.ascontiguousarray(wt))


def bn_eval(x, sd, prefix, eps, caxis=0):
    """x: (..., C at axis caxis)."""
    sh = [1] * x.ndim
    sh[caxis] = -1
    m = torch.tensor(sd[prefix + ".running_mean"]).reshape(sh)
    v = torch.tensor(sd[prefix + ".running_var"]).reshape(sh)
    w = torch.tensor(sd[prefix + ".weight"]).reshape(sh)
    b = torch.tensor(sd[prefix + ".bias"]).reshape(sh)
    return (x - m) / torch.sqrt(v + eps) * w + b


# -------------------------------------------------- dense conv primitives
def conv4d(x, w_list, kt, stride=1, pad=0):
    """x: (T, C, X, Y, Z); per-dt conv3d sum with zero-clipped t edges.

    Output slot p sums over it in [0, kt): input slot p + it - (kt-1)//2
    (the t-band fold, slab.t_band with t0_off=0, T_out=T)."""
    T = x.shape[0]
    lo = (kt - 1) // 2
    outs = []
    for p in range(T):
        acc = None
        for it in range(kt):
            i = p + it - lo
            if not (0 <= i < T):
                continue
            y = F.conv3d(x[i : i + 1], w_list[it], stride=stride, padding=pad)
            acc = y if acc is None else acc + y
        outs.append(acc)
    return torch.cat(outs, dim=0)


def inv_s2k2(x, sd_w):
    """ME inverse conv kernel 2 stride 2: out[f] = W[kidx(f)] x[f // 2],
    kidx = (fx & 1) + 2 (fy & 1) + 4 (fz & 1) (x-fastest K). x: (T, C,
    X, Y, Z) -> (T, C', 2X, 2Y, 2Z)."""
    K, cin, cout = sd_w.shape
    assert K == 8
    T, C, X, Y, Z = x.shape
    out = torch.zeros((T, cout, 2 * X, 2 * Y, 2 * Z))
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                k = dx + 2 * dy + 4 * dz
                w = torch.tensor(sd_w[k])  # (cin, cout)
                y = torch.einsum("tcxyz,cd->tdxyz", x, w)
                out[:, :, dx::2, dy::2, dz::2] = y
    return out


def inv_pairs_dense(x, w_t, fine_shape, stride, pad):
    """SparseInverseConv3d on full grids: out[i] += W[delta] x[o] for
    delta = i + pad - o*stride in [0, k)^3 (convs.py:210-216 kidx).
    x: (1, C, Xc, Yc, Zc); w_t: (cout, cin, kx, ky, kz) torch layout
    (kernel axis d of w_t indexes delta_d). Returns (1, cout, *fine_shape).
    """
    _, cin, Xc, Yc, Zc = x.shape
    cout = w_t.shape[0]
    k = w_t.shape[2:]
    out = torch.zeros((1, cout, *fine_shape))
    for dz in range(k[2]):
        for dy in range(k[1]):
            for dx in range(k[0]):
                y = torch.einsum(
                    "bcxyz,dc->bdxyz", x, w_t[:, :, dx, dy, dz]
                )
                # fine i = o*stride - pad + delta
                ix = np.arange(Xc) * stride[0] - pad[0] + dx
                iy = np.arange(Yc) * stride[1] - pad[1] + dy
                iz = np.arange(Zc) * stride[2] - pad[2] + dz
                mx = (ix >= 0) & (ix < fine_shape[0])
                my = (iy >= 0) & (iy < fine_shape[1])
                mz = (iz >= 0) & (iz < fine_shape[2])
                out[
                    :, :,
                    ix[mx][:, None, None], iy[my][None, :, None],
                    iz[mz][None, None, :],
                ] += y[:, :, mx][:, :, :, my][:, :, :, :, mz]
    return out


# ----------------------------------------------------------- MotionNet
def motionnet_oracle(sd, occ01, eps=1e-5):
    """occ01: (T, 1, X, Y, Z) float (0.5 at occupied voxels — the
    constant-0.5 input feature of motionnet.py TensorField). Returns
    (T, 3, X, Y, Z) motion logits. Full occupancy assumed (no masking)."""
    M = "model.motion_encoder.MinkUNet."

    def conv_bn_relu(x, wkey, bnkey, kernel, stride=1, pad=None):
        wl = w_me(sd[M + wkey], kernel)
        if pad is None:
            # F.conv3d padding pairs with the input's spatial dim order
            # (X, Y, Z) here
            pad = tuple((kk - 1) // 2 for kk in kernel[:3])
        y = conv4d(x, wl, kernel[3] if len(kernel) == 4 else 1,
                   stride=stride, pad=pad)
        y = bn_eval(y, sd, M + bnkey + ".bn", eps, caxis=1)
        return F.relu(y)

    def basic_block(x, blk, kernel=(3, 3, 3, 3)):
        b = M + blk + ".0"
        w1 = w_me(sd[b + ".conv1.kernel"], kernel)
        w2 = w_me(sd[b + ".conv2.kernel"], kernel)
        pad = tuple((kk - 1) // 2 for kk in kernel[:3])
        kt = kernel[3]
        y = conv4d(x, w1, kt, pad=pad)
        y = F.relu(bn_eval(y, sd, b + ".norm1.bn", eps, caxis=1))
        y = conv4d(y, w2, kt, pad=pad)
        y = bn_eval(y, sd, b + ".norm2.bn", eps, caxis=1)
        if (b + ".downsample.0.kernel") in sd:
            w = torch.tensor(sd[b + ".downsample.0.kernel"])  # (cin, cout)
            idt = torch.einsum("tcxyz,cd->tdxyz", x, w)
            idt = bn_eval(idt, sd, b + ".downsample.1.bn", eps, caxis=1)
        else:
            idt = x
        return F.relu(y + idt)

    x = torch.tensor(occ01)
    stem = conv_bn_relu(x, "conv0p1s1.kernel", "bn0", (5, 5, 5, 1))
    y = conv_bn_relu(stem, "conv1p1s2.kernel", "bn1", (2, 2, 2, 1),
                     stride=2, pad=0)
    b1 = basic_block(y, "block1")
    y = conv_bn_relu(b1, "conv2p2s2.kernel", "bn2", (2, 2, 2, 1),
                     stride=2, pad=0)
    b2 = basic_block(y, "block2")
    y = conv_bn_relu(b2, "conv3p4s2.kernel", "bn3", (2, 2, 2, 1),
                     stride=2, pad=0)
    y = basic_block(y, "block3")

    y = inv_s2k2(y, sd[M + "convtr5p8s2.kernel"])
    y = F.relu(bn_eval(y, sd, M + "bntr5.bn", eps, caxis=1))
    y = basic_block(torch.cat([y, b2], dim=1), "block6")
    y = inv_s2k2(y, sd[M + "convtr6p4s2.kernel"])
    y = F.relu(bn_eval(y, sd, M + "bntr6.bn", eps, caxis=1))
    y = basic_block(torch.cat([y, b1], dim=1), "block7")
    y = inv_s2k2(y, sd[M + "convtr7p2s2.kernel"])
    y = F.relu(bn_eval(y, sd, M + "bntr7.bn", eps, caxis=1))
    y = basic_block(torch.cat([y, stem], dim=1), "block8")

    wf = torch.tensor(sd[M + "final.kernel"])  # (8, 3)
    bf = torch.tensor(sd[M + "final.bias"])
    return torch.einsum("tcxyz,cd->tdxyz", y, wf) + bf.reshape(1, -1, 1, 1, 1)


# ----------------------------------------------------------------- UNet
def unet_oracle(sd, vox_feats, grid, boxes_fn, pc_lo, eps=1e-3):
    """vox_feats: (1, 7, X, Y, Z) dense voxel features (fully occupied).
    boxes_fn(bev_chw) -> (boxes (M, 8 incl. 1-indexed class), valid (M,))
    called with the torch BEV map; instance features use the reference's
    voxel-coordinate box test. Returns (mos_logits (X, Y, Z, 3), cls_map,
    box_map)."""
    U = "model.unet."
    X, Y, Z = grid

    def subm(x, name):
        w = w_spconv(sd[U + name + ".0.weight"])
        y = F.conv3d(x, w, padding=tuple(
            (k - 1) // 2 for k in w.shape[2:]
        ))
        y = bn_eval(y, sd, U + name + ".1", eps, caxis=1)
        return F.relu(y)

    def strided(x, name):
        w = w_spconv(sd[U + name + ".0.weight"])
        y = F.conv3d(x, w, stride=2, padding=1)
        y = bn_eval(y, sd, U + name + ".1", eps, caxis=1)
        return F.relu(y)

    x = subm(vox_feats, "conv_input")
    enc1 = subm(x, "conv1.0")
    y = enc1
    enc = {1: enc1}
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        y = strided(y, f"conv{lvl}.0")
        y = subm(y, f"conv{lvl}.1")
        y = subm(y, f"conv{lvl}.2")
        enc[stride] = y
    # conv_out: kernel (1,1,3) stride (1,1,2) pad 0 (z-only)
    w = w_spconv(sd[U + "conv_out.0.weight"])
    encoded = F.conv3d(y, w, stride=(1, 1, 2), padding=0)
    encoded = F.relu(bn_eval(encoded, sd, U + "conv_out.1", eps, caxis=1))

    # BEV: reference channel order c*D + z with H=y, W=x
    _, C8, X8, Y8, Z8 = encoded.shape
    bev = encoded[0].permute(0, 3, 2, 1).reshape(C8 * Z8, Y8, X8)
    boxes, box_valid = boxes_fn(bev)

    # decoder
    w = w_spconv(sd[U + "inv_conv_out.weight"])
    y = inv_pairs_dense(
        encoded, w, tuple(enc[8].shape[2:]), (1, 1, 2), (0, 0, 0)
    )

    # boxes in per-level GRID units (spconv_unet.py:325-331, to_grid)
    vs = np.array([0.1, 0.1, 0.1])
    lo = np.array(pc_lo)

    def inst_feats(stride, shape):
        """(1, nc, Xs, Ys, Zs) one-hot class membership of voxel coords in
        grid-scaled boxes (spconv_unet.py:325-347 via Array_Index)."""
        from insmos_tpu.ops.points_in_boxes import points_in_rotated_boxes_np

        Xs, Ys, Zs = shape
        nc = 3
        sb = np.asarray(boxes, np.float64).copy()
        feat = np.zeros((nc, Xs, Ys, Zs), np.float32)
        live = np.asarray(box_valid) & (sb[:, 7] > 0)
        if live.any():
            sb7 = sb[live][:, :7].copy()
            sb7[:, 0:3] = (sb7[:, 0:3] - lo[None]) / (vs[None] * stride)
            sb7[:, 3:6] = sb7[:, 3:6] / (vs[None] * stride)
            cls = sb[live][:, 7].astype(int)
            cc = np.stack(
                np.meshgrid(
                    np.arange(Xs), np.arange(Ys), np.arange(Zs),
                    indexing="ij",
                ), -1,
            ).reshape(-1, 3).astype(np.float64)
            inside = points_in_rotated_boxes_np(cc, sb7)  # (N, M)
            for c in range(nc):
                m = inside[:, cls == c + 1].any(1)
                feat[c] = m.reshape(Xs, Ys, Zs)
        return torch.tensor(feat[None])

    def fuse(x, stride, name):
        cat = torch.cat([x, inst_feats(stride, tuple(x.shape[2:]))], dim=1)
        return subm(cat, name)

    def channel_reduction(x, cout):
        b, cin = x.shape[:2]
        return x.reshape(b, cout, cin // cout, *x.shape[2:]).sum(2)

    def ur_block(lat, bot, lvl, fine_shape=None, last=False):
        t = f"conv_up_t{lvl}"
        w1 = w_spconv(sd[U + t + ".conv1.weight"])
        w2 = w_spconv(sd[U + t + ".conv2.weight"])
        xt = F.conv3d(lat, w1, padding=1)
        xt = F.relu(bn_eval(xt, sd, U + t + ".bn1", eps, caxis=1))
        xt = F.conv3d(xt, w2, padding=1)
        xt = bn_eval(xt, sd, U + t + ".bn2", eps, caxis=1)
        xt = F.relu(xt + lat)  # SparseBasicBlock, no downsample
        cat = torch.cat([bot, xt], dim=1)
        xm = subm(cat, f"conv_up_m{lvl}")
        fused = xm + channel_reduction(cat, xm.shape[1])
        if last:
            return subm(fused, "conv_up_out.0")
        w = w_spconv(sd[U + f"inv_conv{lvl}.0.weight"])
        yt = inv_pairs_dense(fused, w, fine_shape, (2, 2, 2), (1, 1, 1))
        yt = bn_eval(yt, sd, U + f"inv_conv{lvl}.1", eps, caxis=1)
        return F.relu(yt)

    y = fuse(y, 8, "conv_up_instance_block")
    y = ur_block(y, y, 4, enc[4].shape[2:])
    y = fuse(y, 4, "conv_up_instance_block_up4")
    y = ur_block(enc[4], y, 3, enc[2].shape[2:])
    y = fuse(y, 2, "conv_up_instance_block_up3")
    y = ur_block(enc[2], y, 2, enc[1].shape[2:])
    y = fuse(y, 1, "conv_up_instance_block_up2")
    y = ur_block(enc[1], y, 1, last=True)
    cat = torch.cat([y, inst_feats(1, tuple(y.shape[2:]))], dim=1)
    y = subm(cat, "conv_up_instance_block_up1")

    wm = torch.tensor(sd[U + "mos_seg_layer.weight"])  # (3, 16)
    bm = torch.tensor(sd[U + "mos_seg_layer.bias"])
    logits = torch.einsum("bcxyz,dc->bdxyz", y, wm) + bm.reshape(1, -1, 1, 1, 1)
    return logits[0].permute(1, 2, 3, 0), bev, boxes, box_valid


def bev_head_oracle(sd, bev_chw, layer_nums=5, eps=1e-3):
    """BEV backbone + center head: bev (C, H, W) -> (cls (H', W', nc),
    box (H', W', 8))."""
    B = "model.unet.bev_backbone."
    x = torch.as_tensor(bev_chw)[None]
    torch_idx = [1] + [4 + 3 * i for i in range(layer_nums)]
    for ti in torch_idx:
        w = torch.tensor(sd[B + f"blocks.0.{ti}.weight"])
        x = F.conv2d(x, w, stride=1, padding=1)
        x = F.relu(bn_eval(x, sd, B + f"blocks.0.{ti + 1}", eps, caxis=1))
    w = torch.tensor(sd[B + "deblocks.0.0.weight"])  # (in, out, k, k)
    x = F.conv_transpose2d(x, w, stride=w.shape[2])
    x = F.relu(bn_eval(x, sd, B + "deblocks.0.1", eps, caxis=1))

    H = "model.unet.center_head."
    cls = F.conv2d(x, torch.tensor(sd[H + "conv_cls.weight"])) + torch.tensor(
        sd[H + "conv_cls.bias"]
    ).reshape(1, -1, 1, 1)
    box = F.conv2d(x, torch.tensor(sd[H + "conv_box.weight"])) + torch.tensor(
        sd[H + "conv_box.bias"]
    ).reshape(1, -1, 1, 1)
    return cls[0].permute(1, 2, 0), box[0].permute(1, 2, 0)


def decode_boxes_np(box_map, voxel_size, pc_range, out_size_factor):
    """numpy mirror of ops.box_utils.decode_center_boxes."""
    H, W, _ = box_map.shape
    flat = np.asarray(box_map, np.float64).reshape(H * W, 8)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xs = xs.reshape(-1) + flat[:, 0]
    ys = ys.reshape(-1) + flat[:, 1]
    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]
    dims = np.exp(flat[:, 3:6])
    yaw = np.arctan2(flat[:, 6], flat[:, 7])
    return np.concatenate(
        [np.stack([xs, ys, flat[:, 2]], -1), dims, yaw[:, None]], axis=-1
    )
