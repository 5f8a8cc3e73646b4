"""Checkpoint-converter layout transforms vs torch numerics, and a full
round-trip through a synthetic torch state_dict shaped like the reference's."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from insmos_tpu.nn.layers import batch_norm, conv2d, conv2d_transpose, linear
from insmos_tpu.utils.convert import (
    t_conv2d,
    t_conv2d_transpose,
    t_linear,
    t_spconv,
)


def test_linear_transform(rng):
    w = rng.normal(size=(5, 7)).astype(np.float32)  # torch (out, in)
    b = rng.normal(size=5).astype(np.float32)
    x = rng.normal(size=(3, 7)).astype(np.float32)
    exp = torch.nn.functional.linear(
        torch.tensor(x), torch.tensor(w), torch.tensor(b)
    ).numpy()
    got = np.asarray(linear({"w": jnp.asarray(t_linear(w)), "b": jnp.asarray(b)}, x))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_conv2d_transform(rng):
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)  # OIHW
    x = rng.normal(size=(8, 9, 3)).astype(np.float32)  # HWC
    exp = (
        torch.nn.functional.conv2d(
            torch.tensor(x.transpose(2, 0, 1))[None], torch.tensor(w), padding=1
        )[0]
        .numpy()
        .transpose(1, 2, 0)
    )
    got = np.asarray(conv2d({"w": jnp.asarray(t_conv2d(w))}, x, padding="SAME"))
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_conv2d_transpose_transform(rng):
    # kernel == stride == 2, the BEV deblock configuration
    w = rng.normal(size=(3, 5, 2, 2)).astype(np.float32)  # torch (in, out, kh, kw)
    x = rng.normal(size=(4, 6, 3)).astype(np.float32)
    exp = (
        torch.nn.functional.conv_transpose2d(
            torch.tensor(x.transpose(2, 0, 1))[None], torch.tensor(w), stride=2
        )[0]
        .numpy()
        .transpose(1, 2, 0)
    )
    got = np.asarray(
        conv2d_transpose({"w": jnp.asarray(t_conv2d_transpose(w))}, x, stride=2)
    )
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_batch_norm_eval_matches_torch(rng):
    c = 6
    x = rng.normal(size=(20, c)).astype(np.float32)
    weight = rng.normal(size=c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 2, size=c).astype(np.float32)
    bn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
    bn.weight.data = torch.tensor(weight)
    bn.bias.data = torch.tensor(bias)
    bn.running_mean.data = torch.tensor(mean)
    bn.running_var.data = torch.tensor(var)
    bn.eval()
    exp = bn(torch.tensor(x)).detach().numpy()
    got, _ = batch_norm(
        {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        jnp.asarray(x),
        train=False,
        eps=1e-3,
    )
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)


def test_batch_norm_train_stats_match_torch(rng):
    c = 4
    x = rng.normal(size=(50, c)).astype(np.float32)
    bn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
    bn.train()
    exp = bn(torch.tensor(x)).detach().numpy()
    got, new_s = batch_norm(
        {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        {"mean": jnp.zeros(c), "var": jnp.ones(c)},
        jnp.asarray(x),
        train=True,
        mask=jnp.ones(50, bool),
        momentum=0.01,
        eps=1e-3,
    )
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_s["mean"]), bn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_s["var"]), bn.running_var.numpy(), atol=1e-4
    )


def test_spconv_transform_shape():
    w = np.arange(2 * 3 * 3 * 3 * 5, dtype=np.float32).reshape(2, 3, 3, 3, 5)
    out = t_spconv(w)
    assert out.shape == (27, 5, 2)
    # flattened kernel order preserved: element (out=1, k=(0,0,2), in=4)
    np.testing.assert_array_equal(out[2, 4, 1], w[1, 0, 0, 2, 4])


@pytest.mark.slow
def test_full_convert_roundtrip_synthetic():
    """Build a torch state_dict with the reference's exact key names/shapes,
    convert, and verify every tensor landed and none is left over."""
    from test_model import tiny_config
    from insmos_tpu.nn import InsMOSModel
    from insmos_tpu.utils import convert as C

    cfg = tiny_config(window=2)
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    sd = {}
    g = np.random.default_rng(0)

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = g.normal(size=c).astype(np.float32)
        sd[prefix + ".bias"] = g.normal(size=c).astype(np.float32)
        sd[prefix + ".running_mean"] = g.normal(size=c).astype(np.float32)
        sd[prefix + ".running_var"] = g.uniform(0.5, 2, c).astype(np.float32)

    def add_spconv(key, ours):
        K, cin, cout = np.asarray(ours).shape
        k = round(K ** (1 / 3)) if K not in (3,) else None
        if K == 27:
            shape = (cout, 3, 3, 3, cin)
        elif K == 3:
            shape = (cout, 3, 1, 1, cin)  # z-only kernel in torch (z,y,x)
        else:
            raise AssertionError(K)
        sd[key] = (0.1 * g.normal(size=shape)).astype(np.float32)

    U = "model.unet."
    u = params["unet"]
    add_spconv(U + "conv_input.0.weight", u["conv_input"]["conv"]["w"])
    add_bn(U + "conv_input.1", 16)
    add_spconv(U + "conv1.0.0.weight", u["conv1"]["conv"]["w"])
    add_bn(U + "conv1.0.1", 16)
    chans = {2: 32, 3: 64, 4: 128}
    for lvl in (2, 3, 4):
        add_spconv(U + f"conv{lvl}.0.0.weight", u[f"conv{lvl}_down"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.0.1", chans[lvl])
        add_spconv(U + f"conv{lvl}.1.0.weight", u[f"conv{lvl}_a"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.1.1", chans[lvl])
        add_spconv(U + f"conv{lvl}.2.0.weight", u[f"conv{lvl}_b"]["conv"]["w"])
        add_bn(U + f"conv{lvl}.2.1", chans[lvl])
    add_spconv(U + "conv_out.0.weight", u["conv_out"]["conv"]["w"])
    add_bn(U + "conv_out.1", 128)
    add_spconv(U + "inv_conv_out.weight", u["inv_conv_out"]["conv"]["w"])
    for ours, theirs in {
        "fuse4": "conv_up_instance_block", "fuse3": "conv_up_instance_block_up4",
        "fuse2": "conv_up_instance_block_up3", "fuse1": "conv_up_instance_block_up2",
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
    for name, ours in (("inv_conv4", "inv4"), ("inv_conv3", "inv3"), ("inv_conv2", "inv2")):
        add_spconv(U + name + ".0.weight", u[ours]["conv"]["w"])
        add_bn(U + name + ".1", u[ours]["bn"]["scale"].shape[0])
    add_spconv(U + "conv_up_out.0.0.weight", u["up_out"]["conv"]["w"])
    add_bn(U + "conv_up_out.0.1", 16)
    sd[U + "mos_seg_layer.weight"] = g.normal(size=(3, 16)).astype(np.float32)
    sd[U + "mos_seg_layer.bias"] = g.normal(size=3).astype(np.float32)

    B = "model.unet.bev_backbone."
    nf = cfg.model.bev.num_filters[0]
    torch_idx = [1] + [4 + 3 * i for i in range(cfg.model.bev.layer_nums[0])]
    cin = cfg.model.bev.num_bev_features
    for k, ti in enumerate(torch_idx):
        c_src = cin if k == 0 else nf
        sd[B + f"blocks.0.{ti}.weight"] = (0.05 * g.normal(size=(nf, c_src, 3, 3))).astype(np.float32)
        add_bn(B + f"blocks.0.{ti + 1}", nf)
    sd[B + "deblocks.0.0.weight"] = (0.05 * g.normal(size=(nf, 256, 2, 2))).astype(np.float32)
    add_bn(B + "deblocks.0.1", 256)

    H = "model.unet.center_head."
    sd[H + "conv_cls.weight"] = g.normal(size=(3, 256, 1, 1)).astype(np.float32)
    sd[H + "conv_cls.bias"] = g.normal(size=3).astype(np.float32)
    sd[H + "conv_box.weight"] = g.normal(size=(8, 256, 1, 1)).astype(np.float32)
    sd[H + "conv_box.bias"] = g.normal(size=8).astype(np.float32)

    M = "model.motion_encoder.MinkUNet."
    m = params["motion"]
    def add_me(key, ours):
        sd[key] = (0.1 * g.normal(size=np.asarray(ours).shape)).astype(np.float32)
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
            sd[M + blk + ".0.downsample.0.kernel"] = (0.1 * g.normal(
                size=np.asarray(m[blk]["down"]["w"]).shape[1:]
            )).astype(np.float32)
            add_bn(M + blk + ".0.downsample.1.bn", m[blk]["down_bn"]["scale"].shape[0])
    sd[M + "final.kernel"] = g.normal(size=(8, 3)).astype(np.float32)
    sd[M + "final.bias"] = g.normal(size=3).astype(np.float32)

    # run the converters directly on the synthetic dict
    used = set()
    params2 = dict(params)
    params2["_bev_state"] = state["bev"]
    C.convert_unet(sd, params2["unet"], state["unet"], used)
    C.convert_bev_and_head(sd, params2, used)
    C.convert_motionnet(sd, params2["motion"], state["motion"], used)
    params2.pop("_bev_state")
    unused = [k for k in sd if k not in used]
    assert unused == [], f"unconverted keys: {unused[:8]}"

    # the converted model still runs
    from test_model import tiny_config as _
    model2 = InsMOSModel(cfg)
    sample = __import__("__graft_entry__")._synthetic_sample(cfg)
    out = jax.jit(lambda p, s, x: model2.forward(p, s, x, train=False))(
        params2, state, sample
    )
    assert np.isfinite(np.asarray(out["point_logits"])).all()


def test_subm_conv_matches_torch_dense_3d(rng):
    """Independent oracle for the engine's weight<->offset pairing and sign
    convention: on a FULLY-occupied grid a submanifold conv equals standard
    dense cross-correlation (torch conv3d) — the semantics spconv and
    MinkowskiEngine both implement (Choy et al. CVPR'19 eq. 3)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from insmos_tpu.sparse import SparseTensor, subm_gather_conv, unique_voxels

    dims = (6, 5, 4)  # (X, Y, Z)
    cin, cout = 3, 2
    kernel = (3, 3, 3)
    X, Y, Z = dims
    coords = np.stack(np.meshgrid(
        np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.int32)
    V = coords.shape[0]
    feats = rng.normal(size=(V, cin)).astype(np.float32)
    sites, p2v, _, _ = unique_voxels(jnp.asarray(coords), dims, V)
    f = np.zeros((V, cin), np.float32)
    f[np.asarray(p2v)] = feats
    x = SparseTensor(sites.coords, sites.keys, jnp.asarray(f), sites.valid, dims)

    K = int(np.prod(kernel))
    w = rng.normal(size=(K, cin, cout)).astype(np.float32)
    ours = np.asarray(subm_gather_conv(x, jnp.asarray(w), kernel).masked_feats())

    # torch: volume (1, C, Z, Y, X); our K enumerates x-fastest -> (kz,ky,kx)
    dense = np.zeros((cin, Z, Y, X), np.float32)
    cc = np.asarray(sites.coords)
    dense[:, cc[:, 2], cc[:, 1], cc[:, 0]] = f.T
    wt = w.reshape(kernel[2], kernel[1], kernel[0], cin, cout)  # (kz,ky,kx,ci,co)
    wt = np.transpose(wt, (4, 3, 0, 1, 2))  # (cout, cin, kz, ky, kx)
    ref = F.conv3d(torch.from_numpy(dense[None]), torch.from_numpy(wt), padding=1)
    ref = ref[0].numpy()  # (cout, Z, Y, X)
    ref_rows = ref[:, cc[:, 2], cc[:, 1], cc[:, 0]].T  # (V, cout)
    np.testing.assert_allclose(ours, ref_rows, atol=1e-4)


@pytest.mark.slow
def test_subm_conv_matches_torch_dense_4d(rng):
    """Same oracle in 4D: (3,3,3,3) kernel == per-dt torch conv3d composed
    with temporal shifts. Validates the MotionNet block-conv convention."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from insmos_tpu.sparse import SparseTensor, subm_gather_conv, unique_voxels

    dims = (5, 4, 3, 3)  # (X, Y, Z, T)
    cin, cout = 2, 2
    kernel = (3, 3, 3, 3)
    X, Y, Z, T = dims
    coords = np.stack(np.meshgrid(
        *[np.arange(d) for d in dims], indexing="ij"
    ), -1).reshape(-1, 4).astype(np.int32)
    V = coords.shape[0]
    sites, p2v, _, _ = unique_voxels(jnp.asarray(coords), dims, V)
    f = rng.normal(size=(V, cin)).astype(np.float32)
    x = SparseTensor(sites.coords, sites.keys, jnp.asarray(f), sites.valid, dims)

    K = int(np.prod(kernel))
    w = rng.normal(size=(K, cin, cout)).astype(np.float32)
    ours = np.asarray(subm_gather_conv(x, jnp.asarray(w), kernel).masked_feats())

    cc = np.asarray(sites.coords)
    dense = np.zeros((T, cin, Z, Y, X), np.float32)
    dense[cc[:, 3], :, cc[:, 2], cc[:, 1], cc[:, 0]] = np.asarray(x.feats)
    # our K enum: x fastest ... t slowest -> (kt, kz, ky, kx) on unflatten
    wt = w.reshape(3, 3, 3, 3, cin, cout)  # (kt, kz, ky, kx, ci, co)
    ref = np.zeros((T, cout, Z, Y, X), np.float32)
    for kt in range(3):
        dt = kt - 1
        wk = np.transpose(wt[kt], (4, 3, 0, 1, 2))  # (co, ci, kz, ky, kx)
        y = F.conv3d(torch.from_numpy(dense), torch.from_numpy(wk), padding=1).numpy()
        # out(t) += conv(in(t + dt))
        if dt == 0:
            ref += y
        elif dt == 1:
            ref[:-1] += y[1:]
        else:
            ref[1:] += y[:-1]
    ref_rows = ref[cc[:, 3], :, cc[:, 2], cc[:, 1], cc[:, 0]]
    np.testing.assert_allclose(ours, ref_rows, atol=1e-4)


def test_me_kernel_reorder_roundtrip(rng):
    from insmos_tpu.utils.convert import t_me_kernel

    kernel = (5, 5, 5, 1)
    K = int(np.prod(kernel))
    w = rng.normal(size=(K, 2, 3)).astype(np.float32)
    # identity permutation / no reverse: pass-through
    np.testing.assert_array_equal(t_me_kernel(w), w)
    np.testing.assert_array_equal(
        t_me_kernel(w, kernel_size=kernel, axis_perm=(0, 1, 2, 3)), w
    )
    # reverse twice = identity
    np.testing.assert_array_equal(
        t_me_kernel(t_me_kernel(w, reverse_k=True), reverse_k=True), w
    )
    # swapping x<->y twice = identity
    p = (1, 0, 2, 3)
    w2 = t_me_kernel(w, kernel_size=kernel, axis_perm=p)
    np.testing.assert_array_equal(
        t_me_kernel(w2, kernel_size=kernel, axis_perm=p), w
    )
    # marker check: offset (+1x) weight moves to offset (+1y) under x<->y swap
    kernel3 = (3, 3, 3)
    w = np.zeros((27, 1, 1), np.float32)
    w[14] = 1.0  # x-fastest enum: (dx,dy,dz)=(+1,0,0) -> 1 + (1*3) + (1*9) + 1
    w2 = t_me_kernel(w, kernel_size=kernel3, axis_perm=(1, 0, 2))
    assert w2[16, 0, 0] == 1.0  # (0,+1,0) -> 1 + 3*(1+1) + 9*1 = 16
    assert w2.sum() == 1.0
