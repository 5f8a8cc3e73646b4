"""Sparse voxel engine vs dense numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.sparse import (
    SparseTensor,
    devoxelize,
    inverse_conv,
    linearize_coords,
    lookup_keys,
    make_offsets,
    strided_conv_sites,
    subm_gather_conv,
    to_dense_bev,
    unique_voxels,
    voxelize_points,
)
from insmos_tpu.sparse.convs import strided_conv
from insmos_tpu.sparse.tensor import KEY_SENTINEL


def _rand_sparse(rng, dims, n, c, capacity=None):
    """Random sparse tensor with unique coords in `dims`."""
    capacity = capacity or n * 2
    total = int(np.prod(dims))
    flat = rng.choice(total, size=n, replace=False)
    coords = np.stack(
        [flat % dims[0], (flat // dims[0]) % dims[1], flat // (dims[0] * dims[1])],
        axis=-1,
    ).astype(np.int32)
    sites, p2v, _, _ = unique_voxels(jnp.asarray(coords), dims, capacity)
    feats = np.zeros((capacity, c), np.float32)
    feats_src = rng.normal(size=(n, c)).astype(np.float32)
    feats[np.asarray(p2v)] = feats_src
    return SparseTensor(
        sites.coords, sites.keys, jnp.asarray(feats), sites.valid, tuple(dims)
    )


def _to_dense(x, c):
    """Sparse -> dense (X, Y, Z, C) numpy."""
    dims = x.dims
    dense = np.zeros((*dims, c), np.float32)
    coords = np.asarray(x.coords)
    valid = np.asarray(x.valid)
    feats = np.asarray(x.feats)
    for i in range(len(valid)):
        if valid[i]:
            dense[tuple(coords[i])] = feats[i]
    return dense


def _occupancy(x):
    dims = x.dims
    occ = np.zeros(dims, bool)
    for i, v in enumerate(np.asarray(x.valid)):
        if v:
            occ[tuple(np.asarray(x.coords)[i])] = True
    return occ


# ----------------------------------------------------------- coords / keys
def test_linearize_and_lookup():
    dims = (4, 5, 6)
    coords = jnp.asarray([[0, 0, 0], [3, 4, 5], [1, 2, 3], [4, 0, 0], [-1, 0, 0]])
    keys = linearize_coords(coords, dims)
    assert int(keys[0]) == 0
    assert int(keys[1]) == 4 * 5 * 6 - 1
    assert int(keys[3]) == KEY_SENTINEL  # out of grid
    assert int(keys[4]) == KEY_SENTINEL
    sorted_keys = jnp.sort(keys)
    idx = lookup_keys(sorted_keys, keys[:3])
    assert (idx >= 0).all()
    missing = lookup_keys(sorted_keys, jnp.asarray([7]))
    assert int(missing[0]) == -1


def test_make_offsets_order():
    offs = make_offsets([3, 3], centered=True)
    # x fastest: first three offsets are (-1..1, -1)
    np.testing.assert_array_equal(offs[:3], [[-1, -1], [0, -1], [1, -1]])
    assert offs.shape == (9, 2)
    offs2 = make_offsets([2, 1, 1], centered=False)
    np.testing.assert_array_equal(offs2, [[0, 0, 0], [1, 0, 0]])


# ------------------------------------------------------------ unique/voxelize
def test_unique_voxels_dedup_and_ids():
    dims = (10, 10, 10)
    coords = jnp.asarray(
        [[1, 1, 1], [2, 2, 2], [1, 1, 1], [3, 3, 3], [2, 2, 2], [1, 1, 1]]
    )
    sites, p2v, slot, counts = unique_voxels(coords, dims, capacity=8)
    assert int(sites.valid.sum()) == 3
    p2v = np.asarray(p2v)
    assert p2v[0] == p2v[2] == p2v[5]
    assert p2v[1] == p2v[4]
    # keys sorted ascending among valid
    keys = np.asarray(sites.keys)
    assert (np.diff(keys[:3]) > 0).all()
    # slots count occurrences in point order
    np.testing.assert_array_equal(np.asarray(slot), [0, 0, 1, 0, 1, 2])
    got_counts = np.asarray(counts)[p2v[[0, 1, 3]]]
    np.testing.assert_array_equal(got_counts, [3, 2, 1])


def test_unique_voxels_first_occurrence_cap():
    dims = (100, 1, 1)
    # point order visits voxels 50, 2, 7; capacity 2 keeps {50, 2}
    coords = jnp.asarray([[50, 0, 0], [2, 0, 0], [7, 0, 0], [50, 0, 0]])
    sites, p2v, _, _ = unique_voxels(coords, dims, capacity=2)
    keys = np.asarray(sites.keys)
    np.testing.assert_array_equal(keys, [2, 50])  # sorted storage
    p2v = np.asarray(p2v)
    assert p2v[2] == -1  # voxel 7 dropped (latest first-occurrence)
    assert p2v[0] == p2v[3] == 1 and p2v[1] == 0


def test_unique_voxels_invalid_points():
    dims = (10, 1, 1)
    coords = jnp.asarray([[1, 0, 0], [2, 0, 0], [3, 0, 0]])
    valid = jnp.asarray([True, False, True])
    sites, p2v, _, _ = unique_voxels(coords, dims, 4, point_valid=valid)
    assert int(sites.valid.sum()) == 2
    assert int(p2v[1]) == -1


@pytest.mark.slow
def test_voxelize_mean_of_first_k(rng):
    pc_range = [0, 0, 0, 10, 10, 10]
    dims = (10, 10, 10)
    # 7 points in one voxel: mean over the first 5 only
    pts = np.zeros((7, 4), np.float32)
    pts[:, :3] = 1.55  # voxel (1,1,1) with voxel_size 1
    pts[:, 3] = np.arange(7)
    sp, p2v = voxelize_points(
        jnp.asarray(pts),
        jnp.ones(7, bool),
        pc_range,
        [1.0, 1.0, 1.0],
        dims,
        capacity=4,
        max_points_per_voxel=5,
    )
    v = int(p2v[0])
    assert (np.asarray(p2v) == v).all()  # all 7 points map to the voxel
    np.testing.assert_allclose(np.asarray(sp.feats)[v, 3], np.mean(np.arange(5)))

    # out-of-range point -> id -1, feature gather -> zeros
    pts2 = np.array([[100.0, 0, 0, 1.0]], np.float32)
    sp2, p2v2 = voxelize_points(
        jnp.asarray(pts2), jnp.ones(1, bool), pc_range, [1, 1, 1], dims, 4, 5
    )
    assert int(p2v2[0]) == -1
    out = devoxelize(sp2.feats, p2v2)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_devoxelize_roundtrip(rng):
    feats = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    p2v = jnp.asarray([0, 0, 5, -1, 3])
    out = np.asarray(devoxelize(feats, p2v))
    np.testing.assert_allclose(out[0], np.asarray(feats)[0])
    np.testing.assert_allclose(out[2], np.asarray(feats)[5])
    np.testing.assert_array_equal(out[3], 0.0)


# ------------------------------------------------------------------- convs
def _dense_subm_oracle(dense, occ, weight, kernel):
    """Dense correlation restricted to occupied outputs."""
    X, Y, Z, cin = dense.shape
    K, _, cout = weight.shape
    offs = make_offsets(kernel, centered=True)
    out = np.zeros((X, Y, Z, cout), np.float32)
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if not occ[x, y, z]:
                    continue
                acc = np.zeros(cout, np.float32)
                for k, (dx, dy, dz) in enumerate(offs):
                    sx, sy, sz = x + dx, y + dy, z + dz
                    if 0 <= sx < X and 0 <= sy < Y and 0 <= sz < Z and occ[sx, sy, sz]:
                        acc += dense[sx, sy, sz] @ weight[k]
                out[x, y, z] = acc
    return out


def test_subm_conv_vs_dense_oracle(rng):
    dims = (6, 5, 4)
    x = _rand_sparse(rng, dims, n=30, c=3)
    weight = rng.normal(size=(27, 3, 2)).astype(np.float32)
    y = subm_gather_conv(x, jnp.asarray(weight), [3, 3, 3])
    got = _to_dense(y, 2)
    exp = _dense_subm_oracle(_to_dense(x, 3), _occupancy(x), weight, [3, 3, 3])
    np.testing.assert_allclose(got, exp, atol=1e-4)


def _dense_strided_oracle(dense, occ, weight, kernel, stride, pad, out_dims):
    K, cin, cout = weight.shape
    offs = make_offsets(kernel, centered=False)
    out = np.zeros((*out_dims, cout), np.float32)
    out_occ = np.zeros(out_dims, bool)
    for ox in range(out_dims[0]):
        for oy in range(out_dims[1]):
            for oz in range(out_dims[2]):
                acc = np.zeros(cout, np.float32)
                any_hit = False
                for k, (dx, dy, dz) in enumerate(offs):
                    sx = ox * stride[0] - pad[0] + dx
                    sy = oy * stride[1] - pad[1] + dy
                    sz = oz * stride[2] - pad[2] + dz
                    if (
                        0 <= sx < occ.shape[0]
                        and 0 <= sy < occ.shape[1]
                        and 0 <= sz < occ.shape[2]
                        and occ[sx, sy, sz]
                    ):
                        acc += dense[sx, sy, sz] @ weight[k]
                        any_hit = True
                if any_hit:
                    out[ox, oy, oz] = acc
                    out_occ[ox, oy, oz] = True
    return out, out_occ


@pytest.mark.slow
def test_strided_conv_vs_dense_oracle(rng):
    dims = (8, 8, 6)
    out_dims = (4, 4, 3)
    x = _rand_sparse(rng, dims, n=40, c=3)
    weight = rng.normal(size=(27, 3, 4)).astype(np.float32)
    sites = strided_conv_sites(x, [3, 3, 3], [2, 2, 2], [1, 1, 1], out_dims, 64)
    y = strided_conv(x, jnp.asarray(weight), [3, 3, 3], [2, 2, 2], [1, 1, 1], sites)
    got = _to_dense(y, 4)
    exp, exp_occ = _dense_strided_oracle(
        _to_dense(x, 3), _occupancy(x), weight, [3, 3, 3], [2, 2, 2], [1, 1, 1], out_dims
    )
    np.testing.assert_array_equal(_occupancy(y), exp_occ)
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_strided_z_only_conv_out(rng):
    """The encoder's conv_out: kernel (3,1,1) in z, stride (2,1,1), pad 0
    (reference spconv_unet.py:153-158, z-axis mapped to our 3rd coord)."""
    dims = (4, 4, 5)
    out_dims = (4, 4, 2)
    x = _rand_sparse(rng, dims, n=30, c=2)
    weight = rng.normal(size=(3, 2, 2)).astype(np.float32)
    sites = strided_conv_sites(x, [1, 1, 3], [1, 1, 2], [0, 0, 0], out_dims, 40)
    y = strided_conv(x, jnp.asarray(weight), [1, 1, 3], [1, 1, 2], [0, 0, 0], sites)
    exp, exp_occ = _dense_strided_oracle(
        _to_dense(x, 2), _occupancy(x), weight, [1, 1, 3], [1, 1, 2], [0, 0, 0], out_dims
    )
    np.testing.assert_array_equal(_occupancy(y), exp_occ)
    np.testing.assert_allclose(_to_dense(y, 2), exp, atol=1e-4)


def test_inverse_conv_restores_sites_and_matches_oracle(rng):
    dims = (8, 8, 6)
    out_dims = (4, 4, 3)
    x = _rand_sparse(rng, dims, n=40, c=3)
    w_down = rng.normal(size=(27, 3, 4)).astype(np.float32)
    sites = strided_conv_sites(x, [3, 3, 3], [2, 2, 2], [1, 1, 1], out_dims, 64)
    down = strided_conv(x, jnp.asarray(w_down), [3, 3, 3], [2, 2, 2], [1, 1, 1], sites)

    w_up = rng.normal(size=(27, 4, 2)).astype(np.float32)
    up = inverse_conv(down, jnp.asarray(w_up), [3, 3, 3], [2, 2, 2], [1, 1, 1], x.sites())
    # site restoration: exactly the original fine sites
    np.testing.assert_array_equal(_occupancy(up), _occupancy(x))

    # oracle: out(f) = sum_k W[k] . coarse((f + p - k)/s) when divisible
    offs = make_offsets([3, 3, 3], centered=False)
    coarse = _to_dense(down, 4)
    occ_c = _occupancy(down)
    exp = np.zeros((*dims, 2), np.float32)
    for i, v in enumerate(np.asarray(x.valid)):
        if not v:
            continue
        f = np.asarray(x.coords)[i]
        acc = np.zeros(2, np.float32)
        for k, d in enumerate(offs):
            num = f + np.array([1, 1, 1]) - d
            if (num % [2, 2, 2] == 0).all():
                q = num // [2, 2, 2]
                if (q >= 0).all() and (q < out_dims).all() and occ_c[tuple(q)]:
                    acc += coarse[tuple(q)] @ w_up[k]
        exp[tuple(f)] = acc
    np.testing.assert_allclose(_to_dense(up, 2), exp, atol=1e-4)


def test_me_style_downsample_kernel2(rng):
    """MinkUNet downsample: kernel 2 stride 2 pad 0 -> sites = floor(c/2)."""
    dims = (8, 8, 8)
    out_dims = (4, 4, 4)
    x = _rand_sparse(rng, dims, n=25, c=2)
    sites = strided_conv_sites(x, [2, 2, 2], [2, 2, 2], [0, 0, 0], out_dims, 32)
    exp = np.unique(np.asarray(x.coords)[np.asarray(x.valid)] // 2, axis=0)
    got = np.asarray(sites.coords)[np.asarray(sites.valid)]
    got = got[np.lexsort(got.T[::-1])]
    exp = exp[np.lexsort(exp.T[::-1])]
    np.testing.assert_array_equal(got, exp)


def test_to_dense_bev_layout(rng):
    dims = (3, 2, 2)  # X, Y, Z
    coords = jnp.asarray([[1, 0, 1], [2, 1, 0]])
    sites, p2v, _, _ = unique_voxels(coords, dims, 4)
    feats = np.zeros((4, 2), np.float32)
    feats[np.asarray(p2v)[0]] = [1.0, 2.0]
    feats[np.asarray(p2v)[1]] = [3.0, 4.0]
    x = SparseTensor(sites.coords, sites.keys, jnp.asarray(feats), sites.valid, dims)
    bev = np.asarray(to_dense_bev(x))  # (Y, X, C*Z)
    assert bev.shape == (2, 3, 4)
    # voxel (x=1, y=0, z=1): channels c*Z + 1 -> [1., 2.] at positions 1, 3
    np.testing.assert_allclose(bev[0, 1], [0, 1, 0, 2])
    np.testing.assert_allclose(bev[1, 2], [3, 0, 4, 0])


def test_inverse_parity_path_matches_general():
    """The parity-grouped inverse (kernel/stride/pad kwargs) must equal
    the general gather path bit-for-bit on both production geometries
    (k3s2p1 down convs; z-only (1,1,3)s(1,1,2)p0 conv_out inverse)."""
    import numpy as np

    from insmos_tpu.sparse.convs import (
        inverse_conv_pairs, strided_conv_sites,
    )
    from insmos_tpu.sparse.voxelize import unique_voxels

    rng = np.random.default_rng(17)
    for k3, s3, p3, dims in (
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (20, 16, 12)),
        ((1, 1, 3), (1, 1, 2), (0, 0, 0), (20, 16, 12)),
    ):
        n, cap = 900, 1024
        coords = np.stack(
            [rng.integers(0, d, n) for d in dims], -1
        ).astype(np.int32)
        fine, _, _, _ = unique_voxels(
            jnp.asarray(coords), dims, cap,
            point_valid=jnp.ones((n,), bool),
        )
        out_dims = tuple(-(-d // s) for d, s in zip(dims, s3))
        coarse, pairs, kidx = strided_conv_sites(
            fine, k3, s3, p3, out_dims, cap, with_pairs=True
        )
        cin, cout = 6, 5
        K = int(np.prod(k3))
        w = jnp.asarray(
            rng.normal(size=(K, cin, cout)).astype(np.float32)
        )
        csp = coarse.sites()
        csp = csp.replace_feats(
            jnp.asarray(rng.normal(size=(csp.capacity, cin)).astype(np.float32))
        )
        ref = inverse_conv_pairs(csp, w, fine, pairs, kidx)
        got = inverse_conv_pairs(
            csp, w, fine, pairs, kidx, kernel_size=k3, stride=s3, pad=p3
        )
        np.testing.assert_allclose(
            np.asarray(got.feats), np.asarray(ref.feats),
            atol=1e-4, rtol=1e-4,
        )
