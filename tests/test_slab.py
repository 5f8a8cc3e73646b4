"""Slab engine vs the dense-verified sorted-key oracle (sparse/convs.py).

Random sparse 4D inputs at several densities (including the <1 voxel/row
regime measured on real-scale clouds) and adversarial boundary cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.sparse import SparseTensor, unique_voxels
from insmos_tpu.sparse.convs import inverse_conv, strided_conv, strided_conv_sites, subm_gather_conv
from insmos_tpu.sparse.slab import (
    Slab,
    build_slab,
    derive_strided_sites,
    gather_slots,
    inverse_s2k2_conv,
    linearize3,
    parent_index,
    site_grid,
    strided_occ,
    window_conv,
    window_tables,
)

DIMS3 = (16, 12, 10)
T = 4
DIMS4 = DIMS3 + (T,)


def _random_4d(rng, n, cap4, cap3, density_extent=None):
    """Random 4D voxel set in both representations with identical feats."""
    ext = density_extent or DIMS3
    coords3 = np.stack(
        [rng.integers(0, e, n) for e in ext], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    valid = np.ones(n, bool)

    # oracle 4D tensor
    coords4 = np.concatenate([coords3, tcol[:, None]], axis=1)
    sites4, _, _, _ = unique_voxels(
        jnp.asarray(coords4), DIMS4, cap4, jnp.asarray(valid),
        first_occurrence_cap=False,
    )
    v4 = int(sites4.valid.sum())
    cin = 5
    feats4 = rng.normal(size=(cap4, cin)).astype(np.float32)
    feats4[~np.asarray(sites4.valid)] = 0.0
    x4 = sites4.replace_feats(jnp.asarray(feats4))

    # slab with matching features
    slab, p2slot, n_sites, n_drop = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.asarray(valid), DIMS3, T, cap3
    )
    assert int(n_drop) == 0
    c4 = np.asarray(sites4.coords)
    sl_keys = np.asarray(slab.keys)
    key3_of4 = (c4[:, 2] * DIMS3[1] + c4[:, 1]) * DIMS3[0] + c4[:, 0]
    site_of4 = np.searchsorted(sl_keys[: int(n_sites)], key3_of4)
    slot_of4 = site_of4 * T + c4[:, 3]
    fl = np.zeros((cap3 * T, cin), np.float32)
    v4mask = np.asarray(sites4.valid)
    fl[slot_of4[v4mask]] = feats4[v4mask]
    slab = slab.replace_feats(jnp.asarray(fl.reshape(cap3, T * cin)))

    # sanity: occ matches the 4D site set exactly
    occ = np.asarray(slab.occ).reshape(-1)
    assert occ.sum() == v4
    assert occ[slot_of4[v4mask]].all()
    return x4, slab, slot_of4, v4mask


def _slab_feats_at(slab, slot_of4, cout):
    fl = np.asarray(slab.feats).reshape(slab.capacity * slab.T, cout)
    return fl[slot_of4]


@pytest.mark.parametrize("seed,n", [(0, 400), (1, 2000), (2, 60)])
def test_subm_3333_matches_oracle(seed, n):
    rng = np.random.default_rng(seed)
    x4, slab, slot_of4, v4mask = _random_4d(rng, n, 4096, 2048)
    kernel = (3, 3, 3, 3)
    w = jnp.asarray(rng.normal(size=(81, 5, 6)).astype(np.float32)) * 0.2

    ref = subm_gather_conv(x4, w, kernel)
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, slab.coords, slab.valid, (3, 3, 3), vin=slab.capacity
    )
    got = window_conv(slab, w, tbl, slab, kernel)

    ref_np = np.asarray(ref.feats)[v4mask]
    got_np = _slab_feats_at(got, slot_of4, 6)[v4mask]
    np.testing.assert_allclose(got_np, ref_np, atol=1e-4, rtol=1e-4)


def test_subm_5551_stem_matches_oracle():
    rng = np.random.default_rng(3)
    x4, slab, slot_of4, v4mask = _random_4d(rng, 800, 2048, 1024)
    kernel = (5, 5, 5, 1)
    w = jnp.asarray(rng.normal(size=(125, 5, 4)).astype(np.float32)) * 0.2

    ref = subm_gather_conv(x4, w, kernel)
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, slab.coords, slab.valid, (5, 5, 5), vin=slab.capacity
    )
    got = window_conv(slab, w, tbl, slab, kernel)
    np.testing.assert_allclose(
        _slab_feats_at(got, slot_of4, 4)[v4mask],
        np.asarray(ref.feats)[v4mask],
        atol=1e-4, rtol=1e-4,
    )


def test_subm_boundary_rows():
    """Adversarial: sites hugging x=0 / x=X-1 edges and single-voxel rows."""
    coords3 = np.array(
        [[0, 0, 0], [1, 0, 0], [15, 0, 0], [14, 0, 0], [0, 11, 9],
         [15, 11, 9], [7, 5, 4], [8, 5, 4], [9, 5, 4], [0, 6, 4],
         [15, 4, 4], [0, 5, 5], [15, 5, 3]],
        np.int32,
    )
    n = len(coords3)
    tcol = np.arange(n, dtype=np.int32) % T
    rng = np.random.default_rng(7)

    coords4 = np.concatenate([coords3, tcol[:, None]], axis=1)
    sites4, _, _, _ = unique_voxels(
        jnp.asarray(coords4), DIMS4, 64, jnp.ones(n, bool),
        first_occurrence_cap=False,
    )
    feats4 = rng.normal(size=(64, 5)).astype(np.float32)
    feats4[~np.asarray(sites4.valid)] = 0.0
    x4 = sites4.replace_feats(jnp.asarray(feats4))

    slab, p2slot, n_sites, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, dtype=bool), DIMS3, T, 32
    )
    c4 = np.asarray(sites4.coords)
    key3_of4 = (c4[:, 2] * DIMS3[1] + c4[:, 1]) * DIMS3[0] + c4[:, 0]
    site_of4 = np.searchsorted(np.asarray(slab.keys)[: int(n_sites)], key3_of4)
    slot_of4 = site_of4 * T + c4[:, 3]
    v4mask = np.asarray(sites4.valid)
    fl = np.zeros((32 * T, 5), np.float32)
    fl[slot_of4[v4mask]] = feats4[v4mask]
    slab = slab.replace_feats(jnp.asarray(fl.reshape(32, T * 5)))

    w = jnp.asarray(rng.normal(size=(81, 5, 3)).astype(np.float32))
    ref = subm_gather_conv(x4, w, (3, 3, 3, 3))
    tbl = window_tables(
        site_grid(slab), DIMS3, slab.coords, slab.valid, (3, 3, 3), vin=32
    )
    got = window_conv(slab, w, tbl, slab, (3, 3, 3, 3))
    np.testing.assert_allclose(
        np.asarray(got.feats).reshape(32 * T, 3)[slot_of4[v4mask]],
        np.asarray(ref.feats)[v4mask],
        atol=1e-4, rtol=1e-4,
    )


def test_strided_2221_matches_oracle():
    rng = np.random.default_rng(4)
    x4, slab, _, _ = _random_4d(rng, 900, 2048, 1024)
    kernel4, stride4, pad4 = (2, 2, 2, 1), (2, 2, 2, 1), (0, 0, 0, 0)
    d3out = tuple(-(-d // 2) for d in DIMS3)
    d4out = d3out + (T,)
    w = jnp.asarray(rng.normal(size=(8, 5, 6)).astype(np.float32)) * 0.3

    out4 = strided_conv_sites(x4, kernel4, stride4, pad4, d4out, 1024)
    ref = strided_conv(x4, w, kernel4, stride4, pad4, out4)

    out3, n_sites, n_drop = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), d3out, 512
    )
    assert int(n_drop) == 0
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, out3.coords, out3.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=slab.capacity,
    )
    out3 = strided_occ(slab, tbl, out3)
    got = window_conv(slab, w, tbl, out3, (2, 2, 2, 1))

    # match site sets: oracle 4D valid sites <-> slab occupied slots
    c4 = np.asarray(out4.coords)
    v4 = np.asarray(out4.valid)
    keys3 = (c4[:, 2] * d3out[1] + c4[:, 1]) * d3out[0] + c4[:, 0]
    site_of4 = np.searchsorted(np.asarray(got.keys)[: int(n_sites)], keys3)
    slot_of4 = site_of4 * T + c4[:, 3]
    occ = np.asarray(got.occ).reshape(-1)
    assert occ[slot_of4[v4]].all()
    assert occ.sum() == v4.sum()
    np.testing.assert_allclose(
        np.asarray(got.feats).reshape(-1, 6)[slot_of4[v4]],
        np.asarray(ref.feats)[v4],
        atol=1e-4, rtol=1e-4,
    )


def test_inverse_s2k2_matches_oracle():
    rng = np.random.default_rng(5)
    x4, slab, slot_of4, v4mask = _random_4d(rng, 700, 2048, 1024)
    kernel4, stride4, pad4 = (2, 2, 2, 1), (2, 2, 2, 1), (0, 0, 0, 0)
    d3out = tuple(-(-d // 2) for d in DIMS3)
    d4out = d3out + (T,)
    wdn = jnp.asarray(rng.normal(size=(8, 5, 6)).astype(np.float32)) * 0.3
    wup = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32)) * 0.3

    # down then up, both engines
    out4 = strided_conv_sites(x4, kernel4, stride4, pad4, d4out, 1024)
    mid4 = strided_conv(x4, wdn, kernel4, stride4, pad4, out4)
    ref = inverse_conv(mid4, wup, kernel4, stride4, pad4, x4.sites())

    out3, n_mid, _ = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), d3out, 512
    )
    grid1 = site_grid(slab)
    tbl = window_tables(
        grid1, DIMS3, out3.coords, out3.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=slab.capacity,
    )
    out3 = strided_occ(slab, tbl, out3)
    mid3 = window_conv(slab, wdn, tbl, out3, (2, 2, 2, 1))

    grid2 = site_grid(mid3)
    pidx = parent_index(grid2, d3out, slab)
    got = inverse_s2k2_conv(mid3, wup, slab, pidx)

    np.testing.assert_allclose(
        np.asarray(got.feats).reshape(-1, 3)[slot_of4[v4mask]],
        np.asarray(ref.feats)[v4mask],
        atol=1e-4, rtol=1e-4,
    )


def test_3d_subm_and_strided_k3s2p1():
    """T=1 path (the 3D UNet): subm 3^3 and strided 3^3 s2 p1."""
    rng = np.random.default_rng(6)
    n, cap = 600, 1024
    coords3 = np.stack(
        [rng.integers(0, e, n) for e in DIMS3], axis=-1
    ).astype(np.int32)
    sites, _, _, _ = unique_voxels(
        jnp.asarray(coords3), DIMS3, cap, jnp.ones(n, bool),
        first_occurrence_cap=False,
    )
    cin = 7
    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    feats[~np.asarray(sites.valid)] = 0.0
    x3 = sites.replace_feats(jnp.asarray(feats))

    slab = Slab(
        keys=x3.keys, coords=x3.coords, occ=x3.valid[:, None],
        feats=x3.feats, valid=x3.valid, dims=DIMS3, T=1,
    )

    w = jnp.asarray(rng.normal(size=(27, cin, 6)).astype(np.float32)) * 0.2
    ref = subm_gather_conv(x3, w, (3, 3, 3))
    tbl = window_tables(
        site_grid(slab), DIMS3, slab.coords, slab.valid, (3, 3, 3), vin=cap
    )
    got = window_conv(slab, w, tbl, slab, (3, 3, 3))
    v = np.asarray(x3.valid)
    np.testing.assert_allclose(
        np.asarray(got.feats)[v], np.asarray(ref.feats)[v], atol=1e-4, rtol=1e-4
    )

    # strided 3^3 s2 p1 (UNet down conv)
    d3out = tuple(-(-d // 2) for d in DIMS3)
    w2 = jnp.asarray(rng.normal(size=(27, cin, 6)).astype(np.float32)) * 0.2
    out_o = strided_conv_sites(x3, (3, 3, 3), (2, 2, 2), (1, 1, 1), d3out, 512)
    ref2 = strided_conv(x3, w2, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_o)

    out_s, n_sites, _ = derive_strided_sites(
        slab, (3, 3, 3), (2, 2, 2), (1, 1, 1), d3out, 512
    )
    tbl2 = window_tables(
        site_grid(slab), DIMS3, out_s.coords, out_s.valid, (3, 3, 3),
        stride3=(2, 2, 2), pad3=(1, 1, 1), vin=cap,
    )
    out_s = strided_occ(slab, tbl2, out_s)
    got2 = window_conv(slab, w2, tbl2, out_s, (3, 3, 3))

    co = np.asarray(out_o.coords)
    vo = np.asarray(out_o.valid)
    keys = (co[:, 2] * d3out[1] + co[:, 1]) * d3out[0] + co[:, 0]
    pos = np.searchsorted(np.asarray(got2.keys)[: int(n_sites)], keys)
    np.testing.assert_allclose(
        np.asarray(got2.feats)[pos[vo]], np.asarray(ref2.feats)[vo],
        atol=1e-4, rtol=1e-4,
    )
    # site sets identical
    assert np.array_equal(
        np.sort(np.asarray(got2.keys)[np.asarray(got2.valid)]),
        np.sort(keys[vo]),
    )


def test_zonly_conv_113():
    """conv_out geometry: kernel (1,1,3) stride (1,1,2) pad 0."""
    rng = np.random.default_rng(8)
    n, cap = 500, 1024
    coords3 = np.stack(
        [rng.integers(0, e, n) for e in DIMS3], axis=-1
    ).astype(np.int32)
    sites, _, _, _ = unique_voxels(
        jnp.asarray(coords3), DIMS3, cap, jnp.ones(n, bool),
        first_occurrence_cap=False,
    )
    feats = rng.normal(size=(cap, 5)).astype(np.float32)
    feats[~np.asarray(sites.valid)] = 0.0
    x3 = sites.replace_feats(jnp.asarray(feats))
    slab = Slab(x3.keys, x3.coords, x3.valid[:, None], x3.feats, x3.valid, DIMS3, 1)

    dout = (DIMS3[0], DIMS3[1], (DIMS3[2] - 3) // 2 + 1)
    w = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32)) * 0.3
    out_o = strided_conv_sites(x3, (1, 1, 3), (1, 1, 2), (0, 0, 0), dout, 512)
    ref = strided_conv(x3, w, (1, 1, 3), (1, 1, 2), (0, 0, 0), out_o)

    out_s, n_sites, _ = derive_strided_sites(
        slab, (1, 1, 3), (1, 1, 2), (0, 0, 0), dout, 512
    )
    tbl = window_tables(
        site_grid(slab), DIMS3, out_s.coords, out_s.valid, (1, 1, 3),
        stride3=(1, 1, 2), pad3=(0, 0, 0), vin=cap,
    )
    out_s = strided_occ(slab, tbl, out_s)
    got = window_conv(slab, w, tbl, out_s, (1, 1, 3))

    co = np.asarray(out_o.coords)
    vo = np.asarray(out_o.valid)
    keys = (co[:, 2] * dout[1] + co[:, 1]) * dout[0] + co[:, 0]
    pos = np.searchsorted(np.asarray(got.keys)[: int(n_sites)], keys)
    np.testing.assert_allclose(
        np.asarray(got.feats)[pos[vo]], np.asarray(ref.feats)[vo],
        atol=1e-4, rtol=1e-4,
    )


def test_build_slab_overflow_counted():
    rng = np.random.default_rng(9)
    coords3 = np.stack(
        [rng.integers(0, e, 500) for e in DIMS3], axis=-1
    ).astype(np.int32)
    tcol = np.zeros(500, np.int32)
    _, _, n_sites_full, n_drop_full = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(500, dtype=bool),
        DIMS3, 1, 1024,
    )
    assert int(n_drop_full) == 0
    cap = int(n_sites_full) // 2
    slab, p2s, n_sites, n_drop = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(500, dtype=bool),
        DIMS3, 1, cap,
    )
    assert int(n_sites) == int(n_sites_full)
    assert int(n_drop) > 0
    # dropped points flagged -1
    assert (np.asarray(p2s) == -1).sum() == int(n_drop)


def test_gather_slots_roundtrip():
    rng = np.random.default_rng(10)
    coords3 = np.stack(
        [rng.integers(0, e, 300) for e in DIMS3], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, 300).astype(np.int32)
    slab, p2s, n_sites, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(300, dtype=bool),
        DIMS3, T, 512,
    )
    C = 3
    f = rng.normal(size=(512, T * C)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(f))
    slab = slab.replace_feats(slab.mask_feats())
    per_point = np.asarray(gather_slots(slab, jnp.asarray(p2s), C))
    # each point's features == its slab slot's features
    fl = np.asarray(slab.feats).reshape(512 * T, C)
    np.testing.assert_allclose(per_point, fl[np.asarray(p2s)], atol=0)


@pytest.mark.parametrize("chunk", [None, 512])
def test_conv_core_custom_vjp_matches_autodiff(chunk):
    """The memory-bounded custom VJP of the windowed conv core must equal
    direct autodiff of the same forward (_conv_core_fwd is plain JAX):
    full-scale training depends on the custom path (PERF.md)."""
    from insmos_tpu.sparse import slab as slab_mod

    rng = np.random.default_rng(7)
    _, slab, _, _ = _random_4d(rng, 900, 4096, 2048)
    kx = 3
    tbl = window_tables(
        site_grid(slab), DIMS3, slab.coords, slab.valid, (3, 3, 3),
        vin=slab.capacity,
    )
    cin, cout = 5, 6
    TC = T * cin
    G = tbl.wstart.shape[0]
    feats = jnp.asarray(slab.feats)  # (cap, T*cin), zeros off-occ
    wg = jnp.asarray(
        rng.normal(size=(G, kx * TC, T * cout)).astype(np.float32) * 0.1
    )
    gcot = jnp.asarray(
        rng.normal(size=(slab.capacity, T * cout)).astype(np.float32)
    )

    def loss_custom(f, w):
        out = slab_mod._conv_core(f, w, tbl.wstart, tbl.slotmap, kx, TC, chunk)
        return jnp.sum(out * gcot)

    def loss_direct(f, w):
        out = slab_mod._conv_core_fwd(
            f, w, tbl.wstart, tbl.slotmap, kx, TC, chunk
        )[0]
        return jnp.sum(out * gcot)

    v1, (df1, dw1) = jax.value_and_grad(loss_custom, argnums=(0, 1))(feats, wg)
    v2, (df2, dw2) = jax.value_and_grad(loss_direct, argnums=(0, 1))(feats, wg)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df1), np.asarray(df2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), atol=1e-4, rtol=1e-4)
