"""Brick engine vs the sorted-key engine: results must be identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.sparse import SparseTensor, subm_gather_conv, unique_voxels
from insmos_tpu.sparse.bricks import (
    BX,
    brick_neighbor_table,
    bricks_to_voxel_feats,
    build_bricks,
    subm_conv_bricks,
)


def _rand_sparse(rng, dims, n, c, capacity=None):
    capacity = capacity or 2 * n
    total = int(np.prod(dims))
    flat = rng.choice(total, size=n, replace=False)
    coords = []
    rem = flat
    for d in dims:
        coords.append(rem % d)
        rem = rem // d
    coords = np.stack(coords, axis=-1).astype(np.int32)
    sites, p2v, _, _ = unique_voxels(jnp.asarray(coords), dims, capacity)
    feats = np.zeros((capacity, c), np.float32)
    feats[np.asarray(p2v)] = rng.normal(size=(n, c)).astype(np.float32)
    return SparseTensor(
        sites.coords, sites.keys, jnp.asarray(feats), sites.valid, tuple(dims)
    )


def test_build_bricks_roundtrip(rng):
    dims = (32, 7, 5)
    x = _rand_sparse(rng, dims, 60, 3)
    b = build_bricks(x, brick_capacity=80)
    # every valid voxel maps into its brick slot and features round-trip
    back = np.asarray(bricks_to_voxel_feats(b))
    np.testing.assert_allclose(back, np.asarray(x.masked_feats()), atol=1e-6)
    # occupancy count matches voxel count
    assert int(b.occ.sum()) == int(x.valid.sum())
    # slots are direct-mapped: coords x % BX
    keys = np.asarray(x.keys)
    vf = np.asarray(b.v_flat)
    valid = np.asarray(x.valid)
    np.testing.assert_array_equal(vf[valid] % BX, keys[valid] % BX)


@pytest.mark.parametrize(
    "dims,kernel,n,c_in,c_out",
    [
        ((32, 8, 6), (3, 3, 3), 80, 5, 7),
        pytest.param((48, 6, 4), (5, 5, 5), 100, 1, 8, marks=pytest.mark.slow),
        pytest.param((32, 6, 4, 3), (3, 3, 3, 3), 90, 4, 6, marks=pytest.mark.slow),
        pytest.param((32, 5, 4, 3), (5, 5, 5, 1), 70, 1, 8, marks=pytest.mark.slow),
    ],
)
def test_subm_conv_bricks_matches_reference_engine(rng, dims, kernel, n, c_in, c_out):
    x = _rand_sparse(rng, dims, n, c_in)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, c_in, c_out)).astype(np.float32))

    ref = subm_gather_conv(x, w, kernel)
    ref_feats = np.asarray(ref.masked_feats())

    b = build_bricks(x, brick_capacity=x.capacity)
    tbl = brick_neighbor_table(b, kernel)
    out_b = subm_conv_bricks(b, w, kernel, tbl)
    got = np.asarray(bricks_to_voxel_feats(out_b))
    np.testing.assert_allclose(got, ref_feats, atol=2e-4)


@pytest.mark.slow
def test_subm_conv_bricks_chunked(rng):
    dims = (32, 8, 4)
    x = _rand_sparse(rng, dims, 64, 3, capacity=128)
    w = jnp.asarray(rng.normal(size=(27, 3, 4)).astype(np.float32))
    b = build_bricks(x, brick_capacity=128)
    tbl = brick_neighbor_table(b, (3, 3, 3))
    full = np.asarray(bricks_to_voxel_feats(subm_conv_bricks(b, w, (3, 3, 3), tbl)))
    chunked = np.asarray(
        bricks_to_voxel_feats(subm_conv_bricks(b, w, (3, 3, 3), tbl, chunk=32))
    )
    np.testing.assert_allclose(full, chunked, atol=1e-6)


@pytest.mark.slow
def test_x_halo_across_brick_boundary(rng):
    """Two voxels in adjacent bricks of the same row must see each other."""
    dims = (32, 4, 4)
    coords = jnp.asarray([[15, 1, 1], [16, 1, 1]])  # brick boundary pair
    sites, p2v, _, _ = unique_voxels(coords, dims, 8)
    feats = jnp.zeros((8, 1)).at[p2v].set(jnp.asarray([[1.0], [2.0]]))
    x = SparseTensor(sites.coords, sites.keys, feats, sites.valid, dims)
    w = jnp.zeros((27, 1, 1))
    # offset (+1, 0, 0): canonical x-fastest enumeration -> index 14
    w = w.at[14].set(1.0)
    ref = np.asarray(subm_gather_conv(x, w, (3, 3, 3)).masked_feats())
    b = build_bricks(x, 8)
    tbl = brick_neighbor_table(b, (3, 3, 3))
    got = np.asarray(bricks_to_voxel_feats(subm_conv_bricks(b, w, (3, 3, 3), tbl)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # voxel at x=15 sees x=16 (value 2); voxel at 16 sees nothing at 17
    assert got[np.asarray(p2v)[0], 0] == pytest.approx(2.0)
    assert got[np.asarray(p2v)[1], 0] == pytest.approx(0.0)

def test_cross_segment_fallback_repro():
    """VERDICT round-1 repro: neighbour row with empty center segment but
    voxels in BOTH side segments — all contributions must be found.

    Voxels (31,1,1)/(15,0,1)/(32,0,1) on dims (48,3,3): the query (31,1,1)
    sits at x-segment 1; its neighbour row (y=0) has voxels only in
    segments 0 and 2. A 3^3 all-ones kernel must sum every neighbour.
    """
    dims = (48, 3, 3)
    coords = jnp.asarray([[31, 1, 1], [15, 0, 1], [32, 0, 1]])
    sites, p2v, _, _ = unique_voxels(coords, dims, 8)
    feats = jnp.zeros((8, 1)).at[p2v].set(jnp.asarray([[1.0], [0.5], [100.0]]))
    x = SparseTensor(sites.coords, sites.keys, feats, sites.valid, dims)
    w = jnp.ones((27, 1, 1))
    ref = np.asarray(subm_gather_conv(x, w, (3, 3, 3)).masked_feats())
    b = build_bricks(x, 8)
    tbl = brick_neighbor_table(b, (3, 3, 3))
    got = np.asarray(bricks_to_voxel_feats(subm_conv_bricks(b, w, (3, 3, 3), tbl)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # the query must see itself (1.0) + (32,0,1)'s 100.0; (15,0,1) at x=15
    # is outside the 3-wide window of x=31
    assert got[np.asarray(p2v)[0], 0] == pytest.approx(101.0)


def test_both_side_segments_no_center():
    """Query's window straddles its own segment boundary while the
    neighbour row's center segment is empty on both sides of the seam."""
    dims = (48, 3, 3)
    # query at x=16 (segment 1 start): window x in {15,16,17}
    # neighbour row voxels at x=15 (seg 0) and x=17 (seg 1)... make seg 1
    # empty instead: x=15 (seg 0) and x=32 would be out of window; use a
    # second query at x=15 (seg 0 end) with neighbour at x=16 (seg 1).
    coords = jnp.asarray([[16, 1, 1], [15, 0, 1], [17, 0, 1], [15, 2, 1]])
    sites, p2v, _, _ = unique_voxels(coords, dims, 8)
    vals = jnp.asarray([[1.0], [10.0], [100.0], [1000.0]])
    feats = jnp.zeros((8, 1)).at[p2v].set(vals)
    x = SparseTensor(sites.coords, sites.keys, feats, sites.valid, dims)
    w = jnp.ones((27, 1, 1))
    ref = np.asarray(subm_gather_conv(x, w, (3, 3, 3)).masked_feats())
    b = build_bricks(x, 8)
    tbl = brick_neighbor_table(b, (3, 3, 3))
    got = np.asarray(bricks_to_voxel_feats(subm_conv_bricks(b, w, (3, 3, 3), tbl)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # query sees itself + 10 + 100 + 1000
    assert got[np.asarray(p2v)[0], 0] == pytest.approx(1111.0)


@pytest.mark.parametrize(
    "dims,kernel,density,seed",
    [
        # sparse-row regime: <1 voxel per (y,z[,t]) row on average — the
        # measured real-data regime at fine 4D levels (PERF.md), where the
        # round-1 fallback bug was common
        ((64, 12, 8), (3, 3, 3), 0.4, 0),
        pytest.param((64, 12, 8), (3, 3, 3), 0.4, 1, marks=pytest.mark.slow),
        pytest.param((64, 12, 8), (5, 5, 5), 0.7, 2, marks=pytest.mark.slow),
        pytest.param((64, 8, 6, 4), (3, 3, 3, 3), 0.5, 3, marks=pytest.mark.slow),
        pytest.param((64, 8, 6, 4), (5, 5, 5, 1), 0.5, 4, marks=pytest.mark.slow),
        pytest.param((64, 8, 6, 4), (3, 3, 3, 3), 0.9, 5, marks=pytest.mark.slow),
    ],
)
def test_sparse_row_regime_matches_oracle(dims, kernel, density, seed):
    """Random tests at <1 voxel/row density over 3^3/3^4/(5,5,5,1) kernels:
    the brick engine must match the sorted-key oracle bit-for-bit."""
    rng = np.random.default_rng(seed)
    n_rows = int(np.prod(dims[1:]))
    n = max(8, int(n_rows * density))
    c_in, c_out = 3, 4
    x = _rand_sparse(rng, dims, n, c_in)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, c_in, c_out)).astype(np.float32))
    ref = np.asarray(subm_gather_conv(x, w, kernel).masked_feats())
    b = build_bricks(x, x.capacity)
    tbl = brick_neighbor_table(b, kernel)
    got = np.asarray(bricks_to_voxel_feats(subm_conv_bricks(b, w, kernel, tbl)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
