"""Pallas span-conv kernel vs the windowed XLA engine (oracle-chained).

Runs in pallas interpret mode on CPU. window_conv itself is verified
against the dense/sorted-key oracle in test_slab.py, so agreement here
chains span_conv to the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.sparse.slab import (
    build_slab,
    derive_strided_sites,
    site_grid,
    window_conv,
    window_tables,
)
from insmos_tpu.sparse import span_conv
from insmos_tpu.sparse.span_conv import span_conv_slab

DIMS3 = (16, 12, 10)
T = 4


@pytest.fixture()
def engine_mode():
    """Single production kernel path (the wide per-tap kernel). The
    packed-window variant was removed after measuring 2.5x slower
    end-to-end on hardware (PERF.md round-3 findings)."""
    return "wide"


def _random_slab(rng, n, cap, cin, ext=None):
    ext = ext or DIMS3
    coords3 = np.stack(
        [rng.integers(0, e, n) for e in ext], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    slab, _, n_sites, n_drop = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool), DIMS3, T, cap
    )
    assert int(n_drop) == 0
    feats = rng.normal(size=(cap, T * cin)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(feats))
    return slab.replace_feats(slab.mask_feats())


@pytest.mark.parametrize(
    "seed,n,kernel", [(0, 300, (3, 3, 3, 3)), (1, 1200, (3, 3, 3, 1)),
                      (2, 50, (3, 3, 3, 3)), (3, 500, (5, 5, 5, 1))]
)
def test_span_subm_matches_window(seed, n, kernel, engine_mode):
    rng = np.random.default_rng(seed)
    cin, cout = 5, 6
    slab = _random_slab(rng, n, 1024, cin)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32)) * 0.2

    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, slab.coords, slab.valid, kernel[:3], vin=slab.capacity
    )
    ref = window_conv(slab, w, tbl, slab, kernel)
    got, n_ovf = span_conv_slab(slab, w, slab, kernel)
    assert int(n_ovf) == 0
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_span_strided_matches_window(engine_mode):
    rng = np.random.default_rng(5)
    cin, cout = 5, 6
    slab = _random_slab(rng, 400, 1024, cin)
    kernel = (2, 2, 2, 1)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32)) * 0.2
    dims2 = tuple(-(-d // 2) for d in DIMS3)
    out, _, n_drop = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, 512
    )
    assert int(n_drop) == 0
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=slab.capacity,
    )
    ref = window_conv(slab, w, tbl, out, kernel)
    got, n_ovf = span_conv_slab(
        slab, w, out, kernel, stride3=(2, 2, 2), pad3=(0, 0, 0)
    )
    assert int(n_ovf) == 0
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_span_edge_sites(engine_mode):
    """Sites hugging grid edges: x-wrap aliases must not contribute."""
    coords3 = np.array(
        [[0, 0, 0], [15, 0, 0], [0, 11, 9], [15, 11, 9], [0, 5, 5],
         [15, 4, 5], [14, 4, 5], [1, 5, 5], [8, 0, 0], [0, 1, 0]],
        np.int32,
    )
    n = len(coords3)
    tcol = (np.arange(n) % T).astype(np.int32)
    rng = np.random.default_rng(11)
    slab, _, _, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool), DIMS3, T, 64
    )
    cin, cout = 3, 2
    slab = slab.replace_feats(
        jnp.asarray(rng.normal(size=(64, T * cin)).astype(np.float32))
    )
    slab = slab.replace_feats(slab.mask_feats())
    kernel = (3, 3, 3, 3)
    w = jnp.asarray(rng.normal(size=(81, cin, cout)).astype(np.float32))

    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, slab.coords, slab.valid, (3, 3, 3), vin=slab.capacity
    )
    ref = window_conv(slab, w, tbl, slab, kernel)
    got, _ = span_conv_slab(slab, w, slab, kernel)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_model_span_vs_window_engine():
    """Full-model parity: span (interpret) vs window engine, tiny config."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_model import tiny_config
    from insmos_tpu.nn import InsMOSModel

    cfg_w = tiny_config(window=3)
    cfg_s = dataclasses.replace(
        cfg_w, runtime=dataclasses.replace(cfg_w.runtime, sparse_engine="span")
    )
    # f32 compute so both engines accumulate identically-ish
    cfg_w = dataclasses.replace(
        cfg_w, runtime=dataclasses.replace(cfg_w.runtime, compute_dtype="float32", sparse_engine="window")
    )
    cfg_s = dataclasses.replace(
        cfg_s, runtime=dataclasses.replace(cfg_s.runtime, compute_dtype="float32")
    )

    from insmos_tpu.data.synthetic import write_synthetic_sequence
    import tempfile, os
    with tempfile.TemporaryDirectory() as root:
        write_synthetic_sequence(root, seq=8, n_scans=4, seed=5, n_ground=500, n_per_obj=40)
        from insmos_tpu.data.kitti import KittiWindowDataset
        ds = KittiWindowDataset(cfg_w, "val", root_dir=root, sequences=[8])
        sample = ds[0].arrays()

    model_w = InsMOSModel(cfg_w)
    model_s = InsMOSModel(cfg_s)
    params, state = model_w.init(jax.random.PRNGKey(0))
    out_w = jax.jit(lambda p, s, x: model_w.forward(p, s, x, train=False))(params, state, sample)
    out_s = jax.jit(lambda p, s, x: model_s.forward(p, s, x, train=False))(params, state, sample)
    assert int(np.asarray(out_s["overflow"]["span_overflow"]).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(out_s["point_logits"]), np.asarray(out_w["point_logits"]),
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["boxes"]), np.asarray(out_w["boxes"]), atol=1e-3, rtol=1e-2
    )


def test_span_dense_strided_narrow_span_jumbo_covers(engine_mode):
    """Dense strided conv: out-block key intervals include skipped
    interleaved rows, overflowing a narrow main span. The jumbo sentinel
    windows must certify coverage (n_overflow == 0) AND the conv must
    match the window oracle exactly; with jumbo disabled the counter must
    report the uncovered blocks instead."""
    rng = np.random.default_rng(9)
    cin, cout = 3, 4
    slab = _random_slab(rng, 2600, 2048, cin)
    del engine_mode  # both kernel paths must cover the jumbo tail
    kernel = (2, 2, 2, 1)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32)) * 0.2
    dims2 = tuple(-(-d // 2) for d in DIMS3)
    out, _, n_drop = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, 1024
    )
    assert int(n_drop) == 0
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=slab.capacity,
    )
    ref = window_conv(slab, w, tbl, out, kernel)

    from insmos_tpu.sparse.span_conv import make_span_plan

    nojumbo = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=0,
    )
    assert int(nojumbo.n_overflow) > 0  # narrow span drops (and reports)

    plan = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=64, gwin=8,
    )
    exact = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=64, gwin=8, exact_stats=True,
    )
    assert int(plan.n_overflow) == 0, int(plan.n_overflow)
    assert int(exact.n_overflow) == 0, int(exact.n_overflow)
    got = plan.conv(slab, w, out, kernel)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_span_greedy_budget_overflow_reported():
    """Jump pairs / windows beyond the greedy budgets -> the counter
    reports them (never silent)."""
    rng = np.random.default_rng(21)
    cin, cout = 3, 2
    slab = _random_slab(rng, 2600, 2048, cin)
    kernel = (2, 2, 2, 1)
    dims2 = tuple(-(-d // 2) for d in DIMS3)
    out, _, _ = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, 1024
    )
    from insmos_tpu.sparse.span_conv import make_span_plan

    full = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=128, gwin=8,
    )
    n_slots = int((np.asarray(full.gs)[1] >= 0).sum())
    assert n_slots > 1
    assert int(full.n_overflow) == 0
    # pair budget of 1: all but one jump pair's rows are reported
    tiny = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=128, gwin=8, pairs=1,
    )
    assert int(tiny.n_overflow) > 0
    # slot budget of 1 (pair budget unchanged): dropped slots are
    # reported conservatively, bs rows per unplaced window
    tiny2 = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=1, gwin=8, pairs=128,
    )
    assert int(tiny2.n_overflow) >= (n_slots - 1) * 64
    # gwin budget of 1: pairs needing more windows report uncovered rows
    tiny3 = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=64, bs=64,
        slots=128, gwin=1,
    )
    assert int(tiny3.n_overflow) >= 0  # may cover with 1 window/pair


def test_t_band_pruned_trailing_window():
    """3^4 t-kernel with a TRAILING slot window (t0_off > 0, T_out < T —
    the t-pruned inference schedule) must match the window oracle,
    including the fold's rectangular t-band."""
    from insmos_tpu.sparse.slab import slice_slots
    from insmos_tpu.sparse.span_conv import make_span_plan

    rng = np.random.default_rng(33)
    cin, cout = 4, 5
    slab = _random_slab(rng, 700, 1024, cin)
    kernel = (3, 3, 3, 3)
    w = jnp.asarray(rng.normal(size=(81, cin, cout)).astype(np.float32)) * 0.2
    out = slice_slots(slab, 2, T - 2)
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, slab.coords, slab.valid, (3, 3, 3), vin=slab.capacity
    )
    ref = window_conv(slab, w, tbl, out, kernel, t0_off=2)
    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, (3, 3, 3), in_dims=DIMS3,
        span=64, bs=64, slots=64, gwin=8,
    )
    got = plan.conv(slab, w, out, kernel, t0_off=2)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_conv_with_occ_matches_window_plus_occ():
    """Occ-folded strided conv == window strided conv + strided_occ."""
    from insmos_tpu.sparse.slab import strided_occ
    from insmos_tpu.sparse.span_conv import make_span_plan

    rng = np.random.default_rng(13)
    cin, cout = 5, 6
    slab = _random_slab(rng, 500, 1024, cin)
    kernel = (2, 2, 2, 1)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32)) * 0.2
    dims2 = tuple(-(-d // 2) for d in DIMS3)
    out, _, _ = derive_strided_sites(
        slab, (2, 2, 2), (2, 2, 2), (0, 0, 0), dims2, 512
    )
    grid = site_grid(slab)
    tbl = window_tables(
        grid, DIMS3, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), vin=slab.capacity,
    )
    ref_occ = strided_occ(slab, tbl, out)
    ref = window_conv(slab, w, tbl, ref_occ, kernel)

    plan = make_span_plan(
        slab.keys, out.coords, out.valid, (2, 2, 2),
        stride3=(2, 2, 2), pad3=(0, 0, 0), in_dims=DIMS3, span=256, bs=64,
    )
    got = plan.conv_with_occ(slab, w, out, kernel)
    np.testing.assert_array_equal(np.asarray(got.occ), np.asarray(ref_occ.occ))
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_span_dense_boundary_row_aliasing():
    """Regression: in a dense-ish grid, blocks whose sites straddle a z
    transition have NON-monotone raw query rows for shifted groups (an
    out-of-range row of slice z ties with in-range rows of slice z+1
    after naive clamping). The plan must anchor with jointly-clamped row
    indices or coverage certification silently passes on wrong output
    (found by tools-level fuzzing; 8 wrong sites with n_overflow == 0)."""
    rng = np.random.default_rng(0)
    dims = (48, 40, 12)
    cin, cout = 4, 4
    n, cap = 5000, 4096
    coords3 = np.stack(
        [rng.integers(0, d, n) for d in dims], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    slab, _, _, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool), dims, T, cap
    )
    occ = slab.valid[:, None] & jnp.ones((1, T), bool)
    feats = rng.normal(size=(cap, T * cin)).astype(np.float32)
    slab = slab.__class__(
        slab.keys, slab.coords, occ, jnp.asarray(feats), slab.valid, dims, T
    )
    slab = slab.replace_feats(slab.mask_feats())
    kernel = (3, 3, 3, 3)
    w = jnp.asarray(rng.normal(size=(81, cin, cout)).astype(np.float32)) * 0.2

    grid = site_grid(slab)
    tbl = window_tables(
        grid, dims, slab.coords, slab.valid, (3, 3, 3), vin=cap
    )
    ref = window_conv(slab, w, tbl, slab, kernel)

    from insmos_tpu.sparse.span_conv import make_span_plan

    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, (3, 3, 3), in_dims=dims,
        span=256, bs=128, slots=64, gwin=8,
    )
    exact = make_span_plan(
        slab.keys, slab.coords, slab.valid, (3, 3, 3), in_dims=dims,
        span=256, bs=128, slots=64, gwin=8, exact_stats=True,
    )
    assert int(plan.n_overflow) == 0
    assert int(exact.n_overflow) == 0
    got = plan.conv(slab, w, slab, kernel)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )


def test_block_cat_matches_cat_block():
    """basic_block_slab_cat (channel-split conv, no materialized cat) ==
    cat_slab + basic_block_slab_pruned on the same span plan."""
    from insmos_tpu.nn.blocks import init_basic_block
    from insmos_tpu.nn.blocks_slab import (
        basic_block_slab_cat,
        basic_block_slab_pruned,
        cat_slab,
    )
    from insmos_tpu.sparse.slab import slice_slots
    from insmos_tpu.sparse.span_conv import make_span_plan

    rng = np.random.default_rng(21)
    ca, cb, cout = 5, 3, 6
    slab = _random_slab(rng, 500, 1024, ca)
    fb = rng.normal(size=(slab.capacity, T * cb)).astype(np.float32)
    b = slab.replace_feats(jnp.asarray(fb))
    b = b.replace_feats(b.mask_feats())
    kernel = (3, 3, 3, 3)
    p, s = init_basic_block(
        jax.random.PRNGKey(3), kernel, ca + cb, cout, downsample=True
    )
    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, kernel[:3], in_dims=DIMS3,
        span=256, bs=64,
    )
    bn = dict(train=False, bn_args={"momentum": 0.1, "eps": 1e-5})
    mid = slice_slots(slab, 1, T - 1)
    out = slice_slots(slab, 2, T - 2)
    ref, _ = basic_block_slab_pruned(
        p, s, cat_slab(slab, b), kernel, plan, cat_slab(mid, slice_slots(b, 1, T - 1)),
        cat_slab(out, slice_slots(b, 2, T - 2)), t_off1=1, t_off2=1, **bn,
    )
    got, _ = basic_block_slab_cat(
        p, s, slab, b, kernel, plan, mid, out, t_off1=1, t_off2=1, **bn,
    )
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )

def test_residue_packed_stem_shape(engine_mode):
    """Residue-packed extraction (span_conv._residue_ok: kt=1, kx*T*cin
    <= 128): stem-shaped conv (kx=5, cin=1, T=10) must agree with the
    windowed oracle, including x-boundary sites where the multi-hot window
    clamp excludes wrapped next-row keys. Also A/B the escape hatch."""
    import os

    rng = np.random.default_rng(7)
    dims = (16, 12, 10)
    Tn, cin, cout = 10, 1, 8
    n, cap = 2500, 2048
    coords3 = np.stack(
        [rng.integers(0, d, n) for d in dims], axis=-1
    ).astype(np.int32)
    # force x-boundary coverage (window clamp / wrap-exclusion edge)
    coords3[:200, 0] = np.where(np.arange(200) % 2 == 0, 0, dims[0] - 1)
    tcol = rng.integers(0, Tn, n).astype(np.int32)
    slab, _, _, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool), dims,
        Tn, cap,
    )
    feats = rng.normal(size=(cap, Tn * cin)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(feats))
    slab = slab.replace_feats(slab.mask_feats())
    kernel = (5, 5, 5, 1)
    w = jnp.asarray(rng.normal(size=(125, cin, cout)).astype(np.float32)) * 0.2

    from insmos_tpu.sparse.span_conv import _residue_ok, ConvPart

    assert _residue_ok((ConvPart(cin, cout, Tn, 1, 0, 0),), 5, Tn * cin, 128)

    grid = site_grid(slab)
    tbl = window_tables(
        grid, dims, slab.coords, slab.valid, kernel[:3], vin=cap
    )
    ref = window_conv(slab, w, tbl, slab, kernel)
    got, n_ovf = span_conv_slab(slab, w, slab, kernel)
    assert int(n_ovf) == 0
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )

    # escape hatch runs the per-tap path and still agrees
    os.environ["INSMOS_RESIDUE"] = "0"
    try:
        jax.clear_caches()
        got2, _ = span_conv_slab(slab, w, slab, kernel)
    finally:
        del os.environ["INSMOS_RESIDUE"]
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(got2.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
    )
