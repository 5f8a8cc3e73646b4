"""Banded-fold tile-skipping coverage (ADVICE round-3 findings #1/#2).

The fold tilemap (_fold_tilemap / _fold_dot) only activates at
T*cin >= 256: every other span test's TCP is a single 128-lane tile, the
map is fully dense, and _fold_tilemap returns None — so without these
tests the tile-skipping kernel code would be dead in CI. Pinned here:

(a) the tilemap IS non-None at flagship-like shapes (T=8, cin=64, kt=3
    band — the regime PERF.md names as the L4/L8 t-band inflation),
(b) the tile-skipping path matches the dense-fold path on both the main
    and the jumbo kernel (interpret mode chains to the window oracle via
    test_span_conv),
(c) the path is OFF by default — it is hardware-unvalidated, and the
    precedent (INSMOS_PACKED: fewer FLOPs on paper, 2.5x slower measured)
    says unmeasured hot-path kernels must be opt-in (INSMOS_TILEMAP=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.sparse import span_conv
from insmos_tpu.sparse.slab import build_slab
from insmos_tpu.sparse.span_conv import (
    ConvPart,
    _fold_tilemap,
    make_span_plan,
)

T = 8
CIN, COUT = 64, 32


def _slab(rng, n, cap, cin, dims):
    coords3 = np.stack(
        [rng.integers(0, e, n) for e in dims], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    slab, _, _, n_drop = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool),
        dims, T, cap,
    )
    assert int(n_drop) == 0
    feats = rng.normal(size=(cap, T * cin)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(feats))
    return slab.replace_feats(slab.mask_feats())


def _run_both(slab, weight, kernel, plan):
    """Conv once with the tilemap disabled, once enabled (fresh traces)."""
    outs = {}
    for enabled in (False, True):
        jax.clear_caches()  # span_conv_parts is jitted; retrace per mode
        span_conv._tilemap_enabled_orig = span_conv._tilemap_enabled
        span_conv._tilemap_enabled = lambda: enabled
        try:
            outs[enabled] = np.asarray(
                plan.conv(slab, weight, slab, kernel).feats
            )
        finally:
            span_conv._tilemap_enabled = span_conv._tilemap_enabled_orig
    return outs[False], outs[True]


def test_tilemap_off_by_default(monkeypatch):
    monkeypatch.delenv("INSMOS_TILEMAP", raising=False)
    assert span_conv._tilemap_enabled() is False
    monkeypatch.setenv("INSMOS_TILEMAP", "1")
    assert span_conv._tilemap_enabled() is True


def test_tilemap_nonnone_at_flagship_shape():
    # T*cin = 512 -> TCP = 512 (4 row tiles per tap); kt=3 t-band zeroes
    # the far-off-diagonal (t_in, t_out) blocks -> sparse tile map
    part = ConvPart(CIN, COUT, T, kt=3)
    tm = _fold_tilemap((part,), kx=3, T_out=T, TCP=512, TOP=256)
    assert tm is not None
    m = np.asarray(tm)
    assert m.shape == (3 * 4, 2)
    assert m.any() and not m.all()


def test_fold_matches_dense_main_kernel():
    """T=8, cin=64, kernel (3,3,3,3): the ADVICE-prescribed shape."""
    rng = np.random.default_rng(7)
    dims = (16, 12, 10)
    slab = _slab(rng, 700, 1024, CIN, dims)
    kernel = (3, 3, 3, 3)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, CIN, COUT)).astype(np.float32)) * 0.1

    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, kernel[:3], in_dims=dims
    )
    assert int(plan.n_overflow) == 0
    # the shape must actually produce a tilemap on the enabled path
    assert _fold_tilemap(
        (ConvPart(CIN, COUT, T, kt=3),), 3, T, 512, 256
    ) is not None
    dense, tiled = _run_both(slab, w, kernel, plan)
    np.testing.assert_allclose(tiled, dense, atol=1e-4, rtol=1e-4)


def test_fold_matches_dense_jumbo_kernel():
    """Sparse site set + span=64, bs=128 forces jumbo blocks, so the
    enabled path also runs _fold_dot inside the jumbo kernel."""
    rng = np.random.default_rng(11)
    dims = (32, 32, 16)
    slab = _slab(rng, 900, 1024, CIN, dims)
    kernel = (3, 3, 3, 3)
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, CIN, COUT)).astype(np.float32)) * 0.1

    plan = make_span_plan(
        slab.keys, slab.coords, slab.valid, kernel[:3], in_dims=dims,
        span=64, bs=128, slots=256, gwin=8,
    )
    assert int(jnp.sum(plan.gs[1] >= 0)) > 0, "no coverage slots materialized"
    assert int(plan.n_overflow) == 0
    dense, tiled = _run_both(slab, w, kernel, plan)
    np.testing.assert_allclose(tiled, dense, atol=1e-4, rtol=1e-4)
