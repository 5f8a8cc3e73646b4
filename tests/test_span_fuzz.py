"""Randomized span-engine certification fuzz (slow, interpret mode).

Property under test: for ANY site set / kernel geometry / (bs, span,
slots, gwin) configuration, `make_span_plan.n_overflow == 0` implies the
span conv EXACTLY matches the window-engine oracle; when it is nonzero it
must never be silently wrong (we only check the implication, which is the
bench gate's contract). This is the property whose violation produced the
grid-boundary row-aliasing bug (test_span_conv.py regression).
"""

import dataclasses

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
from insmos_tpu.sparse.span_conv import make_span_plan

pytestmark = pytest.mark.slow

CASES = [
    # seed, dims, n_pts, T, kernel4, strided, bs, span, slots, gwin
    (0, (32, 28, 8), 3000, 3, (3, 3, 3, 3), False, 64, 128, 16, 2),
    (1, (48, 40, 12), 6000, 2, (3, 3, 3, 1), False, 128, 256, 16, 2),
    (2, (20, 18, 14), 1500, 4, (5, 5, 5, 1), False, 64, 192, 16, 3),
    (3, (40, 30, 10), 4000, 3, (2, 2, 2, 1), True, 64, 64, 24, 4),
    (4, (64, 20, 6), 2500, 2, (3, 3, 3, 3), True, 64, 128, 24, 3),
    (5, (16, 16, 16), 2000, 5, (3, 3, 3, 3), False, 32, 128, 16, 2),
    (6, (80, 12, 4), 1200, 3, (3, 3, 3, 1), False, 64, 128, 16, 2),
    (7, (24, 24, 24), 5000, 2, (2, 2, 2, 1), True, 128, 128, 32, 5),
]


@pytest.mark.parametrize(
    "seed,dims,n,T,kernel,strided,bs,span,slots,gwin", CASES
)
def test_certified_plans_are_exact(
    seed, dims, n, T, kernel, strided, bs, span, slots, gwin
):
    rng = np.random.default_rng(seed)
    cin, cout = 3, 4
    cap = 1 << int(np.ceil(np.log2(n)))
    coords3 = np.stack(
        [rng.integers(0, d, n) for d in dims], axis=-1
    ).astype(np.int32)
    tcol = rng.integers(0, T, n).astype(np.int32)
    slab, _, _, _ = build_slab(
        jnp.asarray(coords3), jnp.asarray(tcol), jnp.ones(n, bool), dims, T, cap
    )
    feats = rng.normal(size=(cap, T * cin)).astype(np.float32)
    slab = slab.replace_feats(jnp.asarray(feats))
    slab = slab.replace_feats(slab.mask_feats())
    K = int(np.prod(kernel))
    w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32)) * 0.2

    if strided:
        s3, p3 = (2, 2, 2), (0, 0, 0)
        dims_o = tuple(-(-d // 2) for d in dims)
        out, _, ndrop = derive_strided_sites(
            slab, kernel[:3], s3, p3, dims_o, cap
        )
        assert int(ndrop) == 0
    else:
        s3, p3 = (1, 1, 1), None
        out = slab

    grid = site_grid(slab)
    tbl = window_tables(
        grid, dims, out.coords, out.valid, kernel[:3],
        stride3=s3, pad3=p3, vin=cap,
    )
    ref = window_conv(slab, w, tbl, out, kernel)

    plan = make_span_plan(
        slab.keys, out.coords, out.valid, kernel[:3], stride3=s3, pad3=p3,
        in_dims=dims, span=span, bs=bs, slots=slots, gwin=gwin,
    )
    exact = make_span_plan(
        slab.keys, out.coords, out.valid, kernel[:3], stride3=s3, pad3=p3,
        in_dims=dims, span=span, bs=bs, slots=slots, gwin=gwin,
        exact_stats=True,
    )
    ovf, ex = int(plan.n_overflow), int(exact.n_overflow)
    # the production counter must never under-report the exact count
    assert (ovf == 0) <= (ex == 0), (ovf, ex)
    if ovf == 0:
        got = plan.conv(slab, w, out, kernel)
        np.testing.assert_allclose(
            np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
        )
    else:
        # widen coverage until certified, then exactness must hold
        plan2 = make_span_plan(
            slab.keys, out.coords, out.valid, kernel[:3], stride3=s3,
            pad3=p3, in_dims=dims, span=2 * span, bs=bs,
            slots=4 * slots, gwin=2 * gwin,
        )
        assert int(plan2.n_overflow) == 0, int(plan2.n_overflow)
        got = plan2.conv(slab, w, out, kernel)
        np.testing.assert_allclose(
            np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4, rtol=1e-4
        )
