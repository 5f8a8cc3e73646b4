"""Measure how many greedy-coverage rounds each DEPLOYED span plan needs
on the certified HDL-64E fixture (VERDICT round-5 glue trimming).

Each tier-2 greedy round costs ~n_iter (~19) tiny take dispatches (~1 us
each) even when no pair is uncovered — at gwin=48 across ~20 plans that is
~15-18 ms/step of pure dispatch overhead (round-5 trace: s32[64] x10922,
s32[1024] x24378 fusions). This probe binary-searches the minimal gwin
with n_overflow == 0 per plan so the deployed budgets can be cut to
measured-need + margin, guarded by the bench's hard overflow gate.

    JAX_PLATFORMS=cpu python tools/probe_gwin.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from insmos_tpu.config import Config
from insmos_tpu.data.hdl64 import make_hdl64_window
from insmos_tpu.sparse.slab import build_slab, derive_strided_sites
from insmos_tpu.sparse.span_conv import make_span_plan

_K3_STEM = (5, 5, 5)
_K3_DOWN = (2, 2, 2)
_K3_BLOCK = (3, 3, 3)
_S2 = (2, 2, 2)
_P0 = (0, 0, 0)


def min_gwin(name, keys, coords, valid, kernel3, **kw):
    lo = None
    for gwin in (4, 6, 8, 12, 16, 24, 32, 48, 64):
        plan = make_span_plan(
            keys, coords, valid, kernel3, gwin=gwin, **kw
        )
        ovf = int(plan.n_overflow)
        if ovf == 0:
            lo = gwin
            break
    import numpy as np

    live = int(np.sum(np.asarray(plan.gs[1]) >= 0)) if plan.gs.shape[1] else 0
    print(
        f"{name:14s} min_gwin={lo} ovf_prev={ovf} "
        f"live_slots={live}/{plan.gs.shape[1]} budget js={plan.js} jp={plan.jp}"
    )
    return lo


def main():
    cfg = Config()
    mc = cfg.model.motionnet
    dims1 = mc.grid_size
    caps = mc.site_capacities
    s = make_hdl64_window(cfg, seed=0)
    W, P = s["points"].shape[:2]
    pv = (
        np.arange(P)[None, :] < s["num_points"][:, None]
    ) & s["scan_mask"][:, None]
    lo3 = jnp.asarray(mc.crop_range[:3], jnp.float32)
    pts = jnp.asarray(s["points"])
    coords3 = jnp.floor(
        (pts[..., :3].reshape(W * P, 3) - lo3) * 10.0
    ).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(W * P)
    slab, _, n1, _ = build_slab(
        coords3, tcol, jnp.asarray(pv.reshape(W * P)), dims1, W, caps[0]
    )
    print(f"L1 sites: {int(n1)}")

    cdiv = lambda a, b: -(-a // b)
    dims = {1: dims1}
    slabs = {1: slab}
    for lvl, (fin, fout, cap) in enumerate(
        ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3]))
    ):
        dims[fout] = tuple(cdiv(d, fout) for d in dims1)
        s_in = slabs[fin]
        nxt, n_s, n_d = derive_strided_sites(
            s_in, _K3_DOWN, _S2, _P0, dims[fout], cap
        )
        assert int(n_d) == 0
        slots_b = {1: 6144, 2: 2048, 4: 1024}[fin]
        pairs_b = {1: 3072, 2: 1024, 4: 512}[fin]
        min_gwin(
            f"block L{fin}", s_in.keys, s_in.coords, s_in.valid, _K3_BLOCK,
            in_dims=dims[fin], bs=128, span=256, slots=slots_b, pairs=pairs_b,
        )
        min_gwin(
            f"down L{fin}->{fout}", s_in.keys, nxt.coords, nxt.valid,
            _K3_DOWN, stride3=_S2, pad3=_P0, in_dims=dims[fin], bs=128,
            span=256, slots={2: 4096, 4: 2048, 8: 1024}[fout],
            pairs={2: 2048, 4: 1024, 8: 512}[fout],
        )
        slabs[fout] = nxt
    min_gwin(
        "block L8", slabs[8].keys, slabs[8].coords, slabs[8].valid,
        _K3_BLOCK, in_dims=dims[8], bs=128, span=384, slots=256,
    )
    # incremental-mode stem plan over the single-scan slab
    c3_new = coords3.reshape(W, P, 3)[W - 1]
    nslab, _, _, nd = build_slab(
        c3_new, jnp.zeros((P,), jnp.int32), jnp.asarray(pv[W - 1]), dims1,
        1, mc.stem_scan_capacity,
    )
    assert int(nd) == 0
    min_gwin(
        "stem(scan)", nslab.keys, nslab.coords, nslab.valid, _K3_STEM,
        in_dims=dims1, span=256, slots=4096, pairs=2048,
    )
    # full-window stem plan (non-incremental CLI path)
    min_gwin(
        "stem(window)", slab.keys, slab.coords, slab.valid, _K3_STEM,
        in_dims=dims1, span=256, slots=12288, pairs=4096,
    )

    # ---- UNet plans (single current scan, voxelized) -------------------
    from insmos_tpu.sparse import strided_conv_sites, voxelize_points
    from insmos_tpu.sparse.slab import slab_from_sparse
    from insmos_tpu.sparse.tensor import SparseTensor

    cur = pts[W - 1]
    vox, _ = voxelize_points(
        jnp.concatenate([cur, jnp.zeros((P, 3), jnp.float32)], -1),
        jnp.asarray(pv[W - 1]), cfg.data.point_cloud_range,
        cfg.data.voxel_size, cfg.data.grid_size, cfg.model.unet_capacities[0],
        cfg.model.max_points_per_voxel,
    )
    cap_s = cfg.model.unet_site_capacity
    vox = SparseTensor(
        vox.coords[:cap_s], vox.keys[:cap_s], vox.feats[:cap_s],
        vox.valid[:cap_s], vox.dims,
    )
    ucaps = cfg.model.unet_capacities
    gxyz = cfg.data.grid_size
    udims = {s: tuple(cdiv(g, s) for g in gxyz) for s in (1, 2, 4, 8)}
    lvl_sites = {1: vox}
    uslab = {1: slab_from_sparse(vox)}
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        fin = stride // 2
        s_in = uslab[fin]
        sites, prs, kis = strided_conv_sites(
            lvl_sites[fin], (3, 3, 3), (2, 2, 2), (1, 1, 1), udims[stride],
            ucaps[lvl - 1], with_pairs=True,
        )
        lvl_sites[stride] = sites
        nxt = slab_from_sparse(sites.sites())
        min_gwin(
            f"unet blk L{fin}", s_in.keys, s_in.coords, s_in.valid,
            (3, 3, 3), in_dims=udims[fin], bs=128, span=256,
            slots={1: 1536, 2: 1024, 4: 512}[fin],
            pairs={1: 768, 2: 512, 4: 256}[fin],
        )
        min_gwin(
            f"unet dn {fin}->{stride}", s_in.keys, nxt.coords, nxt.valid,
            (3, 3, 3), stride3=(2, 2, 2), pad3=(1, 1, 1), in_dims=udims[fin],
            bs=128, span=384 if stride == 8 else 256,
            slots=2048 if stride < 8 else 1024,
            pairs=1024 if stride < 8 else 512,
        )
        uslab[stride] = nxt
    s8u = uslab[8]
    dims_out = (udims[8][0], udims[8][1], (udims[8][2] - 3) // 2 + 1)
    sites_out, _, _ = strided_conv_sites(
        lvl_sites[8], (1, 1, 3), (1, 1, 2), (0, 0, 0), dims_out, ucaps[4],
        with_pairs=True,
    )
    min_gwin(
        "unet blk L8", s8u.keys, s8u.coords, s8u.valid, (3, 3, 3),
        in_dims=udims[8], bs=128, span=384, slots=128,
    )
    min_gwin(
        "unet convout", s8u.keys, sites_out.sites().coords,
        sites_out.sites().valid, (1, 1, 3), stride3=(1, 1, 2),
        pad3=(0, 0, 0), in_dims=udims[8], bs=128, span=384, slots=512,
        pairs=256,
    )


if __name__ == "__main__":
    main()
