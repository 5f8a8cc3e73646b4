"""Measure the fraction of live (group, block) span-kernel pairs that are
provably EMPTY — no input key inside [min_query, max_query + kx) — on the
certified HDL-64E fixture, per deployed plan.

An empty pair's extraction + fold dots contribute exact zeros; the plan
already bisects both interval ends, so an empty bit is free at plan time
and the kernel can skip the pair's compute (DMAs stay branch-free).
This probe quantifies the skippable fraction BEFORE building the kernel
change (round-5 lever E).

    JAX_PLATFORMS=cpu python tools/probe_empty_pairs.py
"""

from __future__ import annotations

import math
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
from insmos_tpu.sparse.span_conv import _bisect, _plan_ctx

_K3_STEM = (5, 5, 5)
_K3_DOWN = (2, 2, 2)
_K3_BLOCK = (3, 3, 3)
_S2 = (2, 2, 2)
_P0 = (0, 0, 0)


def empty_frac(name, keys, coords, valid, kernel3, stride3=(1, 1, 1),
               pad3=None, in_dims=None, span=256, bs=128, tcp=128, top=128):
    firsts, lasts_kx, ctx = _plan_ctx(
        coords, valid, kernel3, stride3, pad3, in_dims, span, bs, 0, 12, 0,
        keys.shape[0],
    )
    n_iter = max(1, math.ceil(math.log2(keys.shape[0] + 1)))
    pos2 = _bisect(keys, jnp.stack([firsts, lasts_kx]), n_iter)
    p0, p1 = np.asarray(pos2[0]), np.asarray(pos2[1])
    nvalid = np.asarray(ctx["nvalid_blk"])  # (NB,)
    live = nvalid > 0
    G = p0.shape[0]
    live_pairs = int(live.sum()) * G
    empty = (p1 <= p0) & live[None, :]
    n_empty = int(empty.sum())
    # cost model: ext = kx*span*tcp flops-ish per pair, fold = kx*tcp*top
    kx = kernel3[0]
    cost = kx * (span * tcp + tcp * top)
    print(
        f"{name:16s} G={G:3d} live_blocks={int(live.sum()):5d} "
        f"pairs={live_pairs:7d} empty={n_empty:7d} "
        f"({100.0 * n_empty / max(live_pairs, 1):5.1f}%) "
        f"skippable_gflop={n_empty * cost * 2 / 1e9:7.1f}"
    )
    return n_empty, live_pairs


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
    tot_e = tot_p = 0
    for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
        dims[fout] = tuple(cdiv(d, fout) for d in dims1)
        s_in = slabs[fin]
        nxt, n_s, n_d = derive_strided_sites(
            s_in, _K3_DOWN, _S2, _P0, dims[fout], cap
        )
        e, p = empty_frac(
            f"block L{fin}", s_in.keys, s_in.coords, s_in.valid, _K3_BLOCK,
            in_dims=dims[fin],
        )
        tot_e += e; tot_p += p
        e, p = empty_frac(
            f"down L{fin}->{fout}", s_in.keys, nxt.coords, nxt.valid,
            _K3_DOWN, stride3=_S2, pad3=_P0, in_dims=dims[fin],
        )
        tot_e += e; tot_p += p
        slabs[fout] = nxt
    e, p = empty_frac(
        "block L8", slabs[8].keys, slabs[8].coords, slabs[8].valid,
        _K3_BLOCK, in_dims=dims[8], span=384,
    )
    tot_e += e; tot_p += p
    # incremental stem plan (deployed headline path)
    c3_new = coords3.reshape(W, P, 3)[W - 1]
    nslab, _, _, nd = build_slab(
        c3_new, jnp.zeros((P,), jnp.int32), jnp.asarray(pv[W - 1]), dims1,
        1, mc.stem_scan_capacity,
    )
    e, p = empty_frac(
        "stem(scan)", nslab.keys, nslab.coords, nslab.valid, _K3_STEM,
        in_dims=dims1,
    )
    tot_e += e; tot_p += p

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
    udims = {st: tuple(cdiv(g, st) for g in gxyz) for st in (1, 2, 4, 8)}
    lvl_sites = {1: vox}
    uslab = {1: slab_from_sparse(vox)}
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        fin = stride // 2
        s_in = uslab[fin]
        sites, _, _ = strided_conv_sites(
            lvl_sites[fin], (3, 3, 3), (2, 2, 2), (1, 1, 1), udims[stride],
            ucaps[lvl - 1], with_pairs=True,
        )
        lvl_sites[stride] = sites
        nxt = slab_from_sparse(sites.sites())
        e, p = empty_frac(
            f"unet blk L{fin}", s_in.keys, s_in.coords, s_in.valid,
            _K3_BLOCK, in_dims=udims[fin],
        )
        tot_e += e; tot_p += p
        e, p = empty_frac(
            f"unet dn L{fin}", s_in.keys, nxt.coords, nxt.valid, _K3_BLOCK,
            stride3=_S2, pad3=(1, 1, 1), in_dims=udims[fin],
        )
        tot_e += e; tot_p += p
        uslab[stride] = nxt
    e, p = empty_frac(
        "unet blk L8", uslab[8].keys, uslab[8].coords, uslab[8].valid,
        _K3_BLOCK, in_dims=udims[8], span=384,
    )
    tot_e += e; tot_p += p
    print(f"TOTAL pairs={tot_p} empty={tot_e} ({100.0 * tot_e / tot_p:.1f}%)")


if __name__ == "__main__":
    main()
