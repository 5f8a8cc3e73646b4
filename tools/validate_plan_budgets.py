"""CPU validation of every span plan's coverage budgets on the bench's
exact stream worlds (all 4 multi-stream seeds), WITHOUT a TPU compile.

Replays make_stream through the window roll + slab/site derivation +
plan construction (the deployed budgets in minkunet4d/unet3d) and asserts
n_overflow == 0 per plan per step. A budget regression fails HERE in
minutes instead of after a 30-minute TPU compile cycle.

    JAX_PLATFORMS=cpu python tools/validate_plan_budgets.py [n_seeds] [n_steps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    from bench import _bench_cfg, make_stream
    from insmos_tpu.nn.minkunet4d import motionnet_forward
    from insmos_tpu.nn.model import InsMOSModel

    cfg = _bench_cfg()
    # force the span engine on CPU; plans build in XLA, kernels never run
    # because we only trace to extract the overflow stats via real eval of
    # the plan-construction subgraph (motionnet_forward runs fully — slow
    # kernels in interpret mode are skipped by running ONLY plan building
    # below instead of the full forward).
    cfg = dataclasses.replace(
        cfg, runtime=dataclasses.replace(cfg.runtime, sparse_engine="span")
    )
    W = cfg.model.n_past_steps
    P = cfg.runtime.max_points_per_scan
    mc = cfg.model.motionnet

    from insmos_tpu.sparse.slab import (
        Slab, build_slab, compact_rows, derive_strided_sites, dilate_mask,
        linearize3, take_rows,
    )
    from insmos_tpu.sparse.span_conv import make_span_plan, make_span_plans
    from insmos_tpu.sparse.tensor import KEY_SENTINEL

    bad = 0
    for seed in range(n_seeds):
        scans, ns, tfs, shifts = make_stream(cfg, n_steps, seed=seed)
        win = np.zeros((W, P, 4), np.float32)
        nums = np.zeros((W,), np.int32)
        mask = np.zeros((W,), bool)
        for step in range(n_steps):
            tf = np.asarray(tfs[step])
            win[:, :, :3] = win[:, :, :3] @ tf[:3, :3].T + tf[None, None, :3, 3]
            win = np.roll(win, -1, axis=0)
            nums = np.roll(nums, -1)
            mask = np.roll(mask, -1)
            win[W - 1] = np.asarray(scans[step])
            nums[W - 1] = int(ns[step])
            mask[W - 1] = True
            if step < W - 1 or step % 4 != W % 4:
                continue  # validate full windows, every 4th step
            ovf = check_plans(
                cfg, jnp.asarray(win), jnp.asarray(nums), jnp.asarray(mask)
            )
            for name, v in ovf:
                v = int(v)
                if v != 0:
                    bad += 1
                    print(f"seed{seed} step{step}: {name} overflow={v}")
        print(f"seed {seed}: done")
    print("FAIL" if bad else "OK: all plans cover exactly on all streams")
    sys.exit(1 if bad else 0)


def check_plans(cfg, pts, nums, mask):
    """Build every deployed plan for this window; return [(name, ovf)]."""
    from insmos_tpu.nn.minkunet4d import (
        _K3_BLOCK, _K3_DOWN, _K3_STEM, _P0, _S2,
    )
    from insmos_tpu.sparse.slab import (
        build_slab, compact_rows, derive_strided_sites, dilate_mask,
        linearize3, take_rows,
    )
    from insmos_tpu.sparse.span_conv import make_span_plan
    from insmos_tpu.sparse.tensor import KEY_SENTINEL

    mc = cfg.model.motionnet
    W, P = pts.shape[:2]
    pv = (jnp.arange(P)[None, :] < nums[:, None]) & mask[:, None]
    dims1 = mc.grid_size
    caps = mc.site_capacities
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor(
        (pts[..., :3].reshape(W * P, 3) - lo) * 10.0
    ).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(W * P)
    out = []
    slab1, _, _, d1 = build_slab(
        coords3, tcol, pv.reshape(W * P), dims1, W, caps[0]
    )
    out.append(("slab1_drop", d1))
    cdiv = lambda a, b: -(-a // b)
    dims = {1: dims1}
    slabs = {1: slab1}
    for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
        dims[fout] = tuple(cdiv(d, fout) for d in dims1)
        s_in = slabs[fin]
        nxt, _, nd = derive_strided_sites(
            s_in, _K3_DOWN, _S2, _P0, dims[fout], cap
        )
        out.append((f"sites_drop L{fout}", nd))
        if fin != 1:
            p = make_span_plan(
                s_in.keys, s_in.coords, s_in.valid, _K3_BLOCK,
                in_dims=dims[fin], bs=128, span=192,
                slots={2: 1536, 4: 512}[fin],
                gwin={2: 32, 4: 24}[fin], pairs={2: 1024, 4: 512}[fin],
            )
            out.append((f"motion block L{fin}", p.n_overflow))
        p = make_span_plan(
            s_in.keys, nxt.coords, nxt.valid, _K3_DOWN, stride3=_S2,
            pad3=_P0, in_dims=dims[fin], bs=128, span=256,
            slots={2: 1024, 4: 512, 8: 384}[fout], gwin=24,
            pairs={2: 2048, 4: 1024, 8: 512}[fout],
        )
        out.append((f"motion down L{fout}", p.n_overflow))
        slabs[fout] = nxt
    p = make_span_plan(
        slabs[8].keys, slabs[8].coords, slabs[8].valid, _K3_BLOCK,
        in_dims=dims[8], bs=128, span=384, slots=128, gwin=8,
    )
    out.append(("motion block L8", p.n_overflow))
    # incremental-stem scan plan
    c3_new = coords3.reshape(W, P, 3)[W - 1]
    nslab, _, _, nd = build_slab(
        c3_new, jnp.zeros((P,), jnp.int32), pv[W - 1], dims1, 1,
        mc.stem_scan_capacity,
    )
    out.append(("stem_scan_drop", nd))
    p = make_span_plan(
        nslab.keys, nslab.coords, nslab.valid, _K3_STEM, in_dims=dims1,
        span=192, slots=3072, gwin=40, pairs=2560,
    )
    out.append(("stem(scan)", p.n_overflow))
    # decoder-pruned plans (deployed budgets)
    dcaps = [min(c, s) for c, s in zip(mc.decoder_capacities, caps[:3])]

    def sel(slab_l, skeys, ssel, dimsL, cap):
        m = dilate_mask(skeys, ssel, dimsL, 2, slab_l.keys, slab_l.valid)
        idx, nov = compact_rows(m, cap)
        keys = jnp.where(
            idx >= 0, jnp.take(slab_l.keys, jnp.maximum(idx, 0)), KEY_SENTINEL
        )
        return keys, take_rows(slab_l.coords, idx), idx >= 0, nov

    s1 = slabs[1]
    k1, c1, v1, nov = sel(
        s1, s1.keys, s1.occ[:, W - 1] & s1.valid, dims[1], dcaps[0]
    )
    out.append(("dec halo L1 drop", nov))
    k2, c2, v2, nov = sel(
        slabs[2], linearize3(c1 // 2, dims[2]), v1, dims[2], dcaps[1]
    )
    out.append(("dec halo L2 drop", nov))
    k4, c4, v4, nov = sel(
        slabs[4], linearize3(c2 // 2, dims[4]), v2, dims[4], dcaps[2]
    )
    out.append(("dec halo L4 drop", nov))
    for name, (k, c, v, dimsL), (slts, gw, prs) in (
        ("dec L1", (k1, c1, v1, dims[1]), (2304, 48, 2048)),
        ("dec L2", (k2, c2, v2, dims[2]), (1024, 32, 768)),
        ("dec L4", (k4, c4, v4, dims[4]), (512, 40, 384)),
    ):
        p = make_span_plan(
            k, c, v, _K3_BLOCK, in_dims=dimsL, bs=128, span=192, slots=slts,
            gwin=gw, pairs=prs,
        )
        out.append((name, p.n_overflow))

    # ---- UNet plans (deployed budgets, unet3d.py) ----------------------
    from insmos_tpu.sparse import strided_conv_sites, voxelize_points
    from insmos_tpu.sparse.slab import slab_from_sparse
    from insmos_tpu.sparse.tensor import SparseTensor

    cur = pts[W - 1]
    vox, _ = voxelize_points(
        jnp.concatenate([cur, jnp.zeros((P, 3), jnp.float32)], -1),
        pv[W - 1], cfg.data.point_cloud_range, cfg.data.voxel_size,
        cfg.data.grid_size, cfg.model.unet_capacities[0],
        cfg.model.max_points_per_voxel,
    )
    cap_s = cfg.model.unet_site_capacity
    vox = SparseTensor(
        vox.coords[:cap_s], vox.keys[:cap_s], vox.feats[:cap_s],
        vox.valid[:cap_s], vox.dims,
    )
    gx = cfg.data.grid_size
    udims = {s: tuple(cdiv(g, s) for g in gx) for s in (1, 2, 4, 8)}
    ucaps = cfg.model.unet_capacities
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
        p = make_span_plan(
            s_in.keys, s_in.coords, s_in.valid, (3, 3, 3),
            in_dims=udims[fin], bs=128, span=192,
            slots={1: 1536, 2: 768, 4: 384}[fin],
            gwin={1: 48, 2: 32, 4: 24}[fin],
            pairs={1: 1024, 2: 512, 4: 256}[fin],
        )
        out.append((f"unet block L{fin}", p.n_overflow))
        p = make_span_plan(
            s_in.keys, nxt.coords, nxt.valid, (3, 3, 3), stride3=(2, 2, 2),
            pad3=(1, 1, 1), in_dims=udims[fin], bs=128,
            span=384 if stride == 8 else 256,
            slots=512 if stride < 8 else 128, gwin=12,
            pairs=1024 if stride < 8 else 512,
        )
        out.append((f"unet down L{stride}", p.n_overflow))
        uslab[stride] = nxt
    p = make_span_plan(
        uslab[8].keys, uslab[8].coords, uslab[8].valid, (3, 3, 3),
        in_dims=udims[8], bs=128, span=384, slots=128, gwin=8,
    )
    out.append(("unet block L8", p.n_overflow))
    return out


if __name__ == "__main__":
    main()
