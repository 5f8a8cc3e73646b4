"""Minimal gwin/slots for the decoder-pruned span plans (round-5) on the
certified HDL-64E fixture — every oversized tier-2 greedy round costs ~20
tiny dispatches per plan per step (PERF.md round-5).

    JAX_PLATFORMS=cpu python tools/probe_dec_plans.py
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
from insmos_tpu.sparse.slab import (
    Slab, build_slab, compact_rows, derive_strided_sites, dilate_mask,
    linearize3, take_rows,
)
from insmos_tpu.sparse.span_conv import make_span_plan
from insmos_tpu.sparse.tensor import KEY_SENTINEL

_K3_BLOCK = (3, 3, 3)
_K3_DOWN = (2, 2, 2)
_S2 = (2, 2, 2)
_P0 = (0, 0, 0)


def min_budget(name, keys, coords, valid, kernel3, in_dims, slots, pairs):
    for gwin in (4, 6, 8, 12, 16, 24, 32, 48, 64):
        plan = make_span_plan(
            keys, coords, valid, kernel3, in_dims=in_dims, bs=128, span=256,
            slots=slots, gwin=gwin, pairs=pairs,
        )
        ovf = int(plan.n_overflow)
        if ovf == 0:
            break
    live = int(np.sum(np.asarray(plan.gs[1]) >= 0)) if plan.gs.shape[1] else 0
    print(
        f"{name:10s} min_gwin={gwin} ovf={ovf} live_slots={live}/{slots} "
        f"n_sites={int(jnp.sum(valid))}"
    )


def main():
    cfg = Config()
    mc = cfg.model.motionnet
    dims1 = mc.grid_size
    caps = mc.site_capacities
    for seed in (0, 3):
        s = make_hdl64_window(cfg, seed=seed)
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
        slab1, _, _, _ = build_slab(
            coords3, tcol, jnp.asarray(pv.reshape(W * P)), dims1, W, caps[0]
        )
        cdiv = lambda a, b: -(-a // b)
        dims = {1: dims1}
        slabs = {1: slab1}
        for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2])):
            dims[fout] = tuple(cdiv(d, fout) for d in dims1)
            slabs[fout], _, _ = derive_strided_sites(
                slabs[fin], _K3_DOWN, _S2, _P0, dims[fout], cap
            )
        dcaps = [min(c, s_) for c, s_ in zip(mc.decoder_capacities, caps[:3])]

        def sel_level(slab_l, src_keys, src_sel, dimsL, cap):
            m = dilate_mask(src_keys, src_sel, dimsL, 2, slab_l.keys,
                            slab_l.valid)
            idx, nov = compact_rows(m, cap)
            keys = jnp.where(
                idx >= 0, jnp.take(slab_l.keys, jnp.maximum(idx, 0)),
                KEY_SENTINEL,
            )
            coords = take_rows(slab_l.coords, idx)
            print(f"  seed{seed} N@{dimsL[0]}: {int(jnp.sum(idx >= 0))} "
                  f"(cap {cap}, over {int(nov)})")
            return keys, coords, idx >= 0

        s1 = slabs[1]
        k1, c1, v1 = sel_level(
            s1, s1.keys, s1.occ[:, W - 1] & s1.valid, dims[1], dcaps[0]
        )
        pk2 = linearize3(c1 // 2, dims[2])
        k2, c2, v2 = sel_level(slabs[2], pk2, v1, dims[2], dcaps[1])
        pk4 = linearize3(c2 // 2, dims[4])
        k4, c4, v4 = sel_level(slabs[4], pk4, v2, dims[4], dcaps[2])
        min_budget("dec L1", k1, c1, v1, _K3_BLOCK, dims[1], 3200, 3072)
        min_budget("dec L2", k2, c2, v2, _K3_BLOCK, dims[2], 1280, 1024)
        min_budget("dec L4", k4, c4, v4, _K3_BLOCK, dims[4], 384, 512)


if __name__ == "__main__":
    main()
