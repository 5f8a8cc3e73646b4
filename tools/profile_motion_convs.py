"""Per-conv timing of MotionNet's span-engine passes at bench scale.

Mirrors motionnet_forward's exact inference schedule (span engine,
t-pruned slot windows, occ-folded downs) but times every conv/block as
its own jitted call, so the table attributes the ~600 ms MotionNet stage
conv by conv. Values are random; only shapes/site sets match the bench.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/profile_motion_convs.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _fence(out):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.size))


def timeit(fn, args, name, iters=5):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.blocks_slab import (
        basic_block_slab_pruned,
        cat_slab,
        inverse_block_slab,
        subm_block_slab,
    )
    from insmos_tpu.nn.minkunet4d import (
        _K3_BLOCK,
        _K3_DOWN,
        _K3_STEM,
        _K_BLOCK,
        _K_DOWN,
        _K_STEM,
        _P0,
        _S2,
        _level_dims,
        init_motionnet,
    )
    from insmos_tpu.sparse.slab import (
        build_slab,
        derive_strided_sites,
        parent_index,
        site_grid,
        slice_slots,
    )
    from insmos_tpu.sparse.span_conv import make_span_plan

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    params, state = init_motionnet(jax.random.PRNGKey(0), cfg)
    import os
    if os.environ.get("INSMOS_PROBE_GEN", "hdl64") == "hdl64":
        from insmos_tpu.data.hdl64 import make_hdl64_window

        sample = make_hdl64_window(cfg)
    else:
        sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        np.arange(P)[None, :] < sample["num_points"][:, None]
    ) & sample["scan_mask"][:, None]
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor(
        (jnp.asarray(sample["points"][..., :3]).reshape(-1, 3) - lo) * 10.0
    ).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)
    dims1 = mc.grid_size
    caps = mc.site_capacities
    pvf = jnp.asarray(pv.reshape(-1))
    bn = dict(bn_args={"momentum": 0.1, "eps": 1e-5}, train=False)
    chunk = cfg.runtime.conv_chunk

    s1 = jax.jit(lambda c, t, v: build_slab(c, t, v, dims1, W, caps[0])[0])(
        coords3, tcol, pvf
    )
    key = jax.random.PRNGKey(1)

    def rand_feats(slab, C):
        f = jax.random.normal(key, (slab.capacity, slab.T * C), jnp.float32)
        s = slab.replace_feats(f)
        return s.replace_feats(s.mask_feats())

    slabs = {1: s1}
    dims = {1: dims1}
    tables = {}
    down_tables = {}
    for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
        dims[fout] = _level_dims(dims1, fout)
        s_in = slabs[fin]
        tables[fin] = jax.jit(
            lambda s, f=fin: make_span_plan(
                s.keys, s.coords, s.valid, _K3_BLOCK, in_dims=dims[f],
                bs=128, span=256, slots=1024, gwin=16,
            )
        )(s_in)
        nxt = jax.jit(
            lambda s, f=fout, cap=cap: derive_strided_sites(
                s, _K3_DOWN, _S2, _P0, dims[f], cap
            )[0]
        )(s_in)
        down_tables[fout] = jax.jit(
            lambda si, so, f=fin, fo=fout: make_span_plan(
                si.keys, so.coords, so.valid, _K3_DOWN, stride3=_S2, pad3=_P0,
                in_dims=dims[f], bs=128, span=256,
                slots=1024, gwin=16,
            )
        )(s_in, nxt)
        slabs[fout] = nxt
    s8 = slabs[8]
    tables[8] = jax.jit(
        lambda s: make_span_plan(
            s.keys, s.coords, s.valid, _K3_BLOCK, in_dims=dims[8], bs=128,
            span=384, slots=512, gwin=16,
        )
    )(s8)
    parent_idx = {}
    for fin, fout in ((4, 8), (2, 4), (1, 2)):
        parent_idx[fin] = jax.jit(
            lambda sc, sf, fo=fout: parent_index(
                site_grid(sc), dims[fo], sf
            )
        )(slabs[fout], slabs[fin])

    d0 = mc.init_dim
    pl_ = mc.planes
    tl = {
        "b2o": 1, "b3m": 2, "b3o": 3, "b6m": 4, "b6o": 5,
        "b7m": 6, "b7o": 7, "b8m": 8, "b8o": 9,
    }

    def sl(s, t0):
        return slice_slots(s, t0, W - t0) if t0 else s

    # ---- encoder ----
    out_stem = rand_feats(s1, d0)
    y = timeit(
        jax.jit(
            lambda x: subm_block_slab(
                params["down1"], state["down1"], x, _K_DOWN, down_tables[2],
                out=slabs[2], chunk=chunk, with_occ=True, **bn,
            )[0]
        ),
        (out_stem,), "down1 L1->L2 (occ, 8->8 T10)",
    )
    out_b1 = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block1"], state["block1"], x, _K_BLOCK, tables[2],
                x, x, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block1 L2 (2x conv 8->8 T10)",
    )
    y = timeit(
        jax.jit(
            lambda x: subm_block_slab(
                params["down2"], state["down2"], x, _K_DOWN, down_tables[4],
                out=slabs[4], chunk=chunk, with_occ=True, **bn,
            )[0]
        ),
        (out_b1,), "down2 L2->L4 (occ, 8->8 T10)",
    )
    out_b2 = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block2"], state["block2"], x, _K_BLOCK, tables[4],
                x, sl(x, 1), t_off1=0, t_off2=1, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block2 L4 (8->16 T10->9)",
    )
    y = timeit(
        jax.jit(
            lambda x: subm_block_slab(
                params["down3"], state["down3"], x, _K_DOWN, down_tables[8],
                out=sl(slabs[8], 1), chunk=chunk, with_occ=True, **bn,
            )[0]
        ),
        (out_b2,), "down3 L4->L8 (occ, 16->16 T9)",
    )
    y = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block3"], state["block3"], x, _K_BLOCK, tables[8],
                slice_slots(x, 1, 8), slice_slots(x, 2, 7),
                t_off1=1, t_off2=1, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block3 L8 (16->32 T9->7)",
    )

    # ---- decoder ----
    y = timeit(
        jax.jit(
            lambda c, f: inverse_block_slab(
                params["up5"], state["up5"], c, slice_slots(f, 2, 7),
                parent_idx[4], **bn
            )[0]
        ),
        (y, out_b2.replace_feats(out_b2.feats)), "up5 L8->L4 (32->32 T7)",
    )
    y = timeit(
        jax.jit(
            lambda a, b: cat_slab(a, slice_slots(b, 2, 7))
        ),
        (y, out_b2), "cat L4 (32+16 T7)",
    )
    y = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block6"], state["block6"], x, _K_BLOCK, tables[4],
                slice_slots(x, 1, 6), slice_slots(x, 2, 5),
                t_off1=1, t_off2=1, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block6 L4 (48->32 T7->5)",
    )
    y = timeit(
        jax.jit(
            lambda c, f: inverse_block_slab(
                params["up6"], state["up6"], c, sl(f, 5), parent_idx[2], **bn
            )[0]
        ),
        (y, out_b1), "up6 L4->L2 (32->16 T5)",
    )
    y = timeit(
        jax.jit(lambda a, b: cat_slab(a, sl(b, 5))),
        (y, out_b1), "cat L2 (16+8 T5)",
    )
    y = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block7"], state["block7"], x, _K_BLOCK, tables[2],
                slice_slots(x, 1, 4), slice_slots(x, 2, 3),
                t_off1=1, t_off2=1, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block7 L2 (24->16 T5->3)",
    )
    y = timeit(
        jax.jit(
            lambda c, f: inverse_block_slab(
                params["up7"], state["up7"], c, sl(f, 7), parent_idx[1], **bn
            )[0]
        ),
        (y, out_stem), "up7 L2->L1 (16->8 T3)",
    )
    y = timeit(
        jax.jit(lambda a, b: cat_slab(a, sl(b, 7))),
        (y, out_stem), "cat L1 (8+8 T3)",
    )
    y = timeit(
        jax.jit(
            lambda x: basic_block_slab_pruned(
                params["block8"], state["block8"], x, _K_BLOCK, tables[1],
                slice_slots(x, 1, 2), slice_slots(x, 2, 1),
                t_off1=1, t_off2=1, chunk=chunk, **bn,
            )[0]
        ),
        (y,), "block8 L1 (16->8 T3->1)",
    )


if __name__ == "__main__":
    main()
