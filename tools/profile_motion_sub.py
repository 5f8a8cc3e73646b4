"""Break down MotionNet's non-conv costs: slab build, site derivation,
span-plan construction, parent indices, and the conv passes themselves —
each as its own jitted function on the real bench window.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/profile_motion_sub.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, args, name, iters=5):
    import jax.numpy as jnp
    import jax

    out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.size))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.size))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import (
        _K3_BLOCK, _K3_DOWN, _K3_STEM, _P0, _S2, _level_dims,
    )
    from insmos_tpu.sparse.slab import build_slab, derive_strided_sites, parent_index, site_grid
    from insmos_tpu.sparse.span_conv import make_span_plan

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
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

    s1 = timeit(
        jax.jit(lambda c, t, v: build_slab(c, t, v, dims1, W, caps[0])[0]),
        (coords3, tcol, pvf), "build_slab L1 (1.3M pts)",
    )

    slabs = {1: s1}
    for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
        dims_o = _level_dims(dims1, fout)
        slabs[fout] = timeit(
            jax.jit(
                lambda s, dims_o=dims_o, cap=cap: derive_strided_sites(
                    s, _K3_DOWN, _S2, _P0, dims_o, cap
                )[0]
            ),
            (slabs[fin],), f"derive_strided_sites L{fin}->L{fout}",
        )

    for name, f, k3, span, bsz, jb, jw in (  # jb/jw -> slots/gwin
        ("plan stem 5^3", 1, _K3_STEM, 256, 128, 128, 2),
        ("plan L1 3^3", 1, _K3_BLOCK, 256, 128, 48, 2),
        ("plan L2 3^3", 2, _K3_BLOCK, 256, 128, 48, 2),
        ("plan L4 3^3", 4, _K3_BLOCK, 256, 128, 128, 2),
        ("plan L8 3^3", 8, _K3_BLOCK, 384, 128, 64, 2),
    ):
        s = slabs[f]
        dims = _level_dims(dims1, f) if f > 1 else dims1
        timeit(
            jax.jit(
                lambda s, k3=k3, dims=dims, span=span, bsz=bsz, name=name, f=f:
                make_span_plan(
                    s.keys, s.coords, s.valid, k3, in_dims=dims, span=span,
                    bs=bsz,
                    slots={"plan stem 5^3": 12288, "plan L1 3^3": 6144,
                           "plan L2 3^3": 2048, "plan L4 3^3": 1024,
                           "plan L8 3^3": 256}[name],
                    gwin=64 if f == 1 else 48,
                    pairs={"plan stem 5^3": 4096, "plan L1 3^3": 3072,
                           "plan L2 3^3": 1024, "plan L4 3^3": 512,
                           "plan L8 3^3": 256}[name],
                ).sb
            ),
            (s,), name,
        )

    for fin, fout in ((1, 2), (2, 4), (4, 8)):
        dims_o = _level_dims(dims1, fout)
        s_in = slabs[fin]
        timeit(
            jax.jit(
                lambda si, so, dims_o=dims_o: make_span_plan(
                    si.keys, so.coords, so.valid, _K3_DOWN, stride3=_S2,
                    pad3=_P0, in_dims=_level_dims(dims1, fin) if fin > 1 else dims1,
                    span=256, bs=128,
                    slots={2: 4096, 4: 2048, 8: 1024}[fout], gwin=48,
                    pairs={2: 2048, 4: 1024, 8: 512}[fout],
                ).sb
            ),
            (s_in, slabs[fout]), f"plan down L{fin}->L{fout}",
        )

    for fin, fout in ((4, 8), (2, 4), (1, 2)):
        timeit(
            jax.jit(
                lambda sc, sf, fout=fout: parent_index(
                    site_grid(sc), _level_dims(dims1, fout), sf
                )
            ),
            (slabs[fout], slabs[fin]), f"parent_index L{fin}<-L{fout}",
        )


if __name__ == "__main__":
    main()
