"""Per-piece timing of the NON-conv machinery (plans, slab builds, site
derivation, gathers) at bench scale — the gap between the sum of conv
times (tools/profile_motion_convs.py) and the full MotionNet/UNet stage
times (tools/profile_stages.py).

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/profile_glue.py
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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import (
        _K3_BLOCK,
        _K3_DOWN,
        _K3_STEM,
        _P0,
        _S2,
        _level_dims,
    )
    from insmos_tpu.sparse.slab import (
        build_slab,
        derive_strided_sites,
        gather_slots,
        parent_index,
        site_grid,
    )
    from insmos_tpu.sparse.span_conv import make_span_plan
    from insmos_tpu.sparse import voxelize_points
    from insmos_tpu.sparse.convs import strided_conv_sites
    from insmos_tpu.sparse.slab import slab_from_sparse

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
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

    # ---- motion glue ----
    f_build = jax.jit(
        lambda c, t, v: build_slab(c, t, v, dims1, W, caps[0])[:2]
    )
    (s1, p2slot) = timeit(f_build, (coords3, tcol, pvf), "motion build_slab (1.3M pts)")

    slabs = {1: s1}
    dims = {1: dims1}
    for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
        dims[fout] = _level_dims(dims1, fout)
        s_in = slabs[fin]
        timeit(
            jax.jit(
                lambda s, f=fin: make_span_plan(
                    s.keys, s.coords, s.valid, _K3_BLOCK, in_dims=dims[f],
                    bs=128, span=256, slots=1024, gwin=16,
                )
            ),
            (s_in,), f"motion plan blocks L{fin}",
        )
        nxt = timeit(
            jax.jit(
                lambda s, f=fout, cap=cap: derive_strided_sites(
                    s, _K3_DOWN, _S2, _P0, dims[f], cap
                )[0]
            ),
            (s_in,), f"motion derive_strided L{fin}->L{fout}",
        )
        timeit(
            jax.jit(
                lambda si, so, f=fin, fo=fout: make_span_plan(
                    si.keys, so.coords, so.valid, _K3_DOWN, stride3=_S2,
                    pad3=_P0, in_dims=dims[f], bs=128, span=256,
                    slots=1024, gwin=16,
                )
            ),
            (s_in, nxt), f"motion plan down L{fin}->L{fout}",
        )
        slabs[fout] = nxt
    timeit(
        jax.jit(
            lambda s: make_span_plan(
                s.keys, s.coords, s.valid, _K3_BLOCK, in_dims=dims[8],
                bs=128, span=384, slots=512, gwin=16,
            )
        ),
        (slabs[8],), "motion plan blocks L8",
    )
    timeit(
        jax.jit(
            lambda s: make_span_plan(
                s.keys, s.coords, s.valid, _K3_STEM, in_dims=dims[1],
                span=256, slots=1024, gwin=16,
            )
        ),
        (s1,), "motion plan stem (5x5 G25)",
    )
    for fin, fout in ((4, 8), (2, 4), (1, 2)):
        timeit(
            jax.jit(
                lambda sc, sf, fo=fout: parent_index(
                    site_grid(sc), dims[fo], sf
                )
            ),
            (slabs[fout], slabs[fin]), f"motion parent_index L{fin}",
        )
    timeit(
        jax.jit(lambda s, p: gather_slots(s.replace_feats(
            jnp.zeros((s.capacity, s.T * 8), jnp.float32)), p, 8)),
        (s1, p2slot), "motion gather_slots (1.3M pts, C8)",
    )

    # ---- unet glue ----
    current7 = jnp.concatenate(
        [jnp.asarray(sample["points"][W - 1]),
         jnp.zeros((P, 3), jnp.float32)], axis=-1
    )
    cur_valid = jnp.asarray(pv[W - 1])
    f_vox = jax.jit(
        lambda c, v: voxelize_points(
            c, v, cfg.data.point_cloud_range, cfg.data.voxel_size,
            cfg.data.grid_size, cfg.model.unet_capacities[0],
            cfg.model.max_points_per_voxel,
        )
    )
    vox, _ = timeit(f_vox, (current7, cur_valid), "unet voxelize")

    ucaps = cfg.model.unet_capacities
    gx, gy, gz = cfg.data.grid_size
    cdiv = lambda a, b: -(-a // b)
    udims = {s: (cdiv(gx, s), cdiv(gy, s), cdiv(gz, s)) for s in (1, 2, 4, 8)}
    _K3 = (3, 3, 3)
    _P1 = (1, 1, 1)
    level_sites = {1: vox}
    uslabs = {1: slab_from_sparse(vox)}
    for lvl, stride in ((2, 2), (3, 4), (4, 8)):
        fin = stride // 2
        s_in = uslabs[fin]
        timeit(
            jax.jit(
                lambda s, f=fin: make_span_plan(
                    s.keys, s.coords, s.valid, _K3, in_dims=udims[f],
                    bs=128, span=256, slots=1024, gwin=16,
                )
            ),
            (s_in,), f"unet plan blocks s{fin}",
        )
        sites = timeit(
            jax.jit(
                lambda ls, st=stride, lv=lvl: strided_conv_sites(
                    ls, _K3, _S2, _P1, udims[st], ucaps[lv - 1],
                    with_pairs=True,
                )
            ),
            (level_sites[fin],), f"unet strided_conv_sites s{fin}->s{stride}",
        )[0]
        level_sites[stride] = sites
        nxt = slab_from_sparse(sites.sites())
        timeit(
            jax.jit(
                lambda si, so, f=fin, st=stride: make_span_plan(
                    si.keys, so.coords, so.valid, _K3, stride3=_S2, pad3=_P1,
                    in_dims=udims[f], bs=128,
                    span=384 if st == 8 else 256,
                    slots=1024, gwin=16,
                )
            ),
            (s_in, nxt), f"unet plan down s{fin}->s{stride}",
        )
        uslabs[stride] = nxt

    _S2_ = _S2


if __name__ == "__main__":
    main()
