"""Brick-path breakdown at bench scale: build_bricks, neighbor tables,
subm convs per level, strided site derivation + pairs.

  python tools/profile_bricks.py [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, args, iters, name):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import (
        _K_BLOCK, _K_DOWN, _K_STEM, _P0, _S_DOWN, _level_dims, init_motionnet,
    )
    from insmos_tpu.nn.blocks import strided_block_pairs
    from insmos_tpu.sparse import strided_conv_sites, unique_voxels
    from insmos_tpu.sparse.bricks import (
        brick_neighbor_table, build_bricks, subm_conv_bricks,
    )
    from insmos_tpu.nn.layers import cast_compute

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    params, state = init_motionnet(jax.random.PRNGKey(0), cfg)
    params = cast_compute(params, cfg.runtime.compute_dtype)
    sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]

    gx, gy, gz = mc.grid_size
    dims4 = (gx, gy, gz, W)
    caps = mc.capacities
    chunk = cfg.runtime.conv_chunk
    brick_chunk = max(1, chunk // 16)
    bn = dict(bn_args={"momentum": 0.1, "eps": 1e-5}, train=False)

    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)

    @jax.jit
    def build(points, point_valid):
        xyz = points[..., :3].reshape(W * P, 3)
        vox = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)
        t = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
        ).reshape(W * P, 1)
        coords4 = jnp.concatenate([vox, t], axis=-1)
        sites, p2v, _, _ = unique_voxels(
            coords4, dims4, caps[0], point_valid.reshape(W * P),
            first_occurrence_cap=False,
        )
        return sites, p2v

    timeit(build, (sample["points"], pv), args.iters, "4D quantize+sort+dedup")
    sites1, _ = build(sample["points"], pv)
    x1 = sites1.replace_feats(
        jnp.full((caps[0], 1), 0.5, jnp.float32) * sites1.valid[:, None]
    )
    nvox = int(sites1.valid.sum())
    bcap1 = max(256, caps[0] // 4)
    print(f"{'L1 voxels':44s} {nvox:9d} / {caps[0]}", flush=True)

    bb = jax.jit(build_bricks, static_argnums=1)
    timeit(bb, (x1, bcap1), args.iters, "build_bricks L1")
    b1 = bb(x1, bcap1)
    print(f"{'L1 bricks occupied':44s} {int(b1.valid.sum()):9d} / {bcap1}", flush=True)
    print(f"{'L1 voxels dropped by brick cap':44s} {int((b1.v_flat < 0).sum()) - (caps[0]-nvox):9d}", flush=True)

    tbl_stem_f = jax.jit(lambda b: brick_neighbor_table(b, _K_STEM))
    timeit(tbl_stem_f, (b1,), args.iters, "brick_neighbor_table L1 stem G=25")
    tbl_block_f = jax.jit(lambda b: brick_neighbor_table(b, _K_BLOCK))
    timeit(tbl_block_f, (b1,), args.iters, "brick_neighbor_table L1 3^4 G=27")
    tbl1s = tbl_stem_f(b1)
    tbl1b = tbl_block_f(b1)

    w_stem = params["stem"]["conv"]["w"]

    @jax.jit
    def conv_stem(b, tbl, w):
        return subm_conv_bricks(b, w, _K_STEM, tbl, chunk=brick_chunk)

    timeit(conv_stem, (b1, tbl1s, w_stem), args.iters, "subm stem (1->8ch) K=125 L1")

    w8 = jnp.zeros((81, 8, 8), w_stem.dtype)

    @jax.jit
    def conv_b(b, tbl, w):
        return subm_conv_bricks(b, w, _K_BLOCK, tbl, chunk=brick_chunk)

    b1_8 = b1.replace_feats(jnp.zeros((b1.capacity, 16, 8), w_stem.dtype))
    timeit(conv_b, (b1_8, tbl1b, w8), args.iters, "subm 3^4 (8->8ch) K=81 L1")

    # L2
    d2 = _level_dims(dims4, 2)
    x8 = sites1.replace_feats(jnp.zeros((caps[0], 8), jnp.float32))

    scs = jax.jit(
        lambda x: strided_conv_sites(x, _K_DOWN, _S_DOWN, _P0, d2, caps[1], with_pairs=True)
    )
    timeit(scs, (x8,), args.iters, "strided_conv_sites+pairs L1->L2")
    s2, pr2, ki2 = scs(x8)
    print(f"{'L2 voxels':44s} {int(s2.valid.sum()):9d} / {caps[1]}", flush=True)

    @jax.jit
    def down1(p, s, x, sites, prs, kis):
        y, _ = strided_block_pairs(p["down1"], s["down1"], x, sites, prs, kis, **bn)
        return y

    timeit(
        down1, (params, state, x8, s2, pr2, ki2), args.iters,
        "down1 strided-pairs (8->8) L1->L2",
    )
    y2 = down1(params, state, x8, s2, pr2, ki2)

    bcap2 = max(256, caps[1] // 4)
    timeit(bb, (y2, bcap2), args.iters, "build_bricks L2")
    b2 = bb(y2, bcap2)
    print(f"{'L2 bricks occupied':44s} {int(b2.valid.sum()):9d} / {bcap2}", flush=True)
    timeit(tbl_block_f, (b2,), args.iters, "brick_neighbor_table L2 3^4 G=27")
    tbl2 = tbl_block_f(b2)
    timeit(conv_b, (b2, tbl2, w8), args.iters, "subm 3^4 (8->8ch) K=81 L2")


if __name__ == "__main__":
    main()
