"""Fine-grained MotionNet breakdown: sort/dedup, per-level lookups, convs.

  python tools/profile_motionnet.py [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, args, iters, name):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.blocks import basic_block, subm_block, strided_block
    from insmos_tpu.nn.minkunet4d import (
        _K_BLOCK,
        _K_DOWN,
        _K_STEM,
        _P0,
        _S_DOWN,
        _level_dims,
        init_motionnet,
    )
    from insmos_tpu.sparse import strided_conv_sites, unique_voxels

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    params, state = init_motionnet(jax.random.PRNGKey(0), cfg)
    sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]

    gx, gy, gz = mc.grid_size
    dims4 = (gx, gy, gz, W)
    caps = mc.capacities
    chunk = cfg.runtime.conv_chunk
    bn = dict(bn_args={"momentum": 0.1, "eps": 1e-5}, train=False, chunk=chunk)

    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)

    @jax.jit
    def build(points, point_valid):
        xyz = points[..., :3].reshape(W * P, 3)
        vox = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)
        t = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)).reshape(
            W * P, 1
        )
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
    print(f"{'L1 occupancy':40s} {int(sites1.valid.sum()):9d} / {caps[0]}", flush=True)

    @jax.jit
    def stem(p, s, x):
        y, _ = subm_block(p["stem"], s["stem"], x, _K_STEM, **bn)
        return y

    timeit(stem, (params, state, x1), args.iters, "stem subm (5,5,5,1) K=125 @L1")
    out_p1 = stem(params, state, x1)

    d2 = _level_dims(dims4, 2)

    @jax.jit
    def down_sites(x):
        return strided_conv_sites(x, _K_DOWN, _S_DOWN, _P0, d2, caps[1])

    timeit(down_sites, (out_p1,), args.iters, "L2 site derivation (floor-div dedup)")
    s2 = down_sites(out_p1)
    print(f"{'L2 occupancy':40s} {int(s2.valid.sum()):9d} / {caps[1]}", flush=True)

    @jax.jit
    def down1(p, s, x, sites):
        y, _ = strided_block(p["down1"], s["down1"], x, _K_DOWN, _S_DOWN, _P0, sites, **bn)
        return y

    timeit(down1, (params, state, out_p1, s2), args.iters, "down1 strided K=8 @L2")
    y2 = down1(params, state, out_p1, s2)

    @jax.jit
    def block1(p, s, x):
        y, _ = basic_block(p["block1"], s["block1"], x, _K_BLOCK, **bn)
        return y

    timeit(block1, (params, state, y2), args.iters, "block1 2x subm 3^4 K=81 @L2")
    b1 = block1(params, state, y2)

    d4 = _level_dims(dims4, 4)
    s4 = strided_conv_sites(b1, _K_DOWN, _S_DOWN, _P0, d4, caps[2])
    print(f"{'L4 occupancy':40s} {int(s4.valid.sum()):9d} / {caps[2]}", flush=True)

    @jax.jit
    def block2(p, s, x):
        y, _ = basic_block(p["block2"], s["block2"], x, _K_BLOCK, **bn)
        return y

    y4 = strided_block(
        params["down2"], state["down2"], b1, _K_DOWN, _S_DOWN, _P0, s4, **bn
    )[0]
    timeit(block2, (params, state, y4), args.iters, "block2 2x subm 3^4 K=81 @L4")


if __name__ == "__main__":
    main()
