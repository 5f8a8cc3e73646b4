"""Probe the candidate fixes for the measured walls (real TPU):
1. subm_conv_bricks chunk sweep (dispatch overhead hypothesis)
2. neighbor-table via one 3-contiguous-cell row gather vs 3 scalar probes
3. scatter-set vs sort+gather inverse-perm for dedup machinery
4. 256B row gathers (bf16 brick rows) vs 512B
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import _K_BLOCK, init_motionnet
    from insmos_tpu.sparse import unique_voxels
    from insmos_tpu.sparse.bricks import (
        brick_neighbor_table, build_bricks, subm_conv_bricks,
    )

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]
    gx, gy, gz = mc.grid_size
    dims4 = (gx, gy, gz, W)
    caps = mc.capacities
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)

    xyz = jnp.asarray(sample["points"][..., :3]).reshape(W * P, 3)
    vox = jnp.floor((xyz - lo) * 10.0).astype(jnp.int32)
    t = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)).reshape(W * P, 1)
    coords4 = jnp.concatenate([vox, t], axis=-1)

    uv = jax.jit(
        lambda c, v: unique_voxels(c, dims4, caps[0], v, first_occurrence_cap=False)
    )
    sites1, _, _, _ = uv(coords4, pv.reshape(W * P))
    x1 = sites1.replace_feats(
        (jnp.full((caps[0], 8), 0.5, jnp.float32) * sites1.valid[:, None]).astype(jnp.bfloat16)
    )

    # build with ENOUGH capacity this time
    bcap = 786_432
    bb = jax.jit(build_bricks, static_argnums=1)
    b1 = bb(x1, bcap)
    print(f"L1 bricks occupied: {int(b1.valid.sum())} / {bcap}; "
          f"voxels dropped: {int((b1.v_flat < 0).sum()) - (caps[0] - int(sites1.valid.sum()))}",
          flush=True)
    tblf = jax.jit(lambda b: brick_neighbor_table(b, _K_BLOCK))
    timeit("nb_table L1 3^4 (3 scalar probes) bcap786k", tblf, b1)
    tbl = tblf(b1)

    w8 = jax.random.normal(key, (81, 8, 8), jnp.bfloat16) * 0.1

    for chunk in (4096, 32768, 131072, None):
        f = jax.jit(
            lambda b, t_, w, c=chunk: subm_conv_bricks(b, w, _K_BLOCK, t_, chunk=c)
        )
        try:
            timeit(f"subm 3^4 8->8 L1 bf16 chunk={chunk}", f, b1, tbl, w8, iters=3)
        except Exception as e:
            print(f"chunk={chunk} FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)

    # ---- 3-contiguous-cell row gather table variant ----
    import math as _math
    from insmos_tpu.sparse.bricks import _num_xsegs, _row_group_offsets
    from insmos_tpu.sparse.tensor import KEY_SENTINEL

    def nb_table_rows(b, kernel):
        dims = b.dims
        nxs = _num_xsegs(dims)
        n_dense = nxs * _math.prod(dims[1:])
        grid = jnp.full((n_dense + 3,), -1, jnp.int32)
        safe = jnp.where(b.valid, b.keys, n_dense + 1)
        grid = grid.at[safe].set(jnp.arange(b.capacity, dtype=jnp.int32), mode="drop")
        grid = grid.at[n_dense + 1].set(-1)
        groups = _row_group_offsets(kernel)
        mults = [nxs]
        for d in range(1, len(dims) - 1):
            mults.append(mults[-1] * dims[d])
        shifts = groups @ np.array(mults, np.int64)
        key = jnp.where(b.valid, b.keys, 0)
        xseg = key % nxs
        coords = []
        k = key // nxs
        for d in range(1, len(dims)):
            coords.append(k % dims[d])
            k = k // dims[d]
        nb_keys = key[:, None] + jnp.asarray(shifts, jnp.int32)[None, :]
        ok = b.valid[:, None]
        for d in range(1, len(dims)):
            c = coords[d - 1][:, None] + jnp.asarray(groups[:, d - 1])[None, :]
            ok &= (c >= 0) & (c < dims[d])
        # one gather of 3 contiguous cells starting at nb_key-1
        start = jnp.where(ok, nb_keys - 1, n_dense + 2)  # rows [start, start+3)
        G = shifts.shape[0]
        idx3 = start[..., None] + jnp.arange(3, dtype=jnp.int32)
        idx3 = jnp.clip(idx3, 0, n_dense + 2)
        vals = jnp.take(grid, idx3.reshape(-1)).reshape(b.capacity, G, 3)
        # mask x-seg boundaries: left invalid when xseg==0, right when ==nxs-1
        left_ok = (xseg > 0)[:, None]
        right_ok = (xseg < nxs - 1)[:, None]
        vals = vals.at[..., 0].set(jnp.where(left_ok, vals[..., 0], -1))
        vals = vals.at[..., 2].set(jnp.where(right_ok, vals[..., 2], -1))
        return vals

    tblf2 = jax.jit(lambda b: nb_table_rows(b, _K_BLOCK))
    timeit("nb_table L1 3^4 (one 12B-row gather)", tblf2, b1)
    tbl2 = tblf2(b1)
    same = bool(jnp.all(tbl == tbl2))
    print(f"row-gather table identical: {same}", flush=True)

    # ---- scatter-set vs sort-based inverse perm ----
    n = 1_572_864
    perm = jax.random.permutation(key, n).astype(jnp.int32)
    vals = jax.random.randint(key, (n,), 0, 1 << 20, jnp.int32)

    def scat(p, v):
        return jnp.zeros((n,), jnp.int32).at[p].set(v)

    timeit("scatter-set 1.57M int32", jax.jit(scat), perm, vals)

    def sortinv(p, v):
        _, inv = jax.lax.sort((p, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return jnp.take(v, inv)

    o1 = jax.jit(scat)(perm, vals)
    o2 = jax.jit(sortinv)(perm, vals)
    print("sort-inv == scatter:", bool(jnp.all(o1 == o2)), flush=True)
    timeit("sort+gather inverse-perm 1.57M int32", jax.jit(sortinv), perm, vals)

    # scatter rows of 32B (feats) vs sort-based
    feats = jax.random.normal(key, (n, 8), jnp.bfloat16)

    def scatf(p, v):
        return jnp.zeros((n, 8), jnp.bfloat16).at[p].set(v)

    def sortf(p, v):
        _, inv = jax.lax.sort((p, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return jnp.take(v, inv, axis=0)

    timeit("scatter-set 1.57M rows 16B bf16", jax.jit(scatf), perm, feats)
    timeit("sort+gather 1.57M rows 16B bf16", jax.jit(sortf), perm, feats)

    # ---- 256B vs 512B row gathers ----
    tbl_ = jax.random.normal(key, (1_000_000, 64), jnp.bfloat16)  # 128B rows
    idx = jax.random.randint(key, (4_000_000,), 0, 1_000_000, jnp.int32)
    for wbytes, width in ((128, 64), (256, 128)):
        tb = jax.random.normal(key, (1_000_000, width), jnp.bfloat16)
        t_ = timeit(
            f"gather 4M rows of {wbytes}B bf16",
            jax.jit(lambda a, i: jnp.take(a, i, axis=0).sum()), tb, idx, iters=3,
        )
        print(f"  -> {4e6 * wbytes / t_ / 1e6:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
