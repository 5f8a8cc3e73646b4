"""Time the level-construction primitives at bench scale (real TPU):
unique_voxels, build_bricks, brick_neighbor_table, strided_conv_sites,
scalar scatters, cumsum — the non-matmul suspects."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5, warmup=1):
    fn_j = jax.jit(fn)
    for _ in range(warmup):
        r = fn_j(*args)
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn_j(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def main():
    import sys

    sys.path.insert(0, ".")
    from insmos_tpu.sparse import unique_voxels
    from insmos_tpu.sparse.bricks import brick_neighbor_table, build_bricks
    from insmos_tpu.sparse.convs import strided_conv_sites

    key = jax.random.PRNGKey(0)
    N = 1_300_000
    dims4 = (1200, 1000, 40, 10)

    xi = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
    timeit("sort 1.3M int32", lambda v: jnp.sort(v)[-1], xi)
    perm = jax.random.permutation(key, N).astype(jnp.int32)
    vals = jax.random.randint(key, (N,), 0, 100, jnp.int32)
    timeit(
        "scalar scatter-set 1.3M int32",
        lambda p, v: jnp.zeros((N,), jnp.int32).at[p].set(v)[-1],
        perm,
        vals,
    )
    timeit(
        "segment_max sorted 1.3M",
        lambda v: jax.ops.segment_max(
            v, jnp.minimum(jnp.arange(N) // 4, N - 1), num_segments=N,
            indices_are_sorted=True,
        )[-1],
        vals,
    )

    # unique_voxels at 4D L1 scale
    coords = jnp.stack(
        [
            jax.random.randint(key, (N,), 0, dims4[0], jnp.int32),
            jax.random.randint(key, (N,), 0, dims4[1], jnp.int32),
            jax.random.randint(key, (N,), 0, dims4[2], jnp.int32),
            jax.random.randint(key, (N,), 0, dims4[3], jnp.int32),
        ],
        -1,
    )
    cap = 1_572_864

    def uv(c):
        sites, p2v, slot, counts = unique_voxels(
            c, dims4, cap, first_occurrence_cap=False
        )
        return p2v

    timeit("unique_voxels 1.3M -> 1.5M cap (4D)", uv, coords, iters=3)

    def uv_first(c):
        sites, p2v, slot, counts = unique_voxels(
            c, dims4, cap, first_occurrence_cap=True
        )
        return p2v

    timeit("unique_voxels first-occurrence", uv_first, coords, iters=3)

    # build_bricks + neighbor table at L1 scale
    sites, p2v = jax.jit(
        lambda c: unique_voxels(c, dims4, cap, first_occurrence_cap=False)[:2]
    )(coords)
    st = sites.replace_feats(jnp.ones((cap, 8), jnp.bfloat16))

    def bb(s):
        b = build_bricks(s, cap // 2)
        return b.feats

    timeit("build_bricks L1 (cap 1.5M)", bb, st, iters=3)
    b = jax.jit(lambda s: build_bricks(s, cap // 2))(st)

    def nt(b):
        return brick_neighbor_table(b, (3, 3, 3, 3))

    timeit("brick_neighbor_table 3^4 (B=768k)", nt, b, iters=3)

    def nt5(b):
        return brick_neighbor_table(b, (5, 5, 5, 1))

    timeit("brick_neighbor_table (5,5,5,1)", nt5, b, iters=3)

    # strided site derivation at L1->L2
    def scs(s):
        sites2, pr, ki = strided_conv_sites(
            s, (2, 2, 2, 1), (2, 2, 2, 1), (0, 0, 0, 0),
            (608, 500, 20, 10), cap // 2, with_pairs=True,
        )
        return pr

    timeit("strided_conv_sites L1->L2 (pairs)", scs, st, iters=3)

    # one brick subm conv at L1 block scale for reference
    from insmos_tpu.sparse.bricks import subm_conv_bricks

    tbl = jax.jit(lambda b: brick_neighbor_table(b, (3, 3, 3, 3)))(b)
    w = jax.random.normal(key, (81, 8, 8), jnp.bfloat16)

    def conv(b, tbl, w):
        return subm_conv_bricks(b, w, (3, 3, 3, 3), tbl).feats

    timeit("subm_conv_bricks L1 3^4 8->8 bf16", conv, b, tbl, w, iters=3)


if __name__ == "__main__":
    main()
