"""Primitive microbenchmarks on the current platform: searchsorted, random
gather, sort, matmul — the building blocks of the sparse engine."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, args, iters=3, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    # force a real fetch to catch async-lying runtimes
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t2 = time.perf_counter()
    print(
        f"{name:46s} {(t1 - t0) / iters * 1000:9.2f} ms"
        f" (+fetch {(t2 - t1) * 1000:7.2f} ms)",
        flush=True,
    )


def main():
    import jax
    import jax.numpy as jnp

    V = 1_572_864
    rng = np.random.default_rng(0)
    keys = jnp.asarray(np.sort(rng.choice(2**30, V, replace=False)).astype(np.int32))
    Q = V * 8
    queries = jnp.asarray(rng.integers(0, 2**30, Q).astype(np.int32))

    @jax.jit
    def ss(k, q):
        return jnp.searchsorted(k, q).sum()

    bench(ss, (keys, queries), 3, f"searchsorted {Q/1e6:.0f}M into {V/1e6:.1f}M")

    idx = jnp.asarray(rng.integers(0, V, Q).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=V).astype(np.float32))

    @jax.jit
    def gth(v, i):
        return jnp.take(v, i).sum()

    bench(gth, (vals, idx), 3, f"random gather {Q/1e6:.0f}M from {V/1e6:.1f}M f32")

    @jax.jit
    def gth_rows(v, i):
        return jnp.take(v, i, axis=0).sum()

    vals8 = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    idx_small = idx[: Q // 8]
    bench(
        gth_rows, (vals8, idx_small), 3,
        f"row gather {Q//8/1e6:.1f}M x 8ch from {V/1e6:.1f}M",
    )

    unsorted = jnp.asarray(rng.integers(0, 2**30, V).astype(np.int32))

    @jax.jit
    def srt(x):
        return jnp.sort(x)

    bench(srt, (unsorted,), 3, f"sort {V/1e6:.1f}M int32")

    a = jnp.asarray(rng.normal(size=(8192, 2048)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32))

    @jax.jit
    def mm(a, b):
        return (a @ b).sum()

    bench(mm, (a, b), 5, "matmul 8192x2048x2048 f32 (68 GFLOP)")


if __name__ == "__main__":
    main()
