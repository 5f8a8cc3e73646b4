"""XLA (non-Pallas) take_along_axis / gather-form throughput on TPU.

If the (N, 128) per-lane take_along_axis hits the hardware dynamic-gather
path, the sparse engine's lookups can be restructured around it.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, args, iters=5, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:58s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, L = 65_536, 128  # 8.4M elements
    a = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
    idx_full = jnp.asarray(rng.integers(0, N, (N, L)).astype(np.int32))

    @jax.jit
    def tala0(a, i):
        return jnp.take_along_axis(a, i, axis=0).sum()

    bench(tala0, (a, idx_full), 5, f"XLA take_along_axis (65k,128) axis=0 8.4M")

    idx_lane = jnp.asarray(rng.integers(0, L, (N, L)).astype(np.int32))

    @jax.jit
    def tala1(a, i):
        return jnp.take_along_axis(a, i, axis=1).sum()

    bench(tala1, (a, idx_lane), 5, f"XLA take_along_axis (65k,128) axis=1 8.4M")

    # smaller-rows variant: (524288, 16) with idx (524288, 16)
    a2 = jnp.asarray(rng.normal(size=(524_288, 16)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 524_288, (524_288, 16)).astype(np.int32))

    @jax.jit
    def tala2(a, i):
        return jnp.take_along_axis(a, i, axis=0).sum()

    bench(tala2, (a2, i2), 5, "XLA take_along_axis (524k,16) axis=0 8.4M")

    # vmapped per-column 1D take: column c gathers from column c
    av = jnp.asarray(rng.normal(size=(L, N)).astype(np.float32))
    iv = jnp.asarray(rng.integers(0, N, (L, N)).astype(np.int32))

    @jax.jit
    def vtake(a, i):
        return jax.vmap(jnp.take)(a, i).sum()

    bench(vtake, (av, iv), 5, "XLA vmapped take (128 x 65k) 8.4M")

    # contiguous slice-rows gather: 65k gathers of 128-wide contiguous rows
    big = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, N, (N,)).astype(np.int32))

    @jax.jit
    def rowg(a, i):
        return jnp.take(a, i, axis=0).sum()

    bench(rowg, (big, ridx), 5, "XLA row-gather 65k rows x 128 f32")


if __name__ == "__main__":
    main()
