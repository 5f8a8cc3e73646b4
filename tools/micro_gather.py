"""Gather/lookup strategy bake-off on the current platform.

Compares: unsorted vs sorted random gather (with XLA sortedness hints),
per-offset shifted-key membership via sorted compare, and a one-hot-matmul
membership alternative. Prints honest timings (forced output fetch).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, args, iters=3, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    V = 1_048_576
    Q = 8 * V  # 8.4M

    vals = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    idx_unsorted = jnp.asarray(rng.integers(0, V, Q).astype(np.int32))
    idx_sorted = jnp.sort(idx_unsorted)

    @jax.jit
    def take_plain(v, i):
        return jnp.take(v, i).sum()

    bench(take_plain, (vals, idx_unsorted), 3, f"take {Q/1e6:.0f}M unsorted")
    bench(take_plain, (vals, idx_sorted), 3, f"take {Q/1e6:.0f}M sorted (no hint)")

    def gather_hinted(v, i, sorted_):
        return lax.gather(
            v[:, None],
            i[:, None],
            lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            (1, 1),
            indices_are_sorted=sorted_,
            unique_indices=False,
            mode=lax.GatherScatterMode.CLIP,
        ).sum()

    bench(
        jax.jit(lambda v, i: gather_hinted(v, i, True)),
        (vals, idx_sorted), 3, f"lax.gather {Q/1e6:.0f}M sorted=True hint",
    )

    # 8-channel row gather, sorted vs not
    vals8 = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    qs = Q // 8

    @jax.jit
    def take_rows(v, i):
        return jnp.take(v, i, axis=0).sum()

    bench(take_rows, (vals8, idx_unsorted[:qs]), 3, f"row8 take {qs/1e6:.1f}M unsorted")
    bench(take_rows, (vals8, jnp.sort(idx_unsorted[:qs])), 3, f"row8 take {qs/1e6:.1f}M sorted")

    # membership via shifted sorted keys: keys sorted; for a constant shift c,
    # exist(i) = any(keys == keys[i]+c). Compare with a windowed approach:
    # for shift c>0, match candidates are within a bounded window ahead.
    keys = jnp.asarray(
        np.sort(rng.choice(np.int64(2**30), V, replace=False)).astype(np.int32)
    )

    @jax.jit
    def shift_member(k):
        # adjacency membership for c=1: keys[i]+1 == keys[i+1]
        nxt = jnp.concatenate([k[1:], k[-1:]])
        return (nxt == k + 1).sum()

    bench(shift_member, (keys,), 3, "x+1 adjacency membership (1M)")

    # one-hot matmul "gather": gathered = onehot(idx) @ vals — MXU does the
    # data movement. Only viable for small tables; measure a 16k-table case.
    T = 16_384
    small_vals = jnp.asarray(rng.normal(size=(T, 8)).astype(np.float32))
    small_idx = jnp.asarray(rng.integers(0, T, 131_072).astype(np.int32))

    @jax.jit
    def onehot_mm(v, i):
        oh = jax.nn.one_hot(i, T, dtype=jnp.bfloat16)
        return (oh @ v.astype(jnp.bfloat16)).sum()

    bench(onehot_mm, (small_vals, small_idx), 3, "one-hot matmul 131k from 16k x8")

    @jax.jit
    def take_small(v, i):
        return jnp.take(v, i, axis=0).sum()

    bench(take_small, (small_vals, small_idx), 3, "take 131k rows from 16k x8")


if __name__ == "__main__":
    main()
