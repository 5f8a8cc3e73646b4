"""Pin down the f32 matmul anomaly + scatter/strided alternatives (real TPU)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10, warmup=2):
    fn_j = jax.jit(fn)
    for _ in range(warmup):
        r = fn_j(*args)
    jnp.asarray(r).sum().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        digest = fn_j(*args)
    float(jnp.asarray(digest).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    N = 4096
    a32 = jax.random.normal(key, (N, N), jnp.float32)
    for prec in ("default", "highest", "tensorfloat32"):
        try:
            t = timeit(
                f"matmul {N}^3 f32 precision={prec}",
                lambda x: jnp.dot(x, x, precision=prec).sum(),
                a32,
            )
            print(f"  -> {2*N**3/t/1e12:.1f} TF/s")
        except Exception as e:
            print(f"  {prec} failed: {e}")
    # f32 in, bf16 compute via explicit cast
    t = timeit(
        f"matmul {N}^3 f32->bf16 cast",
        lambda x: jnp.dot(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).sum(),
        a32,
    )
    print(f"  -> {2*N**3/t/1e12:.1f} TF/s")

    ab = a32.astype(jnp.bfloat16)
    for N2 in (2048, 4096, 8192):
        x = jax.random.normal(key, (N2, N2), jnp.bfloat16)
        t = timeit(f"matmul {N2}^3 bf16", lambda x: (x @ x).sum(), x)
        print(f"  -> {2*N2**3/t/1e12:.1f} TF/s")

    # int8 matmul
    xi = jax.random.randint(key, (4096, 4096), -127, 127, jnp.int8)
    try:
        t = timeit(
            "matmul 4096^3 int8->int32",
            lambda x: jax.lax.dot_general(
                x, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).sum(),
            xi,
        )
        print(f"  -> {2*4096**3/t/1e12:.1f} TOPS")
    except Exception as e:
        print("  int8 failed:", e)

    # scatter SET (not add), sorted indices — densify candidate
    rows = 1_000_000
    src = jax.random.normal(key, (1_100_000, 16), jnp.bfloat16)
    idx_sorted = jnp.sort(jax.random.randint(key, (1_100_000,), 0, rows, jnp.int32))

    def scat_set(s, ix):
        z = jnp.zeros((rows, 16), jnp.bfloat16)
        return z.at[ix].set(s, mode="drop", unique_indices=False).sum()

    t = timeit("scatter-SET 1.1M sorted rows of 32B", scat_set, src, idx_sorted)
    print(f"  -> {t/1.1e6*1e9:.1f} ns/row")

    def scat_set_u(s, ix):
        z = jnp.zeros((rows, 16), jnp.bfloat16)
        return z.at[ix].set(s, mode="drop", unique_indices=True).sum()

    t = timeit("scatter-SET unique sorted", scat_set_u, src, idx_sorted)
    print(f"  -> {t/1.1e6*1e9:.1f} ns/row")

    # segment-sum via matmul-free: sorted-order reduction (for strided conv):
    # children are CONSECUTIVE in parent order after sorting by parent key ->
    # reduce via jnp.add.reduceat-equivalent: diff-of-cumsum at boundaries.
    v = jax.random.normal(key, (2_000_000, 16), jnp.bfloat16)
    seg = jnp.sort(jax.random.randint(key, (2_000_000,), 0, rows, jnp.int32))

    def segsum(v, seg):
        c = jnp.cumsum(v.astype(jnp.float32), axis=0)
        is_last = jnp.concatenate([seg[1:] != seg[:-1], jnp.ones((1,), bool)])
        # gather cumsum at last position of each segment, then diff
        idx = jnp.where(is_last, jnp.arange(seg.shape[0]), 0)
        z = jnp.zeros((rows + 1, 16), jnp.float32)
        z = z.at[jnp.where(is_last, seg, rows)].set(c[idx], mode="drop")
        return z.sum()

    timeit("segsum-cumsum 2M rows -> 1M segs", segsum, v, seg)

    # dense 5x5 conv (stem-like) 1->8 at a 2D-collapsed L1 scale
    x = jax.random.normal(key, (10, 1200, 1000, 1), jnp.bfloat16)
    w = jax.random.normal(key, (5, 5, 1, 8), jnp.bfloat16)

    def conv2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).sum()

    t = timeit("dense 2D conv (10,1200,1000) 5x5 1->8", conv2, x, w)
    print(f"  -> {2*10*1200*1000*25*8/t/1e12:.2f} TF/s")


if __name__ == "__main__":
    main()
