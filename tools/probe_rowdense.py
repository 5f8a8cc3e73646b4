"""Measure the primitives the row-dense engine design depends on (real TPU).

Decisions this informs (PERF.md roadmap):
1. batched tiny matmul (R, W, Wk) @ (R, Wk, C) — the within-row one-hot
   match. If this maps to the MXU acceptably, the XLA row-dense engine works.
2. dense 3D conv at L4/L8 scale — whether coarse levels should go dense.
3. large row-gather bandwidth — whether brick-style fetches are viable.
4. bf16 vs f32 matmul peak — what compute_dtype buys.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20, warmup=2):
    fn_j = jax.jit(fn)
    for _ in range(warmup):
        r = fn_j(*args)
    jnp.asarray(r).sum().block_until_ready()
    digest = None
    t0 = time.perf_counter()
    for _ in range(iters):
        digest = fn_j(*args)
    # force a tiny fetch to fence (block_until_ready unreliable on relay)
    float(jnp.asarray(digest).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)

    # 4) matmul peak
    for dt_ in (jnp.float32, jnp.bfloat16):
        a = jax.random.normal(key, (8192, 8192), dt_)
        t = timeit(f"matmul 8192^3 {dt_.__name__}", lambda x: (x @ x).sum(), a)
        print(f"  -> {2*8192**3/t/1e12:.1f} TF/s")

    # 1) batched tiny matmuls (the one-hot mask consume)
    for (R, W, K, C, dt_) in [
        (400_000, 16, 48, 8, jnp.bfloat16),
        (400_000, 16, 48, 8, jnp.float32),
        (100_000, 48, 144, 8, jnp.bfloat16),
        (100_000, 48, 144, 16, jnp.bfloat16),
        (25_000, 96, 288, 32, jnp.bfloat16),
    ]:
        m = jax.random.normal(key, (R, W, K), dt_)
        f = jax.random.normal(key, (R, K, C), dt_)
        t = timeit(
            f"bmm ({R},{W},{K})@({R},{K},{C}) {dt_.__name__}",
            lambda a, b: jnp.einsum("rwk,rkc->rwc", a, b).sum(),
            m,
            f,
        )
        print(f"  -> {2*R*W*K*C/t/1e12:.2f} TF/s effective")

    # 1b) flat big matmul of same total size for comparison
    a = jax.random.normal(key, (400_000 * 16, 48), jnp.bfloat16)
    b = jax.random.normal(key, (48, 8), jnp.bfloat16)
    t = timeit("flat (6.4M,48)@(48,8) bf16", lambda x, y: (x @ y).sum(), a, b)
    print(f"  -> {2*6.4e6*48*8/t/1e12:.2f} TF/s effective")

    # 2) dense 3D conv at L4 scale (T folded into batch): 48->32, 3^3
    x = jax.random.normal(key, (10, 300, 250, 10, 48), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 48, 32), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        ).sum()

    t = timeit("dense conv L4 (10,300,250,10) 48->32 bf16", conv, x, w)
    cells = 10 * 300 * 250 * 10
    print(f"  -> {2*cells*27*48*32/t/1e12:.2f} TF/s effective")

    # 2b) L8-scale 32->32
    x = jax.random.normal(key, (10, 152, 128, 8, 32), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 32, 32), jnp.bfloat16)
    t = timeit("dense conv L8 (10,152,128,8) 32->32 bf16", conv, x, w)
    cells = 10 * 152 * 128 * 8
    print(f"  -> {2*cells*27*32*32/t/1e12:.2f} TF/s effective")

    # 3) gather bandwidth: 10M random row fetches of 64B / 512B
    for (rows, width, n_idx) in [(1_000_000, 16, 10_000_000), (1_000_000, 128, 4_000_000)]:
        tbl = jax.random.normal(key, (rows, width), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, rows, jnp.int32)
        t = timeit(
            f"gather {n_idx} rows of {width*4}B",
            lambda tb, ix: jnp.take(tb, ix, axis=0).sum(),
            tbl,
            idx,
        )
        gb = n_idx * width * 4 / 1e9
        print(f"  -> {gb/t:.0f} GB/s, {t/n_idx*1e9:.2f} ns/row")

    # 5) one-hot mask build: diff-compare (R, W, W) per group
    R, W = 100_000, 48
    xs = jax.random.randint(key, (R, W), 0, 600, jnp.int32)

    def build(xs):
        d = xs[:, None, :] - xs[:, :, None]  # (R, W, W)
        m = [(d == dx).astype(jnp.bfloat16) for dx in (-1, 0, 1)]
        return jnp.stack(m, -1).reshape(R, W, W * 3).sum()

    timeit(f"mask build (R={R},W={W},kx=3)", build, xs)

    # 6) scatter-add throughput (strided convs): 5M adds into 1M rows of 64B
    tgt_rows = 1_000_000
    src = jax.random.normal(key, (5_000_000, 16), jnp.float32)
    idx = jax.random.randint(key, (5_000_000,), 0, tgt_rows, jnp.int32)

    def scat(s, ix):
        z = jnp.zeros((tgt_rows, 16), jnp.float32)
        return z.at[ix].add(s).sum()

    t = timeit("scatter-add 5M rows of 64B", scat, src, idx)
    print(f"  -> {5e6*64/t/1e9:.0f} GB/s, {t/5e6*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
