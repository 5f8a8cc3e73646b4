"""Pallas VMEM gather / binary-search throughput probes.

The sparse engine's wall is random access: XLA HBM gather runs ~7ns/elem on
this chip. These kernels test whether Mosaic's in-VMEM dynamic gather (and a
VMEM-resident vectorized binary search) is fast enough to build the sparse
conv around.
"""

import functools
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
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    T = 262_144  # table entries (1MB int32) — VMEM resident
    Q = 4_194_304  # queries

    table = jnp.asarray(rng.integers(0, 2**30, T).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, T, Q).astype(np.int32))

    TILE = 32_768

    def gather_kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pallas_gather(table, idx):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            grid=(Q // TILE,),
            in_specs=[
                pl.BlockSpec((T,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(table, idx)

    try:
        got = pallas_gather(table, idx)
        exp = np.asarray(table)[np.asarray(idx[:100])]
        np.testing.assert_array_equal(np.asarray(got[:100]), exp)
        bench(pallas_gather, (table, idx), 5, f"pallas VMEM gather {Q/1e6:.0f}M from {T/1e3:.0f}k")
    except Exception as e:  # noqa: BLE001
        print(f"pallas VMEM gather: FAILED {type(e).__name__}: {str(e)[:300]}")

    # vectorized binary search in VMEM
    skeys = jnp.asarray(np.sort(rng.integers(0, 2**30, T)).astype(np.int32))
    queries = jnp.asarray(rng.integers(0, 2**30, Q).astype(np.int32))
    STEPS = int(np.ceil(np.log2(T)))

    def bsearch_kernel(keys_ref, q_ref, out_ref):
        q = q_ref[:]
        keys = keys_ref[:]
        lo = jnp.zeros_like(q)
        hi = jnp.full_like(q, T)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            kv = jnp.take(keys, mid, axis=0)
            go_right = kv < q
            return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

        lo, hi = jax.lax.fori_loop(0, STEPS, body, (lo, hi))
        out_ref[:] = lo

    @jax.jit
    def pallas_bsearch(keys, q):
        return pl.pallas_call(
            bsearch_kernel,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            grid=(Q // TILE,),
            in_specs=[
                pl.BlockSpec((T,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(keys, q)

    try:
        got = pallas_bsearch(skeys, queries)
        exp = np.searchsorted(np.asarray(skeys), np.asarray(queries[:200]))
        np.testing.assert_array_equal(np.asarray(got[:200]), exp)
        bench(pallas_bsearch, (skeys, queries), 5,
              f"pallas VMEM bsearch {Q/1e6:.0f}M into {T/1e3:.0f}k ({STEPS} steps)")
    except Exception as e:  # noqa: BLE001
        print(f"pallas VMEM bsearch: FAILED {type(e).__name__}: {str(e)[:300]}")

    # row gather (8 channels) from VMEM
    feats = jnp.asarray(rng.normal(size=(T, 8)).astype(np.float32))
    QR = 1_048_576
    ridx = jnp.asarray(rng.integers(0, T, QR).astype(np.int32))
    RTILE = 16_384

    def rowg_kernel(f_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(f_ref[:], i_ref[:], axis=0)

    @jax.jit
    def pallas_rowg(f, i):
        return pl.pallas_call(
            rowg_kernel,
            out_shape=jax.ShapeDtypeStruct((QR, 8), jnp.float32),
            grid=(QR // RTILE,),
            in_specs=[
                pl.BlockSpec((T, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RTILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RTILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(f, i)

    try:
        got = pallas_rowg(feats, ridx)
        exp = np.asarray(feats)[np.asarray(ridx[:50])]
        np.testing.assert_allclose(np.asarray(got[:50]), exp)
        bench(pallas_rowg, (feats, ridx), 5, f"pallas VMEM row8 gather {QR/1e6:.1f}M from {T/1e3:.0f}k")
    except Exception as e:  # noqa: BLE001
        print(f"pallas VMEM row gather: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
