"""Probe which Mosaic gather forms compile, then time the ones that do."""

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
    print(f"{name:56s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # ---- form 1: row gather, table (T, 128), idx (Q,) -> (Q, 128)
    T, Q, TILE = 8192, 1_048_576, 8192
    table = jnp.asarray(rng.normal(size=(T, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, Q).astype(np.int32))

    def k_rows(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def rows(t, i):
        return pl.pallas_call(
            k_rows,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
            grid=(Q // TILE,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(t, i)

    try:
        got = rows(table, idx)
        np.testing.assert_allclose(
            np.asarray(got[:20]), np.asarray(table)[np.asarray(idx[:20])]
        )
        bench(rows, (table, idx), 5, f"rowgather (T{T},128) idx(Q,) {Q/1e6:.1f}M rows")
    except Exception as e:  # noqa: BLE001
        print(f"rowgather axis0: FAIL {type(e).__name__}: {str(e)[:160]}")

    # ---- form 2: take_along_axis per-lane: table (T, 128), idx (Qr, 128)
    Qr = Q // 128
    idx2 = jnp.asarray(rng.integers(0, T, (Qr, 128)).astype(np.int32))

    def k_tala(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def tala(t, i):
        return pl.pallas_call(
            k_tala,
            out_shape=jax.ShapeDtypeStruct((Qr, 128), jnp.float32),
            grid=(Qr // 512,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(t, i)

    try:
        got = tala(table, idx2)
        exp = np.take_along_axis(np.asarray(table), np.asarray(idx2[:4]), axis=0)
        np.testing.assert_allclose(np.asarray(got[:4]), exp)
        bench(tala, (table, idx2), 5,
              f"take_along_axis lane-gather {Qr*128/1e6:.1f}M elems")
    except Exception as e:  # noqa: BLE001
        print(f"take_along_axis: FAIL {type(e).__name__}: {str(e)[:160]}")

    # ---- form 3: per-lane bsearch using take_along_axis
    # keys laid out (T, 128): lane l holds a full sorted copy? -> instead,
    # keys_col (T, 1) broadcast... use (T, 128) with IDENTICAL columns so
    # any lane can search: memory 8k*128*4 = 4MB for 8k keys. Probe cost.
    keys_sorted = np.sort(rng.integers(0, 2**30, T)).astype(np.int32)
    keys_rep = jnp.asarray(np.broadcast_to(keys_sorted[:, None], (T, 128)).copy())
    q2 = jnp.asarray(rng.integers(0, 2**30, (Qr, 128)).astype(np.int32))
    STEPS = int(np.ceil(np.log2(T)))

    def k_bs(t_ref, q_ref, o_ref):
        q = q_ref[:]
        lo = jnp.zeros_like(q)
        hi = jnp.full_like(q, T)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            kv = jnp.take_along_axis(t_ref[:], mid, axis=0)
            right = kv < q
            return jnp.where(right, mid + 1, lo), jnp.where(right, hi, mid)

        lo, hi = jax.lax.fori_loop(0, STEPS, body, (lo, hi))
        o_ref[:] = lo

    @jax.jit
    def bs(t, q):
        return pl.pallas_call(
            k_bs,
            out_shape=jax.ShapeDtypeStruct((Qr, 128), jnp.int32),
            grid=(Qr // 512,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(t, q)

    try:
        got = bs(keys_rep, q2)
        exp = np.searchsorted(keys_sorted, np.asarray(q2[:2]).ravel()).reshape(2, 128)
        np.testing.assert_array_equal(np.asarray(got[:2]), exp)
        bench(bs, (keys_rep, q2), 5,
              f"per-lane bsearch {Qr*128/1e6:.1f}M queries into {T/1e3:.0f}k ({STEPS} steps)")
    except Exception as e:  # noqa: BLE001
        print(f"per-lane bsearch: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
