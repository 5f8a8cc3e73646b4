"""Mosaic per-lane gather (take_along_axis, indices.shape == operand.shape):
semantics check + throughput. This is the candidate core of the row-lane
sparse conv engine."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # operand (S, 128) per grid step; indices same shape: out[i,l] = op[idx[i,l], l]
    S = 256  # sublane extent per block (row slots x channels packed)
    NB = 4096  # number of 128-row batches -> total gathers = NB*S*128 = 134M
    op = jnp.asarray(rng.normal(size=(NB * S, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, (NB * S, 128)).astype(np.int32))

    def kern(o_ref, i_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(o_ref[:], i_ref[:], axis=0)

    @jax.jit
    def lane_gather(o, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NB * S, 128), jnp.float32),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        )(o, i)

    try:
        got = np.asarray(lane_gather(op, idx))
    except Exception as e:  # noqa: BLE001
        print(f"lane gather: LOWERING FAIL {type(e).__name__}: {str(e)[:300]}")
        return
    # semantics: within block b, out[i, l] = op[b*S + idx[b*S+i, l], l]?
    opn, idxn = np.asarray(op), np.asarray(idx)
    exp = np.empty_like(opn)
    for b in range(2):  # spot-check 2 blocks
        blk = opn[b * S : (b + 1) * S]
        ib = idxn[b * S : (b + 1) * S]
        exp[b * S : (b + 1) * S] = np.take_along_axis(blk, ib, axis=0)
    ok = np.array_equal(got[: 2 * S], exp[: 2 * S])
    print(f"semantics (block-local take_along_axis): {ok}", flush=True)
    if not ok:
        bad = np.argwhere(got[: 2 * S] != exp[: 2 * S])[:3]
        print("sample mismatches:", bad, flush=True)
        return

    def bench(fn, args, iters=5, name=""):
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters * 1000
        total = NB * S * 128
        print(f"{name:48s} {dt:9.2f} ms  ({total/1e6:.0f}M elems -> {dt*1e6/total:.3f} ns/elem)",
              flush=True)

    bench(lane_gather, (op, idx), 5, "pallas per-lane gather f32")


if __name__ == "__main__":
    main()
