"""Find a compilable per-lane gather variant: sweep sublane extents/dtypes."""

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

    def try_case(S, dtype, NB=64, name=""):
        op = jnp.asarray(rng.normal(size=(NB * S, 128)).astype(dtype))
        idx = jnp.asarray(rng.integers(0, S, (NB * S, 128)).astype(np.int32))

        def kern(o_ref, i_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(o_ref[:], i_ref[:], axis=0)

        @jax.jit
        def f(o, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((NB * S, 128), dtype),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((S, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            )(o, idx)

        try:
            got = np.asarray(f(op, idx))
            blk = np.asarray(op)[:S]
            exp = np.take_along_axis(blk, np.asarray(idx)[:S], axis=0)
            ok = np.allclose(got[:S], exp)
            print(f"{name}: compiled, semantics={'OK' if ok else 'MISMATCH'}", flush=True)
            return ok
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
            return False

    try_case(8, np.float32, name="S=8 f32")
    try_case(32, np.float32, name="S=32 f32")
    try_case(32, np.int32, name="S=32 i32")
    try_case(128, np.float32, name="S=128 f32")
    try_case(256, np.float32, NB=8, name="S=256 f32")


if __name__ == "__main__":
    main()
