"""Probe: Pallas MXU rates for span-kernel dot shapes.

Decision gate for the one-wide-dot extraction rewrite: is ONE
(128, 256) @ (256, 384) dot faster than THREE (128, 256) @ (256, 128)
dots (same FLOPs)? Also checks fold-shaped dots and M/N scaling.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_dotshapes.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    REP = 64  # dots per kernel invocation (amortize launch)

    def make_bench(M, K, N, n_dots, dtype=jnp.bfloat16):
        def kern(a_ref, b_ref, o_ref):
            acc = jnp.zeros((M, N), jnp.float32)
            for r in range(REP):
                for d in range(n_dots):
                    acc += jax.lax.dot_general(
                        a_ref[...], b_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            o_ref[...] = acc

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)

        return run

    key = jax.random.PRNGKey(0)

    def timeit(name, M, K, N, n_dots, iters=20):
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N), jnp.bfloat16)
        f = make_bench(M, K, N, n_dots)
        out = f(a, b)
        float(jnp.sum(out[:1, :1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(a, b)
        float(jnp.sum(out[:1, :1]))
        dt = (time.perf_counter() - t0) / iters / REP / n_dots
        fl = 2 * M * K * N
        print(
            f"{name:40s} {dt * 1e6:8.2f} us/dot  {fl / dt / 1e12:6.1f} TF/s",
            flush=True,
        )

    timeit("extract (128,256)@(256,128)", 128, 256, 128, 1)
    timeit("extract x3 shapes", 128, 256, 128, 3)
    timeit("wide-N (128,256)@(256,384)", 128, 256, 384, 1)
    timeit("wide-N (128,256)@(256,512)", 128, 256, 512, 1)
    timeit("wide-N (128,256)@(256,1024)", 128, 256, 1024, 1)
    timeit("fold (128,384)@(384,128)", 128, 384, 128, 1)
    timeit("fold wide (128,384)@(384,384)", 128, 384, 384, 1)
    timeit("M256 (256,256)@(256,128)", 256, 256, 128, 1)
    timeit("M256 wide (256,256)@(256,384)", 256, 256, 384, 1)
    timeit("M512 wide (512,256)@(256,512)", 512, 256, 512, 1)
    timeit("bigK (128,1024)@(1024,128)", 128, 1024, 128, 1)
    timeit("bigK (128,4096)@(4096,128)", 128, 4096, 128, 1)


if __name__ == "__main__":
    main()
