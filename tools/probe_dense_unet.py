"""Probe: XLA dense 3D conv rates at UNet level shapes (T=1) on the TPU.

The round-2 dense-vs-span probe (probe_dense_level) tested MOTION levels,
where the dense T axis multiplies cells 10x and dense loses. UNet levels
are T=1 with far fewer cells: s8 = 150x125x5, s4 = 300x250x10,
s2 = 600x500x20, s1 = 1200x1000x40. If XLA dense convs at C=16..128 run
near MXU rate, the whole s2..s8 UNet tier (convs + site sorts + plans +
pair recording) collapses into dense convs + occupancy masks.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_dense_unet.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    def timeit(fn, args, name, flops, iters=10):
        out = fn(*args)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name:44s} {dt * 1000:8.2f} ms  {flops / dt / 1e12:6.1f} TF/s",
            flush=True,
        )

    key = jax.random.PRNGKey(0)

    def conv3d(x, w, stride=(1, 1, 1), pad="SAME"):
        # x: (1, X, Y, Z, C), w: (3, 3, 3, Cin, Cout)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=pad,
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32,
        )

    shapes = [
        # (name, dims, cin, cout, stride)
        ("s8 subm 64->64", (150, 125, 5), 64, 64, (1, 1, 1)),
        ("s8 subm 128->128", (150, 125, 5), 128, 128, (1, 1, 1)),
        ("s4 subm 64->64", (300, 250, 10), 64, 64, (1, 1, 1)),
        ("s4 down 32->64 s2", (600, 500, 20), 32, 64, (2, 2, 2)),
        ("s2 subm 32->32", (600, 500, 20), 32, 32, (1, 1, 1)),
        ("s2 down 16->32 s2", (1200, 1000, 40), 16, 32, (2, 2, 2)),
        ("s1 subm 16->16", (1200, 1000, 40), 16, 16, (1, 1, 1)),
        ("s2 subm 32->32 bf16", (600, 500, 20), 32, 32, (1, 1, 1)),
        ("s1 subm 16->16 bf16", (1200, 1000, 40), 16, 16, (1, 1, 1)),
    ]
    for name, dims, cin, cout, stride in shapes:
        dt = jnp.bfloat16 if "bf16" in name else jnp.float32
        x = jax.random.normal(key, (1, *dims, cin), dt)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05
        ocells = 1
        for d, s in zip(dims, stride):
            ocells *= -(-d // s)
        flops = 2 * ocells * 27 * cin * cout
        f = jax.jit(lambda a, b, s=stride: conv3d(a, b, stride=s))
        try:
            timeit(f, (x, w), name, flops)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED {type(e).__name__}: {e}", flush=True)

    # transposed conv (decoder inverse): s4 -> s2
    x = jax.random.normal(key, (1, 300, 250, 10, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 32, 64), jnp.bfloat16) * 0.05

    def tconv(x, w):
        return jax.lax.conv_transpose(
            x, w, strides=(2, 2, 2), padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NXYZC", "XYZOI", "NXYZC"),
            preferred_element_type=jnp.float32,
        )

    flops = 2 * 600 * 500 * 20 * 27 * 64 * 32 // 8  # /8: stride-2 sparsity of taps
    timeit(jax.jit(tconv), (x, w), "inv s4->s2 tconv 64->32 bf16", flops)


if __name__ == "__main__":
    main()
