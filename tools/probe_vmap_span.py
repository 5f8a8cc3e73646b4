"""Probe: does the span kernel (pallas_call with scalar prefetch + jumbo
input_output_aliases) batch correctly and efficiently under jax.vmap on
TPU? Gates the multi-stream (S sequences per chip) pipeline.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_vmap_span.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from insmos_tpu.sparse.span_conv import make_span_plan, span_conv_apply

    rng = np.random.default_rng(0)
    X, Y, Z = 600, 500, 20
    V = 65_536
    C_in, C_out, T = 16, 16, 1
    kx = 3
    S = 4

    def case(seed):
        r = np.random.default_rng(seed)
        flat = np.sort(r.choice(X * Y * Z, size=V, replace=False)).astype(np.int32)
        coords = np.stack(
            [flat % X, (flat // X) % Y, flat // (X * Y)], axis=1
        ).astype(np.int32)
        keys = ((coords[:, 2] * Y + coords[:, 1]) * X + coords[:, 0]).astype(np.int32)
        feats = r.normal(0, 1, (V, T * C_in)).astype(np.float32)
        return keys, coords, feats

    keys = np.stack([case(s)[0] for s in range(S)])
    coords = np.stack([case(s)[1] for s in range(S)])
    feats = np.stack([case(s)[2] for s in range(S)])
    valid = np.ones((S, V), bool)
    w = rng.normal(0, 0.1, (kx * 9, C_in, C_out)).astype(np.float32)

    keys_j = jnp.asarray(keys)
    coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid)
    feats_j = jnp.asarray(feats)
    w_j = jnp.asarray(w, jnp.bfloat16)

    def one(k, c, v, f):
        plan = make_span_plan(
            k, c, v, (3, 3, 3), in_dims=(X, Y, Z), span=256, bs=128,
            slots=512, gwin=16,
        )
        return span_conv_apply(k, f, c, v, w_j, plan, T), plan.n_overflow

    # reference: python loop
    outs_ref = []
    f_one = jax.jit(one)
    for s in range(S):
        o, novf = f_one(keys_j[s], coords_j[s], valid_j[s], feats_j[s])
        outs_ref.append(np.asarray(o))
        print(f"serial stream {s}: overflow={int(novf)}", flush=True)

    # vmapped
    try:
        f_vmap = jax.jit(jax.vmap(one))
        outs_v, novf_v = f_vmap(keys_j, coords_j, valid_j, feats_j)
        outs_v = np.asarray(outs_v)
        for s in range(S):
            d = np.abs(outs_v[s] - outs_ref[s]).max()
            print(f"vmap stream {s}: maxdiff={d:.2e}", flush=True)
            assert d < 1e-3, (s, d)
        print("vmap CORRECT", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"vmap FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
        return

    # timing: serial x4 vs vmap(4)
    def fence(x):
        return float(jnp.sum(x[0][..., :1].astype(jnp.float32)))

    def serial_all():
        outs = [f_one(keys_j[s], coords_j[s], valid_j[s], feats_j[s]) for s in range(S)]
        return outs[-1]

    fence(serial_all())
    t0 = time.perf_counter()
    for _ in range(10):
        o = serial_all()
    fence(o)
    t_serial = (time.perf_counter() - t0) / 10 * 1000

    fence((outs_v,))
    ov = f_vmap(keys_j, coords_j, valid_j, feats_j)
    fence(ov)
    t0 = time.perf_counter()
    for _ in range(10):
        ov = f_vmap(keys_j, coords_j, valid_j, feats_j)
    fence(ov)
    t_vmap = (time.perf_counter() - t0) / 10 * 1000
    print(f"serial {S} streams: {t_serial:.2f} ms   vmap: {t_vmap:.2f} ms "
          f"({t_serial / t_vmap:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
