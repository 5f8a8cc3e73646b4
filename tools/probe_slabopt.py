"""Probe optimized formulations for the slab-engine hot ops on TPU.

A) table idx extraction: one-hot einsum (current) vs take_along_axis
   vs 256-wide single-take + take_along_axis.
B) conv align+matmul: einsum vdw,vwtc (current) vs flat selects +
   {W_big block-diag | dot_general | reshape-to-(V*T, kx*C)}.

  python tools/probe_slabopt.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def fence(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[0] if isinstance(x, tuple) else x).astype(jnp.float32))


def t(fn, args, iters, name):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:48s} {dt:9.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    iters = 5
    key = jax.random.PRNGKey(0)
    V = 524_288
    kx = 5
    NR = 1_400_000  # ~178M cells / 128

    # ---------------- A: table probe ----------------
    grid2 = jax.random.randint(key, (NR, 256), -1, V).astype(jnp.int32)
    pos = jax.random.randint(key, (V,), 0, 128).astype(jnp.int32)
    row = jax.random.randint(key, (V,), 0, NR).astype(jnp.int32)
    jx = jnp.arange(kx, dtype=jnp.int32)

    def probe_onehot(grid2, row, pos):
        pair = jnp.take(grid2, row, axis=0).astype(jnp.float32)  # (V, 256)
        iota = jnp.arange(256, dtype=jnp.int32)
        onehot = (iota[None, None] == (pos[:, None] + jx[None])[..., None]).astype(
            jnp.float32
        )
        return jnp.einsum("vjw,vw->vj", onehot, pair).astype(jnp.int32)

    def probe_tala(grid2, row, pos):
        pair = jnp.take(grid2, row, axis=0)  # (V, 256) int32
        return jnp.take_along_axis(pair, pos[:, None] + jx[None], axis=1)

    t(jax.jit(probe_onehot), (grid2, row, pos), iters, "A1 probe: take256 + onehot einsum")
    t(jax.jit(probe_tala), (grid2, row, pos), iters, "A2 probe: take256 + take_along_axis")

    def probe_flat(grid2, row, pos):
        # flat element gather: kx independent element fetches
        flat = grid2.reshape(-1)
        idxs = row[:, None] * 256 + pos[:, None] + jx[None]
        return jnp.take(flat, idxs)

    t(jax.jit(probe_flat), (grid2, row, pos), iters, "A3 probe: flat element take (V,kx)")

    # ---------------- B: conv align + matmul ----------------
    for (Vb, T, C, kxx, tag) in ((524_288, 10, 8, 3, "L1 C=8"), (196_608, 10, 32, 3, "L4 C=32")):
        TC = T * C
        win = jax.random.normal(key, (Vb, kxx * TC)).astype(jnp.bfloat16)
        slot = jax.random.randint(key, (kxx, Vb), -1, kxx).astype(jnp.int8)
        w = jax.random.normal(key, (kxx, C, C)).astype(jnp.bfloat16)  # cout=C, kt=1 slice

        def cur(win, slot, w):
            win4 = win.reshape(Vb, kxx, T, C)
            onehot = (
                slot.T[:, :, None] == jnp.arange(kxx, dtype=jnp.int8)[None, None]
            ).astype(jnp.bfloat16)
            aligned = jnp.einsum("vdw,vwtc->vtdc", onehot, win4).reshape(Vb, T, kxx * C)
            wk = w.reshape(kxx * C, C)
            return jnp.einsum("vtk,kc->vtc", aligned, wk, preferred_element_type=jnp.float32)

        def flat_sel(win, slot):
            outs = []
            for d in range(kxx):
                acc = jnp.zeros((Vb, TC), jnp.bfloat16)
                for wslot in range(kxx):
                    seg = win[:, wslot * TC : (wslot + 1) * TC]
                    acc = jnp.where((slot[d] == wslot)[:, None], seg, acc)
                outs.append(acc)
            return outs

        def bigW(win, slot, w):
            outs = flat_sel(win, slot)
            src = jnp.concatenate(outs, axis=-1)  # (V, kx*TC)
            # block-diag weight: (kx*T*C, T*C) with w[d] on the t-diagonal
            eyeT = jnp.eye(T, dtype=jnp.bfloat16)
            Wb = jnp.einsum("ts,dco->dtcso", eyeT, w).reshape(kxx * TC, TC)
            return src @ Wb

        def dotg(win, slot, w):
            outs = flat_sel(win, slot)
            src = jnp.stack(outs, axis=1).reshape(Vb, kxx, T, C)
            return jax.lax.dot_general(
                src, w, (((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (V, T, C)

        def resh(win, slot, w):
            outs = flat_sel(win, slot)
            src = jnp.concatenate(
                [o.reshape(Vb * T, C) for o in outs], axis=-1
            )  # (V*T, kx*C)
            return src @ w.reshape(kxx * C, C)

        t(jax.jit(cur), (win, slot, w), iters, f"B-cur einsum align+matmul {tag}")
        t(jax.jit(bigW), (win, slot, w), iters, f"B-bigW flat selects + blockdiag {tag}")
        t(jax.jit(dotg), (win, slot, w), iters, f"B-dotg flat selects + dot_general {tag}")
        t(jax.jit(resh), (win, slot, w), iters, f"B-resh flat selects + (V*T,kxC) {tag}")


if __name__ == "__main__":
    main()
