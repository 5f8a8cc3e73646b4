"""Prototype + measure the Pallas rowdense subm-conv kernel core (real TPU).

Workload: L1-4D-like — R=400k dense rows, W=16 slots, cin=cout=16, kernel
3^4 => G=27 groups x kx=3. Variants:
  A) select-accumulate: for each (g, dx, j): mask-compare + masked add into
     an im2col VMEM tile, then one MXU dot per program.
  B) same but per-group dot (nfw first), accumulate in f32.
Correctness checked against a jnp reference on a small case.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = jnp.int32(2**30)


def make_level(key, R, W, C, X, density):
    """Random rowdense level: xs (R, W) ascending with sentinel pad, feats
    (R, W*C) bf16."""
    kx, kf, kn = jax.random.split(key, 3)
    counts = jnp.minimum(
        jax.random.poisson(kn, density, (R,)).astype(jnp.int32), W
    )
    r = jax.random.uniform(kx, (R, W))
    xs = jnp.sort((r * X).astype(jnp.int32), axis=1)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1) < counts[:, None]
    xs = jnp.where(slot_ok, xs, SENT)
    # dedupe within row (make strictly increasing where valid)
    xs = jnp.where(
        jnp.concatenate([xs[:, :1], jnp.maximum(xs[:, 1:], xs[:, :-1] + 1)], 1),
        xs, xs)
    xs = jnp.minimum(xs, SENT)
    feats = (jax.random.normal(kf, (R, W * C)) * slot_ok.repeat(C, 1)).astype(
        jnp.bfloat16
    )
    return xs, feats


def ref_conv(xs, feats, w, shifts, x_off, R, W, C, COUT):
    """jnp reference: for each group shift s (flat row offset), neighbor row
    r+s; match nx == x + dx."""
    f3 = feats.reshape(R, W, C).astype(jnp.float32)
    out = jnp.zeros((R, W, COUT), jnp.float32)
    G = len(shifts)
    kx = len(x_off)
    w4 = w.reshape(G, kx, C, COUT).astype(jnp.float32)
    for g, s in enumerate(shifts):
        nxs = jnp.roll(xs, -s, axis=0)
        nf = jnp.roll(f3, -s, axis=0)
        if s > 0:
            nxs = nxs.at[-s:].set(SENT)
        elif s < 0:
            nxs = nxs.at[:-s].set(SENT)
        for dxi, dx in enumerate(x_off):
            m = (nxs[:, None, :] == xs[:, :, None] + dx) & (
                xs[:, :, None] < SENT
            )
            out = out + jnp.einsum("rij,rjc,cd->rid", m.astype(jnp.float32), nf, w4[g, dxi])
    return out


def pallas_conv(xs, feats, w, shifts, x_off, RB, COUT, interpret=False):
    """Variant B kernel: per program block of RB rows; per group: DMA-free
    block-shifted reads via index_map trick is impossible for arbitrary
    shifts, so inputs are pre-shifted? NO — we pass full arrays in ANY/HBM
    and DMA slices."""
    R, W = xs.shape
    C = feats.shape[1] // W
    G = len(shifts)
    kx = len(x_off)
    WC = W * C
    w_rs = np.asarray(w, np.float32).reshape(G, kx, C, COUT)
    # fold (kx, C) into one matrix per group: (kx*C, COUT)
    wg = jnp.asarray(w_rs.reshape(G, kx * C, COUT), jnp.bfloat16)
    # static block-diagonal mask: rows (dxi, w, c), cols (w', o)
    _w_of_row = np.repeat(np.tile(np.repeat(np.arange(W), C), kx), 1)
    _w_of_col = np.repeat(np.arange(W), COUT)
    bd_mask = jnp.asarray(
        (_w_of_row[:, None] == _w_of_col[None, :]).astype(np.float32),
        jnp.bfloat16,
    )
    maxs = max(abs(s) for s in shifts)
    # pad arrays so r+s never goes out of bounds
    xs_p = jnp.concatenate(
        [jnp.full((maxs, W), SENT, jnp.int32), xs, jnp.full((maxs, W), SENT, jnp.int32)]
    )
    f_p = jnp.concatenate(
        [jnp.zeros((maxs, WC), jnp.bfloat16), feats, jnp.zeros((maxs, WC), jnp.bfloat16)]
    )
    shifts_arr = jnp.asarray([s + maxs for s in shifts], jnp.int32)  # >= 0

    def kernel(shift_ref, xs_hbm, f_hbm, w_ref, bdm_ref, out_ref, cx_v, nxs_v, nf_v, im_v, acc_v, sem0, sem1, sem2):
        i = pl.program_id(0)
        base = i * RB

        acc_v[:] = jnp.zeros((RB, W * COUT), jnp.float32)
        d0 = pltpu.make_async_copy(
            xs_hbm.at[pl.ds(base + maxs, RB), :], cx_v, sem0
        )
        d0.start()
        d0.wait()
        cx = cx_v[:]  # center xs (RB, W)

        def group_body(g, _):
            off = shift_ref[g]
            d1 = pltpu.make_async_copy(
                xs_hbm.at[pl.ds(base + off, RB), :], nxs_v, sem1
            )
            d1.start()
            d2 = pltpu.make_async_copy(
                f_hbm.at[pl.ds(base + off, RB), :], nf_v, sem2
            )
            d2.start()
            d1.wait()
            d2.wait()
            nxs = nxs_v[:]  # (RB, W)
            nf = nf_v[:]  # (RB, W*C) — block j at [:, j*C:(j+1)*C]
            # build im2col (RB, kx * W*C), layout (dxi, w, c), by
            # select-accumulate over candidate slots j — all 2-D ops
            gats = []
            for dxi, dx in enumerate(x_off):
                gat = jnp.zeros((RB, W * C), jnp.bfloat16)
                for j in range(W):
                    m = (nxs[:, j][:, None] == cx + dx).astype(jnp.bfloat16)
                    m_exp = pltpu.repeat(m, C, axis=1)  # (RB, W*C)
                    nf_j = jnp.concatenate([nf[:, j * C : (j + 1) * C]] * W, axis=1)
                    gat = gat + m_exp * nf_j
                gats.append(gat)
            im_v[:] = jnp.concatenate(gats, axis=-1)
            # block-diagonal weight expansion built in-register from the
            # (kx*C, COUT) group weight: bd[(dxi,w,c),(w',o)] =
            # wg[(dxi,c),o] * (w == w'); one dot per group:
            # (RB, kx*W*C) @ (kx*W*C, W*COUT)
            wgg = w_ref[g]  # (kx*C, COUT)
            verts = []
            for dxi in range(kx):
                wd = wgg[dxi * C : (dxi + 1) * C, :]  # (C, COUT)
                verts.append(jnp.concatenate([wd] * W, axis=0))
            vert = jnp.concatenate(verts, axis=0)  # (kx*W*C, COUT)
            bd = jnp.concatenate([vert] * W, axis=1) * bdm_ref[:]  # (kxWC, W*COUT)
            part = jnp.dot(im_v[:], bd, preferred_element_type=jnp.float32)
            acc_v[:] = acc_v[:] + part
            return 0

        jax.lax.fori_loop(0, G, group_body, 0)
        out_ref[:] = acc_v[:]

    grid = (R // RB,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, W * COUT), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # xs_p
                pl.BlockSpec(memory_space=pltpu.ANY),  # f_p
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wg
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_mask
            ],
            out_specs=pl.BlockSpec(
                (RB, W * COUT), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((RB, W), jnp.int32),
                pltpu.VMEM((RB, W), jnp.int32),
                pltpu.VMEM((RB, WC), jnp.bfloat16),
                pltpu.VMEM((RB, W * kx * C), jnp.bfloat16),
                pltpu.VMEM((RB, W * COUT), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=interpret,
    )(shifts_arr, xs_p, f_p, wg, bd_mask)


def main():
    key = jax.random.PRNGKey(0)
    # ---- correctness on a small case ----
    R, W, C, COUT, X = 512, 16, 16, 16, 200
    Y = 16  # rows per "z"; shifts for 3x3x3-ish groups
    shifts = [dy + Y * dz for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
    x_off = (-1, 0, 1)
    G, kx = len(shifts), len(x_off)
    xs, feats = make_level(key, R, W, C, X, density=4.0)
    w = jax.random.normal(key, (G * kx, C, COUT), jnp.float32) * 0.1

    ref = ref_conv(xs, feats, w.astype(jnp.bfloat16), shifts, x_off, R, W, C, COUT)
    got = pallas_conv(xs, feats, w, shifts, x_off, RB=256, COUT=COUT)
    got = got.reshape(R, W, COUT)
    err = jnp.max(jnp.abs(ref - got))
    print("max abs err vs ref:", float(err))
    assert err < 0.2, "MISMATCH"

    # ---- perf at L1-4D scale ----
    R, W, C, COUT = 399_360, 16, 16, 16
    Y = 1000
    shifts = [dy + Y * dz for dz in (-1, 0, 1) for dy in (-1, 0, 1)] * 3  # 27 groups (t via same mag)
    shifts = [s + 40_000 * dt for dt in (-1, 0, 1) for s in shifts[:9]]
    xs, feats = make_level(key, R, W, C, 1200, density=3.0)
    w = jax.random.normal(key, (27 * kx, C, COUT), jnp.float32) * 0.1

    for RB in (256, 512):
        f = functools.partial(
            pallas_conv, shifts=shifts, x_off=x_off, RB=RB, COUT=COUT
        )
        fj = jax.jit(lambda a, b, c: f(a, b, c).sum())
        r = fj(xs, feats, w)
        float(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = fj(xs, feats, w)
        float(r)
        dt = (time.perf_counter() - t0) / 5
        print(f"pallas rowconv L1 RB={RB}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
