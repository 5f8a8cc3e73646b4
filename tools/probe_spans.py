"""Per-plan span-coverage probe at bench scale.

For every span plan the model builds (both networks), reports:
  - jump blocks: blocks whose key interval exceeds the configured span
    (these DROP contributions on the minority side of the median anchor)
  - exact dropped (site, group) coverage count (make_span_plan exact_stats)
  - the interval-length distribution (p99 / p99.9 / max, in rows) and the
    minimal span (rounded up to 16) that would make jumps == 0.

Run on TPU:  python tools/probe_spans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.sparse.slab import build_slab, derive_strided_sites, slab_from_sparse
    from insmos_tpu.sparse.span_conv import _bisect, make_span_plan
    from insmos_tpu.sparse.slab import _groups_yz
    from insmos_tpu.sparse.convs import strided_conv_sites
    from insmos_tpu.sparse.voxelize import voxelize_points
    import math

    import os

    cfg = _bench_cfg()
    mc = cfg.model.motionnet
    W = cfg.model.n_past_steps
    gen = os.environ.get("INSMOS_PROBE_GEN", "hdl64")
    if gen == "hdl64":
        from insmos_tpu.data.hdl64 import make_hdl64_window

        sample = make_hdl64_window(cfg, seed=0)
    else:
        sample = make_window(cfg)
    # n_filled < W simulates a warm-up window (suffix slots filled)
    n_filled = int(os.environ.get("INSMOS_PROBE_FILL", str(W)))
    if n_filled < W:
        sample["scan_mask"][: W - n_filled] = False
    print(f"generator={gen} n_filled={n_filled}")
    P = sample["points"].shape[1]
    pts = jnp.asarray(sample["points"])
    pv = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]

    plans = []  # (name, x_keys, out_coords, out_valid, k3, s3, p3, in_dims, span, bs)

    # ---- MotionNet slabs (mirrors nn/minkunet4d.motionnet_forward) ----
    dims1 = mc.grid_size
    caps = mc.site_capacities
    lo = jnp.asarray(mc.crop_range[:3], jnp.float32)
    coords3 = jnp.floor((pts[..., :3].reshape(-1, 3) - lo) * 10.0).astype(jnp.int32)
    tcol = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, P)
    ).reshape(-1)

    cdiv = lambda a, b: -(-a // b)
    level_dims = lambda d, f: tuple(cdiv(x, f) for x in d)

    mdims = {f: level_dims(dims1, f) for f in (1, 2, 4, 8)}

    @jax.jit
    def build_m():
        slab1, _, n1, _ = build_slab(
            coords3, tcol, pv.reshape(-1), dims1, W, caps[0]
        )
        out = {1: slab1}
        for fin, fout, cap in ((1, 2, caps[1]), (2, 4, caps[2]), (4, 8, caps[3])):
            nxt, _, _ = derive_strided_sites(
                out[fin], (2, 2, 2), (2, 2, 2), (0, 0, 0), mdims[fout], cap
            )
            out[fout] = nxt
        return out

    mslabs = build_m()
    plans.append(("M stem 5^3", mslabs[1], mslabs[1], (5, 5, 5), (1, 1, 1), None, mdims[1], 384, 128))
    plans.append(("M t1 3^3", mslabs[1], mslabs[1], (3, 3, 3), (1, 1, 1), None, mdims[1], 256, 128))
    plans.append(("M t2 3^3", mslabs[2], mslabs[2], (3, 3, 3), (1, 1, 1), None, mdims[2], 256, 128))
    plans.append(("M t4 3^3", mslabs[4], mslabs[4], (3, 3, 3), (1, 1, 1), None, mdims[4], 256, 128))
    plans.append(("M t8 3^3", mslabs[8], mslabs[8], (3, 3, 3), (1, 1, 1), None, mdims[8], 512, 128))
    for fin, fout in ((1, 2), (2, 4), (4, 8)):
        plans.append((
            f"M down{fout} 2^3", mslabs[fin], mslabs[fout], (2, 2, 2),
            (2, 2, 2), (0, 0, 0), mdims[fin], 256, 128,
        ))

    # ---- UNet slabs (mirrors nn/unet3d.unet3d_forward) ----------------
    gx, gy, gz = cfg.data.grid_size
    udims = {s: (cdiv(gx, s), cdiv(gy, s), cdiv(gz, s)) for s in (1, 2, 4, 8)}
    ucaps = cfg.model.unet_capacities
    cur = pts[W - 1]
    curv = pv[W - 1]

    @jax.jit
    def build_u():
        x, _ = voxelize_points(
            jnp.concatenate([cur, jnp.zeros((P, 3), cur.dtype)], -1),
            curv, cfg.data.point_cloud_range, cfg.data.voxel_size,
            cfg.data.grid_size, ucaps[0], cfg.model.max_points_per_voxel,
        )
        level = {1: x}
        slabs = {1: slab_from_sparse(x)}
        for lvl, stride in ((2, 2), (3, 4), (4, 8)):
            fin = stride // 2
            sites, _, _ = strided_conv_sites(
                level[fin], (3, 3, 3), (2, 2, 2), (1, 1, 1),
                udims[stride], ucaps[lvl - 1], with_pairs=True,
            )
            level[stride] = sites
            slabs[stride] = slab_from_sparse(sites.sites())
        dims_out = (udims[8][0], udims[8][1], (udims[8][2] - 3) // 2 + 1)
        sites_out, _, _ = strided_conv_sites(
            level[8], (1, 1, 3), (1, 1, 2), (0, 0, 0), dims_out, ucaps[4],
            with_pairs=True,
        )
        slab_out = slab_from_sparse(sites_out.sites())
        return slabs, slab_out, dims_out

    uslabs, uslab_out, udims_out = build_u()
    uslabs = dict(uslabs)
    uslabs["out"] = uslab_out
    for s in (1, 2, 4):
        plans.append((f"U t{s} 3^3", uslabs[s], uslabs[s], (3, 3, 3), (1, 1, 1), None, udims[s], 256, 128))
    plans.append(("U t8 3^3", uslabs[8], uslabs[8], (3, 3, 3), (1, 1, 1), None, udims[8], 512, 128))
    for fin, fout in ((1, 2), (2, 4), (4, 8)):
        plans.append((
            f"U down{fout} 3^3s2", uslabs[fin], uslabs[fout], (3, 3, 3),
            (2, 2, 2), (1, 1, 1), udims[fin], 256, 128,
        ))
    plans.append((
        "U out z3s2", uslabs[8], uslabs["out"], (1, 1, 3), (1, 1, 2),
        (0, 0, 0), udims[8], 384, 128,
    ))

    # ---- per-plan interval stats --------------------------------------
    print(f"{'plan':18s} {'Vout':>8s} {'jump':>6s} {'exact':>8s} "
          f"{'slots':>6s} {'p99':>6s} {'p999':>6s} {'max':>7s} "
          f"{'span0':>6s} cfg_span")

    def intervals(x_keys, out_coords, out_valid, k3, s3, p3, in_dims, bs):
        kx = int(k3[0])
        if p3 is None:
            p3 = tuple((k - 1) // 2 for k in k3)
        groups = _groups_yz(k3)
        V = out_coords.shape[0]
        NB = -(-V // bs)
        Vp = NB * bs

        def padV(a, fill):
            return jnp.concatenate(
                [a, jnp.full((Vp - V,) + a.shape[1:], fill, a.dtype)]
            ) if Vp > V else a

        oc = padV(out_coords, 0)
        ov = padV(out_valid.astype(jnp.int32), 0)
        X, Y, Z = in_dims
        sx, sy, sz = s3
        px, py, pz = p3
        ky = jnp.asarray([g[0] for g in groups], jnp.int32)
        kz = jnp.asarray([g[1] for g in groups], jnp.int32)

        def block_q(c3, v, fill):
            iy = c3[:, 1] * sy - py + ky[:, None]
            iz = c3[:, 2] * sz - pz + kz[:, None]
            q = (iz * Y + iy) * X + (c3[:, 0] * sx - px)[None]
            return jnp.where(v[None] > 0, q, fill)

        BIG = jnp.iinfo(jnp.int32).max
        vblk = ov.reshape(NB, bs)
        nv = vblk.sum(axis=1)
        base = jnp.arange(NB, dtype=jnp.int32) * bs
        last_i = base + jnp.maximum(nv - 1, 0)
        firsts = block_q(oc[::bs], ov[::bs], BIG)
        lasts = block_q(jnp.take(oc, last_i, axis=0), (nv > 0).astype(jnp.int32), -1)
        n_iter = max(1, math.ceil(math.log2(x_keys.shape[0] + 1)))
        pos = _bisect(x_keys, jnp.stack([firsts, lasts + kx]), n_iter)
        sb_head = pos[0] // 16
        send = pos[1]
        ln = jnp.maximum(send - sb_head * 16, 0)  # needed span rows
        live = (nv > 0)[None] & (firsts != BIG)
        return jnp.where(live, ln, 0)

    iv_fn = jax.jit(intervals, static_argnames=("k3", "s3", "p3", "in_dims", "bs"))

    for name, xs, os_, k3, s3, p3, in_dims, span, bs in plans:
        ln = np.asarray(iv_fn(xs.keys, os_.coords, os_.valid, k3, s3, p3, in_dims, bs))
        flat = ln[ln > 0]
        jump = int((ln > span).sum())
        plan = make_span_plan(
            xs.keys, os_.coords, os_.valid, k3,
            stride3=s3, pad3=p3, in_dims=in_dims, span=span, bs=bs,
            slots=16384, gwin=64, pairs=8192,
        )
        exact = int(plan.n_overflow)
        slots_used = int((np.asarray(plan.gs)[1] >= 0).sum())
        p99 = int(np.percentile(flat, 99)) if flat.size else 0
        p999 = int(np.percentile(flat, 99.9)) if flat.size else 0
        mx = int(flat.max()) if flat.size else 0
        span0 = -(-mx // 16) * 16
        print(f"{name:18s} {int(np.asarray(os_.valid).sum()):>8d} {jump:>6d} "
              f"{exact:>8d} {slots_used:>6d} {p99:>6d} {p999:>6d} {mx:>7d} "
              f"{span0:>6d} {span}", flush=True)


if __name__ == "__main__":
    main()
