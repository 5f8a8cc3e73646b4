"""Order-of-magnitude cross-check of the CUDA-baseline denominator
(VERDICT round-2 weak #7 / next-round #7).

bench.py normalizes `vs_baseline` by an assumed 8.33 scans/s (~120 ms per
10-scan window on an RTX 3090, recalled from the InsMOS paper — the repo
publishes no number, BASELINE.md). The reference's CPU/GPU engines
(MinkowskiEngine, spconv) are not installable here, so this script
cross-checks the assumption ANALYTICALLY:

1. counts the reference model's exact sparse-GEMM pair counts on a
   realistic HDL-64E window (data/hdl64.py, statistics-validated fixture)
   by replaying ME/spconv site semantics in numpy (subm: out sites = in
   sites; strided: floor-div dedup; rulebook pairs per kernel offset by
   sorted-key membership — the same math both engines' rulebooks
   implement),
2. converts pairs -> MACs -> FLOPs per component (4D MotionNet, 3D UNet
   encoder/decoder, dense BEV/head),
3. brackets the implied RTX 3090 runtime with published effective
   sparse-conv throughputs and compares the bracket against the assumed
   120 ms.

Run: python tools/baseline_check.py  (CPU, ~1 min)
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def _keys(c, dims):
    """int64 linear keys of integer coords (N, 3|4); dims = (X, Y, Z[, T])."""
    k = c[:, 0].astype(np.int64)
    mul = 1
    for d in range(1, c.shape[1]):
        mul *= int(dims[d - 1])
        k = k + c[:, d].astype(np.int64) * mul
    return k


def _dedup(c, dims):
    k = _keys(c, dims)
    _, idx = np.unique(k, return_index=True)
    return c[idx], np.sort(np.unique(k))


def _pairs(out_c, in_keys, offsets, dims, stride=1):
    """Rulebook pair count: sum over kernel offsets of output sites whose
    (out*stride + offset) input coordinate is occupied. Mirrors
    ME/spconv rulebook construction (SURVEY.md S2.2)."""
    total = 0
    per_off = []
    for off in offsets:
        q = out_c * stride + np.asarray(off, out_c.dtype)
        ok = np.ones(len(q), bool)
        for d in range(q.shape[1]):
            ok &= (q[:, d] >= 0) & (q[:, d] < dims[d])
        qk = _keys(q[ok], dims)
        pos = np.searchsorted(in_keys, qk)
        pos = np.clip(pos, 0, len(in_keys) - 1)
        n = int(np.sum(in_keys[pos] == qk))
        per_off.append(n)
        total += n
    return total


def _offsets(k, center=True):
    """All offsets of an odd (centered) or even (spconv corner) kernel."""
    rngs = []
    for kk in k:
        if center:
            h = (kk - 1) // 2
            rngs.append(range(-h, kk - h))
        else:
            rngs.append(range(kk))
    out = []
    import itertools

    for t in itertools.product(*rngs):
        out.append(t)
    return out


def main():
    from bench import _bench_cfg
    from insmos_tpu.data.hdl64 import make_hdl64_window

    cfg = _bench_cfg()
    W = cfg.model.n_past_steps
    sample = make_hdl64_window(cfg, seed=0)
    pts = sample["points"]
    num = sample["num_points"]

    # ---------------- MotionNet (4D, MinkowskiEngine semantics) --------
    mc = cfg.model.motionnet
    lo = np.asarray(mc.crop_range[:3], np.float32)
    dims1 = np.asarray(mc.grid_size + (W,))
    c4 = []
    for w in range(W):
        p = pts[w, : num[w], :3]
        c3 = np.floor((p - lo) * 10.0).astype(np.int64)
        ok = np.all((c3 >= 0) & (c3 < dims1[:3]), axis=1)
        c3 = c3[ok]
        c4.append(np.concatenate([c3, np.full((len(c3), 1), w, np.int64)], 1))
    c4 = np.concatenate(c4)
    c4, k4 = _dedup(c4, dims1)

    levels = {1: (c4, k4, dims1)}
    for f_in, f_out in ((1, 2), (2, 4), (4, 8)):
        c_in, _, d_in = levels[f_in]
        d_out = np.asarray(
            [-(-int(d_in[0]) // 2), -(-int(d_in[1]) // 2), -(-int(d_in[2]) // 2), W]
        )
        c_out = np.concatenate([c_in[:, :3] // 2, c_in[:, 3:]], 1)
        c_out, k_out = _dedup(c_out, d_out)
        levels[f_out] = (c_out, k_out, d_out)

    pl = mc.planes
    d0 = mc.init_dim
    off_stem = _offsets((5, 5, 5, 1))
    off_b = _offsets((3, 3, 3, 3))
    off_dn = _offsets((2, 2, 2, 1), center=False)

    macs = {}

    def conv4(name, lvl_out, lvl_in, offs, cin, cout, stride=1):
        co, _, _ = levels[lvl_out]
        _, ki, di = levels[lvl_in]
        p = _pairs(co, ki, offs, di, stride=stride)
        macs[name] = p * cin * cout
        return p

    conv4("mn.stem", 1, 1, off_stem, 1, d0)
    conv4("mn.down1", 2, 1, off_dn, d0, d0, stride=2)
    conv4("mn.block1", 2, 2, off_b, d0, pl[0])
    conv4("mn.block1b", 2, 2, off_b, pl[0], pl[0])
    conv4("mn.down2", 4, 2, off_dn, pl[0], pl[0], stride=2)
    conv4("mn.block2", 4, 4, off_b, pl[0], pl[1])
    conv4("mn.block2b", 4, 4, off_b, pl[1], pl[1])
    macs["mn.block2.1x1"] = len(levels[4][0]) * pl[0] * pl[1]
    conv4("mn.down3", 8, 4, off_dn, pl[1], pl[1], stride=2)
    conv4("mn.block3", 8, 8, off_b, pl[1], pl[2])
    conv4("mn.block3b", 8, 8, off_b, pl[2], pl[2])
    macs["mn.block3.1x1"] = len(levels[8][0]) * pl[1] * pl[2]
    # decoder: inverse convs gather each fine site's 2x2x2 parents
    # (pair count == the strided conv's pair count, transposed)
    inv_pairs4 = _pairs(
        levels[4][0], levels[8][1], off_dn, levels[8][2], stride=1
    )  # approximation: fine site -> parent (exact: same rulebook transposed)
    macs["mn.up5"] = _pairs(
        np.concatenate([levels[4][0][:, :3] // 2, levels[4][0][:, 3:]], 1),
        levels[8][1], [(0, 0, 0, 0)], levels[8][2],
    ) * pl[2] * pl[5]
    del inv_pairs4
    conv4("mn.block6", 4, 4, off_b, pl[5] + pl[1], pl[5])
    conv4("mn.block6b", 4, 4, off_b, pl[5], pl[5])
    macs["mn.block6.1x1"] = len(levels[4][0]) * (pl[5] + pl[1]) * pl[5]
    macs["mn.up6"] = _pairs(
        np.concatenate([levels[2][0][:, :3] // 2, levels[2][0][:, 3:]], 1),
        levels[4][1], [(0, 0, 0, 0)], levels[4][2],
    ) * pl[5] * pl[6]
    conv4("mn.block7", 2, 2, off_b, pl[6] + pl[0], pl[6])
    conv4("mn.block7b", 2, 2, off_b, pl[6], pl[6])
    macs["mn.block7.1x1"] = len(levels[2][0]) * (pl[6] + pl[0]) * pl[6]
    macs["mn.up7"] = _pairs(
        np.concatenate([levels[1][0][:, :3] // 2, levels[1][0][:, 3:]], 1),
        levels[2][1], [(0, 0, 0, 0)], levels[2][2],
    ) * pl[6] * pl[7]
    conv4("mn.block8", 1, 1, off_b, pl[7] + d0, pl[7])
    conv4("mn.block8b", 1, 1, off_b, pl[7], pl[7])
    macs["mn.block8.1x1"] = len(levels[1][0]) * (pl[7] + d0) * pl[7]
    macs["mn.final"] = len(levels[1][0]) * pl[7] * mc.out_channels

    # ---------------- UNet (3D, spconv semantics, current scan) --------
    dlo = np.asarray(cfg.data.point_cloud_range[:3], np.float32)
    gs = np.asarray(cfg.data.grid_size)
    p = pts[W - 1, : num[W - 1], :3]
    v3 = np.floor((p - dlo) * 10.0).astype(np.int64)
    ok = np.all((v3 >= 0) & (v3 < gs), axis=1)
    v3 = v3[ok][: cfg.model.max_voxels]
    u1, uk1 = _dedup(v3, gs)
    ulev = {1: (u1, uk1, gs)}
    for f_in, f_out in ((1, 2), (2, 4), (4, 8)):
        ci, _, di = ulev[f_in]
        do = np.asarray([-(-int(di[0]) // 2), -(-int(di[1]) // 2), -(-int(di[2]) // 2)])
        co, ko = _dedup(ci // 2, do)
        ulev[f_out] = (co, ko, do)

    ch = cfg.model.unet_channels
    off3 = _offsets((3, 3, 3))
    # spconv strided k3 s2 p1: out = floor((in + 1) / 2); offsets span the
    # 3^3 neighbourhood of out*2 (corner convention folded into the range)
    nc = 3  # instance one-hot channels

    def conv3(name, lo_, li_, cin, cout, offs=off3, stride=1):
        co, _, _ = ulev[lo_]
        _, ki, di = ulev[li_]
        macs[name] = _pairs(co, ki, offs, di, stride=stride) * cin * cout

    conv3("un.conv_input", 1, 1, 7, ch[0])
    conv3("un.conv1", 1, 1, ch[0], ch[0])
    for lvl, (fi, fo) in zip((2, 3, 4), ((1, 2), (2, 4), (4, 8))):
        conv3(f"un.conv{lvl}_down", fo, fi, ch[lvl - 2], ch[lvl - 1], stride=2)
        conv3(f"un.conv{lvl}_a", fo, fo, ch[lvl - 1], ch[lvl - 1])
        conv3(f"un.conv{lvl}_b", fo, fo, ch[lvl - 1], ch[lvl - 1])
    # conv_out (z-only stride 2) ~ |L8 sites| * 3 taps
    macs["un.conv_out"] = len(ulev[8][0]) * 3 * ch[3] * ch[3]
    # decoder: inv + fuse + up blocks per level (SURVEY spconv_unet.py:319-402)
    for lvl, f in ((4, 8), (3, 4), (2, 2), (1, 1)):
        n_sites = len(ulev[f][0])
        c = ch[lvl - 1]
        conv3(f"un.fuse{lvl}", f, f, c + nc, c)
        conv3(f"un.up_t{lvl}a", f, f, c, c)
        conv3(f"un.up_t{lvl}b", f, f, c, c)
        conv3(f"un.up_m{lvl}", f, f, 2 * c, c)
        if lvl > 1:
            macs[f"un.inv{lvl}"] = (
                len(ulev[f // 2 if f > 1 else 1][0]) * 8 * c * ch[max(lvl - 2, 0)]
            )
    macs["un.mos_head"] = len(ulev[1][0]) * ch[0] * 3

    # ---------------- dense BEV + head ---------------------------------
    H, Wd = gs[1] // 8, gs[0] // 8
    macs["bev.block"] = H * Wd * (256 * 128 + 4 * 128 * 128) * 9
    macs["bev.deconv"] = (2 * H) * (2 * Wd) * 128 * 256 * 4
    macs["head"] = (2 * H) * (2 * Wd) * (256 * 64 * 9 + 64 * 11)

    total = sum(macs.values())
    flops = 2 * total
    mn = 2 * sum(v for k, v in macs.items() if k.startswith("mn."))
    un = 2 * sum(v for k, v in macs.items() if k.startswith("un."))
    dn = flops - mn - un

    print("per-component GFLOPs (one 10-scan window):")
    print(f"  MotionNet 4D : {mn / 1e9:8.2f}")
    print(f"  UNet 3D      : {un / 1e9:8.2f}")
    print(f"  dense BEV/head: {dn / 1e9:8.2f}")
    print(f"  TOTAL        : {flops / 1e9:8.2f}")

    # implied 3090 latency bracket. Effective throughput assumptions:
    #  - dense 2D convs: 30-60% of the 3090's 35.6 TF/s fp32-with-TF32
    #  - sparse rulebook GEMMs (ME 4D + spconv 3D): gather-GEMM-scatter at
    #    small channel widths (8-128) reaches ~5-20% of peak in published
    #    spconv2 benchmarks; ME's 4D path is the slower of the two.
    # plus fixed non-GEMM overhead (voxelize, rulebook build, 4 CPU
    # Array_Index round-trips, NMS D2H) of 15-40 ms (SURVEY.md call stack).
    for eff_sp, eff_dn, ovh in ((0.05, 0.3, 0.040), (0.10, 0.45, 0.025), (0.20, 0.6, 0.015)):
        t = (mn + un) / (35.6e12 * eff_sp) + dn / (35.6e12 * eff_dn) + ovh
        print(
            f"  implied 3090 window time @ sparse-eff {eff_sp:.0%}: "
            f"{t * 1e3:7.1f} ms -> {1 / t:6.2f} scans/s"
        )
    print(
        json.dumps(
            {
                "total_gflops_per_window": round(flops / 1e9, 2),
                "assumed_baseline_scans_per_s": 8.33,
                "bracket_scans_per_s": [
                    round(1 / ((mn + un) / (35.6e12 * 0.05) + dn / (35.6e12 * 0.3) + 0.04), 2),
                    round(1 / ((mn + un) / (35.6e12 * 0.20) + dn / (35.6e12 * 0.6) + 0.015), 2),
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
