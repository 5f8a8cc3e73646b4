"""Per-stage timing of the InsMOS-TPU pipeline on the current platform.

Times each stage as its own jitted function (so inter-stage fusion is lost —
treat as an upper bound per stage, not a sum matching bench.py).

  python tools/profile_stages.py [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def _fence(out):
    """Force a tiny host fetch (block_until_ready does not reliably fence on
    the relay runtime — PERF.md)."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    digest = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(digest)


def timeit(fn, args, iters=5, name=""):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:32s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import os

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.model import InsMOSModel
    from insmos_tpu.nn.minkunet4d import motionnet_forward
    from insmos_tpu.nn.unet3d import unet3d_forward
    from insmos_tpu.nn.bev_backbone import bev_backbone_forward
    from insmos_tpu.nn.center_head import center_head_forward, decode_and_nms
    from insmos_tpu.sparse import voxelize_points

    cfg = _bench_cfg()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    if os.environ.get("INSMOS_PROBE_GEN", "hdl64") == "hdl64":
        from insmos_tpu.data.hdl64 import make_hdl64_window

        sample = make_hdl64_window(cfg)
    else:
        sample = make_window(cfg)
    W, P = sample["points"].shape[:2]
    point_valid = (
        jnp.arange(P)[None, :] < jnp.asarray(sample["num_points"])[:, None]
    ) & jnp.asarray(sample["scan_mask"])[:, None]

    # ---- motion net ----
    @jax.jit
    def motion(params_m, state_m, pts, pv):
        cur, _, _ = motionnet_forward(params_m, state_m, cfg, pts, pv, train=False)
        return cur

    t_motion = timeit(
        motion, (params["motion"], state["motion"], sample["points"], point_valid),
        args.iters, "motionnet (4D UNet)",
    )

    motion_cur = motion(params["motion"], state["motion"], sample["points"], point_valid)
    current7 = jnp.concatenate(
        [jnp.asarray(sample["points"][W - 1]), motion_cur], axis=-1
    )
    cur_valid = point_valid[W - 1]

    # ---- voxelize ----
    @jax.jit
    def vox(c7, cv):
        return voxelize_points(
            c7, cv, cfg.data.point_cloud_range, cfg.data.voxel_size,
            cfg.data.grid_size, cfg.model.unet_capacities[0],
            cfg.model.max_points_per_voxel,
        )

    timeit(vox, (current7, cur_valid), args.iters, "voxelize (PointToVoxel+VFE)")
    voxt, p2v = vox(current7, cur_valid)

    # ---- unet (incl. detection head inside boxes_fn) ----
    @jax.jit
    def unet(p, s, x):
        def boxes_fn(bev):
            feat, _ = bev_backbone_forward(p["bev"], s["bev"], cfg, bev, train=False)
            cls_map, box_map = center_head_forward(p["head"], feat)
            boxes8, scores, labels, mask = decode_and_nms(cfg, cls_map, box_map)
            return boxes8, mask

        logits, bev, _, _ = unet3d_forward(p["unet"], s["unet"], cfg, x, boxes_fn, train=False)
        return logits

    timeit(unet, (params, state, voxt), args.iters, "unet3d + detection + fusion")

    # ---- detection branch alone ----
    bev_in = jnp.zeros(
        (cfg.data.grid_size[1] // 8, cfg.data.grid_size[0] // 8,
         cfg.model.bev.num_bev_features), jnp.float32,
    )

    @jax.jit
    def det(p, s, bev):
        feat, _ = bev_backbone_forward(p["bev"], s["bev"], cfg, bev, train=False)
        cls_map, box_map = center_head_forward(p["head"], feat)
        return decode_and_nms(cfg, cls_map, box_map)

    timeit(det, (params, state, bev_in), args.iters, "bev backbone + head + nms")

    # ---- full forward ----
    @jax.jit
    def full(p, s, x):
        out = model.forward(p, s, x, train=False)
        return out["point_logits"]

    timeit(full, (params, state, sample), args.iters, "FULL forward")


if __name__ == "__main__":
    main()
