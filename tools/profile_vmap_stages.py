"""Which stage pessimizes under vmap? Times jit(vmap(stage, S)) vs the
single-stream stage at bench scale; per-stream cost should stay flat or
drop (launch amortization). A stage whose per-stream cost RISES under
vmap explains the multi-stream bench regression.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/profile_vmap_stages.py [S]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _fence(out):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.size))


def timeit(fn, args, name, iters=5):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn.minkunet4d import motionnet_forward
    from insmos_tpu.nn.model import InsMOSModel
    from insmos_tpu.nn.unet3d import unet3d_forward
    from insmos_tpu.sparse import voxelize_points

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = _bench_cfg()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    seqs = [make_window(cfg, seed=s) for s in range(S)]
    W, P = seqs[0]["points"].shape[:2]
    pts = jnp.asarray(np.stack([s["points"] for s in seqs]))  # (S, W, P, 4)
    pv = jnp.asarray(
        np.stack(
            [
                (np.arange(P)[None] < s["num_points"][:, None])
                & s["scan_mask"][:, None]
                for s in seqs
            ]
        )
    )

    # ---- motionnet ----
    def motion1(p, s, x, v):
        return motionnet_forward(p, s, cfg, x, v, train=False)[0]

    t1 = timeit(
        jax.jit(motion1),
        (params["motion"], state["motion"], pts[0], pv[0]),
        "motion single",
    )
    tS = timeit(
        jax.jit(jax.vmap(motion1, in_axes=(None, None, 0, 0))),
        (params["motion"], state["motion"], pts, pv),
        f"motion vmap S={S}",
    )
    print(f"  per-stream ratio: {tS / S / t1:.2f}x", flush=True)

    # ---- voxelize ----
    cur7 = jnp.concatenate(
        [pts[:, W - 1], jnp.zeros((S, P, 3), jnp.float32)], axis=-1
    )
    cv = pv[:, W - 1]

    def vox1(c, v):
        return voxelize_points(
            c, v, cfg.data.point_cloud_range, cfg.data.voxel_size,
            cfg.data.grid_size, cfg.model.unet_capacities[0],
            cfg.model.max_points_per_voxel,
        )

    t1 = timeit(jax.jit(vox1), (cur7[0], cv[0]), "voxelize single")
    tS = timeit(
        jax.jit(jax.vmap(vox1)), (cur7, cv), f"voxelize vmap S={S}"
    )
    print(f"  per-stream ratio: {tS / S / t1:.2f}x", flush=True)

    vox1_j = jax.jit(vox1)
    voxt, _ = vox1_j(cur7[0], cv[0])
    voxS = jax.jit(jax.vmap(vox1))(cur7, cv)[0]

    # ---- unet (with detection inside) ----
    from insmos_tpu.nn.bev_backbone import bev_backbone_forward
    from insmos_tpu.nn.center_head import center_head_forward, decode_and_nms

    def unet1(p, s, x):
        def boxes_fn(bev):
            feat, _ = bev_backbone_forward(p["bev"], s["bev"], cfg, bev, train=False)
            cls_map, box_map = center_head_forward(p["head"], feat)
            boxes8, scores, labels, mask = decode_and_nms(cfg, cls_map, box_map)
            return boxes8, mask

        return unet3d_forward(p["unet"], s["unet"], cfg, x, boxes_fn, train=False)[0]

    t1 = timeit(jax.jit(unet1), (params, state, voxt), "unet single")
    tS = timeit(
        jax.jit(jax.vmap(unet1, in_axes=(None, None, 0))),
        (params, state, voxS),
        f"unet vmap S={S}",
    )
    print(f"  per-stream ratio: {tS / S / t1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
