"""End-to-end torch-vs-jax golden test (VERDICT round-4 #4).

A reference-layout synthetic state_dict (tests/sd_builder.py) is consumed
two ways:
  (a) through utils/convert.py into our pytrees, then the REAL jitted
      model forward (window engine, f32) on a fully-occupied tiny grid;
  (b) by the dense pure-torch oracle (tests/torch_oracle.py) implementing
      the reference semantics with torch convs on the same grid.
Full occupancy makes every sparse op equal its dense counterpart, so the
diff covers the converter's layout transforms, the engine, and the whole
pipeline wiring — MotionNet logits, MOS point logits, detection maps, and
decoded boxes — the strongest checkpoint-parity evidence available
without the released ckpt (no torch+ME+spconv runtime in this env).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insmos_tpu.config import Config, DataConfig, MotionNetConfig
from insmos_tpu.nn import InsMOSModel
from insmos_tpu.utils import convert as C

pytestmark = pytest.mark.slow

GRID = (16, 16, 48)
RANGE = (-0.8, -0.8, -2.4, 0.8, 0.8, 2.4)


def micro_cfg():
    base = Config()
    P = int(np.prod(GRID))
    return dataclasses.replace(
        base,
        data=DataConfig(point_cloud_range=RANGE),
        model=dataclasses.replace(
            base.model,
            n_past_steps=2,
            max_voxels=P,
            unet_capacities=(P, 2048, 256, 128, 128),
            unet_site_capacity=P,
            motionnet=MotionNetConfig(
                crop_range=RANGE,
                site_capacities=(P, 2048, 256, 128),
                stem_scan_capacity=P,
            ),
        ),
        runtime=dataclasses.replace(
            base.runtime,
            max_points_per_scan=P,
            compute_dtype="float32",
            sparse_engine="window",
        ),
    )


def full_grid_points(rng):
    """One point at every voxel center, x-fastest flat order."""
    X, Y, Z = GRID
    lo = np.array(RANGE[:3])
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij"
    )
    coords = np.stack(
        [xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], -1
    )  # x fastest overall
    xyz = lo[None] + (coords + 0.5) * 0.1
    inten = rng.uniform(0, 1, (len(xyz), 1))
    return np.concatenate([xyz, inten], -1).astype(np.float32), coords


def test_torch_e2e_golden():
    import torch  # noqa: F401  (env guard)

    from sd_builder import make_synthetic_state_dict
    from torch_oracle import (
        bev_head_oracle,
        decode_boxes_np,
        motionnet_oracle,
        unet_oracle,
    )

    cfg = micro_cfg()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    sd = make_synthetic_state_dict(cfg, params, seed=3, cls_bias=2.0)

    # ---- converter path (same machinery as convert_checkpoint) --------
    used = set()
    params2 = dict(params)
    params2["_bev_state"] = state["bev"]
    C.convert_unet(sd, params2["unet"], state["unet"], used)
    C.convert_bev_and_head(sd, params2, used)
    C.convert_motionnet(sd, params2["motion"], state["motion"], used)
    params2.pop("_bev_state")
    unused = [k for k in sd if k not in used]
    assert unused == [], f"unconverted keys: {unused[:8]}"

    # ---- sample: every voxel occupied in both scans -------------------
    rng = np.random.default_rng(11)
    W = 2
    P = cfg.runtime.max_points_per_scan
    pts = np.zeros((W, P, 4), np.float32)
    coords = None
    for w in range(W):
        pts[w], coords = full_grid_points(rng)
    sample = {
        "points": pts,
        "num_points": np.full((W,), P, np.int32),
        "scan_mask": np.ones((W,), bool),
        "labels": np.zeros((W, P), np.int32),
        "gt_boxes": np.zeros((cfg.model.head.max_objs, 8), np.float32),
        "num_boxes": np.int32(0),
    }
    out = jax.jit(
        lambda p, s, x: model.forward(p, s, x, train=False)
    )(params2, state, jax.tree.map(jnp.asarray, sample))
    out = jax.tree.map(np.asarray, out)

    X, Y, Z = GRID
    flat = coords[:, 2] * (X * Y) + coords[:, 1] * X + coords[:, 0]
    # grid (X, Y, Z) tensor flattened x-fastest == our point order:
    # index (x, y, z) -> x + X*y + X*Y*z
    def grid_at_points(t_xyz):
        """(X, Y, Z, C) grid -> (P, C) in point order (z slowest, x
        fastest — full_grid_points' meshgrid order)."""
        a = np.asarray(t_xyz)
        return a.transpose(2, 1, 0, 3).reshape(-1, a.shape[-1])

    # ---- oracle: MotionNet --------------------------------------------
    occ01 = np.full((W, 1, X, Y, Z), 0.5, np.float32)
    motion_o = motionnet_oracle(sd, occ01)  # (T, 3, X, Y, Z)
    mo = np.asarray(motion_o[W - 1].permute(1, 2, 3, 0))  # (X, Y, Z, 3)
    ours_motion = out["motion_logits"]  # (P, 3), point order
    oracle_motion = grid_at_points(mo)
    np.testing.assert_allclose(
        ours_motion, oracle_motion, atol=2e-3, rtol=1e-3,
        err_msg="MotionNet logits diverge from the torch oracle",
    )

    # ---- oracle: full pipeline ----------------------------------------
    cur = pts[W - 1]
    vox_feats = np.zeros((1, 7, X, Y, Z), np.float32)
    grid_idx = (coords[:, 0], coords[:, 1], coords[:, 2])
    for c in range(4):
        vox_feats[0, c][grid_idx] = cur[:, c]
    for c in range(3):
        vox_feats[0, 4 + c][grid_idx] = oracle_motion[:, c]

    pp = cfg.model.post
    nms_info = {}

    def boxes_fn(bev_chw):
        cls_map, box_map = bev_head_oracle(
            sd, np.asarray(bev_chw), cfg.model.bev.layer_nums[0]
        )
        cls_np = np.asarray(cls_map, np.float64)
        box_np = np.asarray(box_map, np.float64)
        nms_info["cls_map"] = cls_np
        nms_info["box_map"] = box_np
        boxes7 = decode_boxes_np(
            box_np, cfg.data.voxel_size, cfg.data.point_cloud_range,
            cfg.model.head.out_size_factor,
        )
        scores_all = 1 / (1 + np.exp(-cls_np.reshape(-1, 3)))
        scores = scores_all.max(-1)
        labels = scores_all.argmax(-1) + 1
        order = np.argsort(-scores, kind="stable")
        order = order[scores[order] >= pp.score_thresh][: pp.nms_pre_maxsize]
        from insmos_tpu.ops.iou3d import boxes_iou_bev

        iou = np.asarray(
            boxes_iou_bev(jnp.asarray(boxes7[order]), jnp.asarray(boxes7[order]))
        )
        keep = []
        supp = np.zeros(len(order), bool)
        for i in range(len(order)):
            if supp[i]:
                continue
            keep.append(order[i])
            supp |= iou[i] > pp.nms_thresh
            if len(keep) >= pp.nms_post_maxsize:
                break
        keep = np.asarray(keep, int)
        boxes8 = np.concatenate(
            [boxes7[keep], labels[keep, None].astype(np.float64)], -1
        )
        nms_info["boxes8"] = boxes8
        nms_info["scores"] = scores[keep]
        return boxes8, np.ones(len(keep), bool)

    mos_o, bev_o, boxes_o, _ = unet_oracle(
        sd, torch.tensor(vox_feats), GRID, boxes_fn, RANGE[:3]
    )

    # detection maps
    np.testing.assert_allclose(
        out["cls_map"], nms_info["cls_map"], atol=2e-3, rtol=1e-3,
        err_msg="cls heatmap diverges",
    )
    np.testing.assert_allclose(
        out["box_map"], nms_info["box_map"], atol=2e-3, rtol=1e-3,
        err_msg="box regression map diverges",
    )

    # decoded boxes: same count, same (sorted-by-score) geometry
    ours_keep = out["box_mask"].astype(bool)
    ob = out["boxes"][ours_keep]
    eb = nms_info["boxes8"]
    assert len(ob) == len(eb), (len(ob), len(eb))
    o_sort = ob[np.argsort(-out["scores"][ours_keep], kind="stable")]
    e_sort = eb[np.argsort(-nms_info["scores"], kind="stable")]
    np.testing.assert_allclose(
        o_sort[:, :7], e_sort[:, :7], atol=5e-3, rtol=1e-3,
        err_msg="decoded boxes diverge",
    )
    np.testing.assert_array_equal(o_sort[:, 7], e_sort[:, 7])

    # MOS point logits (the parity surface written to .label files)
    oracle_mos = grid_at_points(np.asarray(mos_o))
    np.testing.assert_allclose(
        out["point_logits"], oracle_mos, atol=3e-3, rtol=1e-3,
        err_msg="MOS point logits diverge",
    )
    agree = (
        out["point_logits"][:, 1:].argmax(-1)
        == oracle_mos[:, 1:].argmax(-1)
    ).mean()
    assert agree > 0.999, f"label agreement {agree}"
