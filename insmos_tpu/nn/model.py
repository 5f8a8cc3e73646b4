"""The full InsMOS model: MotionNet -> voxelize -> UNetV2 + detection +
instance fusion -> per-point MOS logits.

Composition mirrors InsMOS_Model (reference models/models.py:269-377) but as
one pure jittable function over fixed-shape padded arrays; the reference's
per-sample python loop becomes vmap/shard_map at the training-step level.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import Config
from ..sparse import devoxelize, voxelize_points
from .bev_backbone import bev_backbone_forward, init_bev_backbone
from .center_head import center_head_forward, decode_and_nms, init_center_head
from .minkunet4d import init_motionnet, motionnet_forward
from .unet3d import init_unet3d, unet3d_forward


@dataclass
class InsMOSModel:
    """Bundles init/apply for the whole pipeline."""

    cfg: Config

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        mp, ms = init_motionnet(k1, self.cfg)
        up, us = init_unet3d(k2, self.cfg)
        bp, bs = init_bev_backbone(k3, self.cfg)
        hp = init_center_head(k4, self.cfg)
        params = {"motion": mp, "unet": up, "bev": bp, "head": hp}
        state = {"motion": ms, "unet": us, "bev": bs}
        return params, state

    def forward(self, params, state, sample: dict, *, train: bool,
                stem_cache: dict | None = None, cache_shift=None,
                win_cache: dict | None = None,
                emit_cache: bool = False) -> dict:
        """sample: dict of one WindowSample's arrays (no batch dim).

        Returns a dict with per-point MOS logits for the current scan,
        motion logits, detection outputs, and the new BN state.
        `stem_cache` enables the fixed-frame incremental stem (streaming
        inference; see minkunet4d.motionnet_forward) — the refreshed cache
        is returned under "stem_cache". `cache_shift` is the step's
        integer-voxel window translation (cache queries are re-centered by
        it); `emit_cache` makes the full (non-incremental) stem also emit
        a cache, for streaming recovery after an incompatible pose step.

        Composed as forward_motion + forward_tail so the streaming
        pipeline can jit the two halves as SEPARATE compile units: the
        one-unit step program (~29 MB MLIR) OOM-kills the remote TPU
        compile helper once vmapped over serving slots (round-5), and the
        split also halves iteration latency on every recompile.
        """
        inter = self.forward_motion(
            params, state, sample, train=train, stem_cache=stem_cache,
            cache_shift=cache_shift, win_cache=win_cache,
            emit_cache=emit_cache,
        )
        return self.forward_tail(params, state, inter, train=train)

    def forward_motion(self, params, state, sample: dict, *, train: bool,
                       stem_cache: dict | None = None, cache_shift=None,
                       win_cache: dict | None = None,
                       emit_cache: bool = False) -> dict:
        """First compile unit: MotionNet + voxelize + compaction.

        Returns the intermediate dict consumed by forward_tail (all
        concrete arrays/pytrees — safe to pass across a jit boundary)."""
        from .layers import cast_compute

        cfg = self.cfg
        # mixed precision: f32 master params, conv/matmul weights cast to the
        # compute dtype (accumulation stays f32 inside every matmul)
        params = cast_compute(params, cfg.runtime.compute_dtype)
        points = sample["points"]  # (W, P, 4)
        W, P = points.shape[:2]
        point_valid = (
            jnp.arange(P)[None, :] < sample["num_points"][:, None]
        ) & sample["scan_mask"][:, None]

        motion_cur, ns_motion, motion_stats = motionnet_forward(
            params["motion"], state["motion"], cfg, points, point_valid,
            train=train, stem_cache=stem_cache, cache_shift=cache_shift,
            win_cache=win_cache, emit_cache=emit_cache,
        )

        current = points[W - 1]  # (P, 4)
        cur_valid = point_valid[W - 1]
        current7 = jnp.concatenate([current, motion_cur], axis=-1)

        vox, p2v = voxelize_points(
            current7,
            cur_valid,
            cfg.data.point_cloud_range,
            cfg.data.voxel_size,
            cfg.data.grid_size,
            cfg.model.unet_capacities[0],
            cfg.model.max_points_per_voxel,
        )
        inter = {
            "vox": vox,
            "p2v": p2v,
            "motion_cur": motion_cur,
            "current": current,
            "cur_valid": cur_valid,
            "ns_motion": ns_motion,
            "motion_dropped": jnp.stack(motion_stats["dropped"]),
        }
        if "span_overflow" in motion_stats and motion_stats["span_overflow"]:
            inter["motion_span_overflow"] = list(
                motion_stats["span_overflow"]
            )
        if "stem_cache" in motion_stats:
            inter["stem_cache"] = motion_stats["stem_cache"]
        if "win" in motion_stats:
            inter["win"] = motion_stats["win"]
        return inter

    def forward_tail(self, params, state, inter: dict, *, train: bool) -> dict:
        """Second compile unit: UNet + detection + fusion + devoxelize."""
        from .layers import cast_compute

        cfg = self.cfg
        params = cast_compute(params, cfg.runtime.compute_dtype)
        vox, p2v = inter["vox"], inter["p2v"]
        motion_cur = inter["motion_cur"]
        current = inter["current"]
        cur_valid = inter["cur_valid"]
        ns_motion = inter["ns_motion"]
        # post-voxelizer compaction (config.py unet_site_capacity): sites
        # are sorted-key with valid rows as a prefix, so the UNet working
        # set is a free slice; sliced-off voxels are counted + hard-gated
        cap_s = cfg.model.unet_site_capacity
        unet_dropped = jnp.int32(0)
        if cap_s < vox.capacity:
            from ..sparse.tensor import SparseTensor

            unet_dropped = jnp.sum(vox.valid[cap_s:]).astype(jnp.int32)
            vox = SparseTensor(
                vox.coords[:cap_s], vox.keys[:cap_s], vox.feats[:cap_s],
                vox.valid[:cap_s], vox.dims,
            )
            p2v = jnp.where(p2v >= cap_s, -1, p2v)

        det: dict[str, Any] = {}

        def boxes_fn(bev):
            feat, ns_bev = bev_backbone_forward(
                params["bev"], state["bev"], cfg, bev, train=train
            )
            cls_map, box_map = center_head_forward(params["head"], feat)
            boxes8, scores, labels, mask = decode_and_nms(cfg, cls_map, box_map)
            det.update(
                ns_bev=ns_bev,
                cls_map=cls_map,
                box_map=box_map,
                boxes=boxes8,
                scores=scores,
                labels=labels,
                box_mask=mask,
            )
            # fusion sees detached boxes (reference clones+detaches,
            # spconv_unet.py:322); gradients reach the head via the maps.
            return jax.lax.stop_gradient(boxes8), jax.lax.stop_gradient(mask)

        mos_vox_logits, _bev, ns_unet, unet_stats = unet3d_forward(
            params["unet"], state["unet"], cfg, vox, boxes_fn, train=train
        )
        point_logits = devoxelize(mos_vox_logits, p2v)  # (P, 3)

        # overflow observability: dropped site counts per level (0 in
        # normal operation; the reference's only cap is the 100k voxelizer)
        # attribute p2v == -1 drops: out-of-grid points (the reference's
        # PointToVoxel drops these too — x/y are pre-masked by the data
        # processor but z is not; parity) vs voxel-capacity drops beyond
        # the 100k cap (also reference behavior, but order-dependent —
        # kept as a separate counter so the bench can gate it at 0)
        inv = 1.0 / jnp.asarray(cfg.data.voxel_size, current.dtype)
        lo = jnp.asarray(cfg.data.point_cloud_range[:3], current.dtype)
        vc = jnp.floor((current[:, :3] - lo) * inv).astype(jnp.int32)
        dims_arr = jnp.asarray(cfg.data.grid_size, jnp.int32)
        in_grid = jnp.all((vc >= 0) & (vc < dims_arr[None, :]), axis=-1)
        vox_dropped = (p2v < 0) & cur_valid
        overflow = {
            "motion_dropped": inter["motion_dropped"],
            "voxelizer_dropped": jnp.sum(vox_dropped),
            "voxelizer_out_of_range": jnp.sum(vox_dropped & ~in_grid),
            "voxelizer_capacity_dropped": jnp.sum(vox_dropped & in_grid),
            # compaction overflow (pure deviation -> hard-gated at 0;
            # reference has no such cap): voxels beyond unet_site_capacity
            "unet_dropped": unet_dropped,
        }
        # span-engine overflow: rows whose input span exceeded the kernel's
        # fetch window (contributions dropped — must be ~0 at ref scale)
        span_ovf = list(inter.get("motion_span_overflow", [])) + unet_stats.get(
            "span_overflow", []
        )
        if span_ovf:
            overflow["span_overflow"] = jnp.stack(span_ovf)

        out_extra = (
            {"stem_cache": inter["stem_cache"]}
            if "stem_cache" in inter else {}
        )
        return {
            **out_extra,
            "overflow": overflow,
            "point_logits": point_logits,
            "motion_logits": motion_cur,
            "point_valid": cur_valid,
            "pc_voxel_id": p2v,
            "cls_map": det["cls_map"],
            "box_map": det["box_map"],
            "boxes": det["boxes"],
            "scores": det["scores"],
            "labels": det["labels"],
            "box_mask": det["box_mask"],
            "new_state": {
                "motion": ns_motion,
                "unet": ns_unet,
                "bev": det["ns_bev"],
            },
        }
