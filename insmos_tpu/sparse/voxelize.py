"""Point -> voxel set construction and back.

Covers both external voxelizers of the reference with one sort-based core:
- spconv ``PointToVoxel`` + ``MeanVFE`` (models/backbones_3d/voxel_generate.py,
  backbones_2d/mean_vfe.py): mean of the FIRST max_points_per_voxel points of
  each voxel, voxel count capped at max_voxels keeping voxels in order of
  first point occurrence, per-point voxel id (-1 when dropped/out of range).
- MinkowskiEngine ``TensorField.sparse()`` / ``.slice()``
  (models/backbones_3d/motionnet.py:33-45): floor-quantized dedup with
  feature averaging over ALL points, and the inverse point gather.

Everything is one stable sort + segment reductions — static shapes, no host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import delinearize_key, linearize_coords
from .tensor import KEY_SENTINEL, SparseTensor


def _stable_sort_with_iota(keys):
    """Ascending stable sort; returns (sorted_keys, permutation)."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sk, perm = jax.lax.sort((keys, iota), num_keys=2)
    return sk, perm


def unique_voxels(
    coords,
    dims,
    capacity: int,
    point_valid=None,
    first_occurrence_cap: bool = True,
):
    """Deduplicate integer point coordinates into a sorted voxel set.

    Returns (SparseTensor-of-sites(feats empty), point_to_voxel (N,) int32,
    slot (N,) int32 position of each point within its voxel group,
    counts (V,) int32 points per voxel).

    When more than `capacity` distinct voxels exist, voxels are kept by
    order of first point occurrence (spconv PointToVoxel semantics) if
    first_occurrence_cap, else by grid (key) order. Dropped points get
    point_to_voxel = -1.
    """
    n = coords.shape[0]
    keys = linearize_coords(coords, dims, point_valid)
    sk, perm = _stable_sort_with_iota(keys)

    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    is_first &= sk != KEY_SENTINEL
    group = jnp.cumsum(is_first) - 1  # (N,) voxel rank per sorted point
    group = jnp.where(sk == KEY_SENTINEL, -1, group)
    n_groups = jnp.maximum(jnp.max(group) + 1, 0)

    # position of each point within its voxel (sorted stable by point index)
    sorted_pos = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.where(is_first, sorted_pos, 0)
    group_start = jax.ops.segment_max(
        group_start, jnp.maximum(group, 0), num_segments=n, indices_are_sorted=True
    )
    slot_sorted = sorted_pos - jnp.take(group_start, jnp.maximum(group, 0))

    # first original point index per voxel (stable sort => first in group);
    # sentinel rows masked so they cannot pollute group 0
    first_idx = jax.ops.segment_min(
        jnp.where(group >= 0, perm, jnp.iinfo(jnp.int32).max),
        jnp.maximum(group, 0),
        num_segments=n,
        indices_are_sorted=True,
    )
    counts_full = jax.ops.segment_sum(
        jnp.where(group >= 0, 1, 0),
        jnp.maximum(group, 0),
        num_segments=n,
        indices_are_sorted=True,
    )

    group_alive = jnp.arange(n) < n_groups
    if first_occurrence_cap:
        # rank voxels by first occurrence; keep the first `capacity`
        occ_key = jnp.where(group_alive, first_idx, jnp.iinfo(jnp.int32).max)
        _, occ_perm = _stable_sort_with_iota(occ_key)
        occ_rank = jnp.zeros((n,), jnp.int32).at[occ_perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        keep_group = group_alive & (occ_rank < capacity)
    else:
        keep_group = group_alive & (jnp.arange(n) < capacity)

    # compact kept groups, preserving key order
    out_rank = jnp.cumsum(keep_group.astype(jnp.int32)) - 1  # (N,) per group id
    out_rank = jnp.where(keep_group, out_rank, -1)

    group_key = jax.ops.segment_min(
        sk, jnp.maximum(group, 0), num_segments=n, indices_are_sorted=True
    )

    vox_keys = jnp.full((capacity,), KEY_SENTINEL, jnp.int32)
    safe_rank = jnp.where(out_rank >= 0, out_rank, capacity)
    vox_keys = vox_keys.at[safe_rank].set(
        jnp.where(keep_group, group_key, KEY_SENTINEL), mode="drop"
    )
    vox_counts = jnp.zeros((capacity,), jnp.int32).at[safe_rank].set(
        jnp.where(keep_group, counts_full, 0), mode="drop"
    )
    vox_valid = vox_keys != KEY_SENTINEL
    vox_coords = jnp.where(
        vox_valid[:, None],
        delinearize_key(jnp.where(vox_valid, vox_keys, 0), dims),
        0,
    )

    # per-point voxel id in original order: un-permute by SORTING on the
    # original index instead of an inverse-permutation scatter — a 2-payload
    # sort costs ~1.5 ms where the random-write scatter costs ~5-7 ms at
    # pair-map scale (~20 ns/row, PERF.md platform facts)
    pt_out = jnp.where(group >= 0, jnp.take(out_rank, jnp.maximum(group, 0)), -1)
    _, point_to_voxel, point_slot = jax.lax.sort(
        (perm, pt_out, slot_sorted), num_keys=1
    )

    sites = SparseTensor(
        coords=vox_coords,
        keys=vox_keys,
        feats=jnp.zeros((capacity, 0), jnp.float32),
        valid=vox_valid,
        dims=tuple(dims),
    )
    return sites, point_to_voxel, point_slot, vox_counts


def voxelize_points(
    points,  # (N, C) float; first 3 columns are x, y, z
    point_valid,  # (N,) bool
    pc_range,  # (6,) [xmin ymin zmin xmax ymax zmax]
    voxel_size,  # (3,)
    dims,  # (X, Y, Z)
    capacity: int,
    max_points_per_voxel: int,
):
    """PointToVoxel + MeanVFE fused: returns (SparseTensor with mean
    features, point_to_voxel (N,)).

    Feature = mean over the first `max_points_per_voxel` points of the voxel
    (later points are ignored by the mean but still receive the voxel id,
    matching spconv's generate_voxel_with_id + gather semantics).
    """
    inv = 1.0 / jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    vox_coord = jnp.floor((points[:, :3] - lo) * inv).astype(jnp.int32)
    sites, p2v, slot, counts = unique_voxels(
        vox_coord, dims, capacity, point_valid, first_occurrence_cap=True
    )
    in_mean = (p2v >= 0) & (slot < max_points_per_voxel)
    seg = jnp.where(in_mean, p2v, capacity)
    feat_sum = jax.ops.segment_sum(
        jnp.where(in_mean[:, None], points, 0.0), seg, num_segments=capacity + 1
    )[:capacity]
    denom = jnp.clip(
        jnp.minimum(counts, max_points_per_voxel), 1, None
    ).astype(points.dtype)
    feats = feat_sum / denom[:, None]
    return sites.replace_feats(feats), p2v


def devoxelize(voxel_feats, point_to_voxel):
    """Per-voxel features -> per-point features; id -1 -> zeros
    (= spconv gather_features_by_pc_voxel_id, spconv_unet.py:410)."""
    padded = jnp.concatenate(
        [voxel_feats, jnp.zeros((1, voxel_feats.shape[1]), voxel_feats.dtype)]
    )
    idx = jnp.where(point_to_voxel >= 0, point_to_voxel, voxel_feats.shape[0])
    return jnp.take(padded, idx, axis=0)
