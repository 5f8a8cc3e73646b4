"""Brick-based sparse convolution engine — the TPU-native fast path.

Motivation (PERF.md): on TPU, per-element random access costs ~10 ns while a
contiguous 128-wide row gather costs the same — so the engine must fetch
wide contiguous rows, never single elements, and avoid per-query binary
search entirely.

Representation: voxels are grouped into **bricks** = 16 consecutive x-cells
of one (y, z[, t]) row, direct-mapped (slot = x mod 16, no collisions). The
sorted voxel-key order makes brick construction pure vector arithmetic
(brick key = voxel key // 16, slot = key % 16), and x-adjacent bricks are
ADJACENT entries of the sorted brick array, so left/right halos are array
shifts — zero gathers.

A submanifold conv then becomes, per kernel "row group" (dy, dz[, dt]):
three contiguous row-gathers per brick — the neighbour row's bricks at
x-segments (own-1, own, own+1), found via a per-level neighbour table —
concatenated into a 3*BX x-window from which each dx offset is a STATIC
slice, followed by one matmul. The neighbour table itself is built once
per level with a dense brick-id grid (one scatter + three gather passes).

Compared with the sorted-key/binary-search path (convs.py) this trades
memory (dense brick grid, ~5x slot padding) for ~20-100x fewer random
accesses. Both paths produce identical results (tests/test_bricks.py,
including adversarial cross-segment cases in the sparse-row regime).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .coords import make_offsets
from .tensor import KEY_SENTINEL, SparseTensor

BX = 16  # brick extent along x; grid X extents must be multiples of BX


@jax.tree_util.register_dataclass
@dataclass
class Bricks:
    """Fixed-capacity brick set for one level.

    keys:  (B,) int32 sorted brick keys (= voxel_key // BX; sentinel pad).
    occ:   (B, BX) bool slot occupancy.
    feats: (B, BX, C).
    valid: (B,) bool.
    v_flat: (V,) int32 voxel -> flattened slot index (brick * BX + slot), -1
            if the voxel's brick overflowed capacity.
    dims: static grid extents (X, Y, Z[, T]).
    """

    keys: jax.Array
    occ: jax.Array
    feats: jax.Array
    valid: jax.Array
    v_flat: jax.Array
    dims: tuple[int, ...] = field(metadata={"static": True})

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_features(self) -> int:
        return self.feats.shape[-1]

    def replace_feats(self, feats) -> "Bricks":
        return Bricks(self.keys, self.occ, feats, self.valid, self.v_flat, self.dims)


def _num_xsegs(dims) -> int:
    assert dims[0] % BX == 0, f"X extent {dims[0]} not a multiple of {BX}"
    return dims[0] // BX


def build_bricks(x: SparseTensor, brick_capacity: int) -> Bricks:
    """Group a sorted SparseTensor's voxels into bricks (pure vector ops +
    one scatter). Bricks beyond capacity are dropped grid-order-last."""
    keys = x.keys
    V = keys.shape[0]
    bkey = jnp.where(x.valid, keys // BX, KEY_SENTINEL)
    slot = (keys % BX).astype(jnp.int32)

    is_first = jnp.concatenate([jnp.ones((1,), bool), bkey[1:] != bkey[:-1]])
    is_first &= x.valid
    bpos = jnp.cumsum(is_first) - 1
    bpos = jnp.where(x.valid & (bpos < brick_capacity), bpos, -1)

    bkeys = jnp.full((brick_capacity,), KEY_SENTINEL, jnp.int32)
    bkeys = bkeys.at[jnp.where(is_first & (bpos >= 0), bpos, brick_capacity)].set(
        jnp.where(is_first, bkey, KEY_SENTINEL).astype(jnp.int32), mode="drop"
    )

    flat = jnp.where(bpos >= 0, bpos * BX + slot, brick_capacity * BX)
    occ = jnp.zeros((brick_capacity * BX,), bool).at[flat].set(
        x.valid, mode="drop"
    )
    C = x.num_features
    feats = jnp.zeros((brick_capacity * BX, C), x.feats.dtype)
    feats = feats.at[flat].set(jnp.where(x.valid[:, None], x.feats, 0.0), mode="drop")

    return Bricks(
        keys=bkeys,
        occ=occ.reshape(brick_capacity, BX),
        feats=feats.reshape(brick_capacity, BX, C),
        valid=bkeys != KEY_SENTINEL,
        v_flat=jnp.where(bpos >= 0, flat, -1).astype(jnp.int32),
        dims=x.dims,
    )


def bricks_to_voxel_feats(b: Bricks, out_dtype=None) -> jax.Array:
    """Scatter brick features back to canonical voxel order: (V, C)."""
    C = b.num_features
    flat = b.feats.reshape(-1, C)
    padded = jnp.concatenate([flat, jnp.zeros((1, C), flat.dtype)])
    idx = jnp.where(b.v_flat >= 0, b.v_flat, flat.shape[0])
    out = jnp.take(padded, idx, axis=0)
    return out.astype(out_dtype) if out_dtype else out


def _row_group_offsets(kernel: Sequence[int]) -> np.ndarray:
    """Centered offsets of the non-x kernel dims: (G, D-1), y fastest."""
    return make_offsets(kernel[1:], centered=True)


def brick_neighbor_table(b: Bricks, kernel: Sequence[int]):
    """Neighbour bricks per non-x kernel offset group (centered).

    Returns npos3 (B, G, 3) int32: for each brick and each non-x kernel
    offset group, the array rows of the neighbouring row's bricks at
    x-segments (own-1, own, own+1), or -1 where that brick does not exist
    (empty segment or out of grid). A query voxel's x-window (|dx| < BX)
    is always fully covered by these three bricks, independent of which
    segments happen to be occupied — this replaces an earlier single-brick
    fallback that lost cross-segment contributions when the center segment
    was empty but both side segments were populated.

    Built via a dense brick-id grid: one scatter of B entries + three gather
    passes of B*G entries — no binary search. The grid is transient.
    """
    dims = b.dims
    nxs = _num_xsegs(dims)
    n_bricks_dense = nxs * math.prod(dims[1:])
    grid = jnp.full((n_bricks_dense + 1,), -1, jnp.int32)
    safe_keys = jnp.where(b.valid, b.keys, n_bricks_dense)
    grid = grid.at[safe_keys].set(
        jnp.arange(b.capacity, dtype=jnp.int32), mode="drop"
    )
    grid = grid.at[n_bricks_dense].set(-1)

    groups = _row_group_offsets(kernel)  # (G, D-1)
    # brick key layout: xseg + nxs * (y + Y * (z [+ Z * t]))
    mults = [nxs]
    for d in range(1, len(dims) - 1):
        mults.append(mults[-1] * dims[d])
    shifts = groups @ np.array(mults, np.int64)  # (G,)

    key = jnp.where(b.valid, b.keys, 0)
    xseg = key % nxs
    coords = []
    k = key // nxs
    for d in range(1, len(dims)):
        coords.append(k % dims[d])
        k = k // dims[d]
    nb_keys = key[:, None] + jnp.asarray(shifts, jnp.int32)[None, :]
    ok = b.valid[:, None]
    for d in range(1, len(dims)):
        c = coords[d - 1][:, None] + jnp.asarray(groups[:, d - 1])[None, :]
        ok &= (c >= 0) & (c < dims[d])

    def probe(delta):
        seg_ok = ok & ((xseg[:, None] + delta >= 0) & (xseg[:, None] + delta < nxs))
        q = jnp.where(seg_ok, nb_keys + delta, n_bricks_dense)
        return jnp.take(grid, q.reshape(-1)).reshape(b.capacity, len(shifts))

    return jnp.stack([probe(-1), probe(0), probe(1)], axis=-1)  # (B, G, 3)


def subm_conv_bricks(
    b: Bricks,
    weight,  # (K, Cin, Cout), offsets enumerated x-fastest (make_offsets)
    kernel: Sequence[int],
    nb_table,  # npos3 (B, G, 3) from brick_neighbor_table(b, kernel)
    chunk: int | None = None,
) -> Bricks:
    """Submanifold conv on bricks. Per (brick, group): gather the neighbour
    row's (left, center, right) bricks, concatenate to a 3*BX x-window, and
    take static slices per dx offset; weights applied as matmuls. Requires
    the kernel x-extent < 2*BX+1 (slices stay inside the 3-brick window)."""
    K, cin, cout = weight.shape
    kx = kernel[0]
    assert kx <= 2 * BX - 1, f"kernel x-extent {kx} exceeds 3-brick window"
    x_off = np.arange(-((kx - 1) // 2), kx - (kx - 1) // 2, dtype=np.int64)
    groups = _row_group_offsets(kernel)
    G = groups.shape[0]
    assert K == kx * G
    npos_all = nb_table

    B = b.capacity
    f = jnp.where(b.occ[..., None], b.feats, 0.0).astype(weight.dtype)
    f_flat = jnp.concatenate(
        [f.reshape(B, BX * cin), jnp.zeros((1, BX * cin), f.dtype)]
    )

    # weight slices per (group, dx): canonical index = dx_i + kx * g
    w = weight.reshape(G, kx, cin, cout)

    def run(npos_rows, occ_rows):
        rows = npos_rows.shape[0]

        def g_body(acc, scanned):
            npos3, w_g = scanned  # (rows, 3), (kx, cin, cout)
            nb = jnp.take(
                f_flat, jnp.where(npos3 >= 0, npos3, B).reshape(-1), axis=0
            ).reshape(rows, 3 * BX, cin)
            for i, dx in enumerate(x_off):
                sl = nb[:, BX + int(dx) : 2 * BX + int(dx), :]
                acc = acc + jnp.einsum(
                    "bsc,cd->bsd", sl, w_g[i],
                    preferred_element_type=jnp.float32, precision="highest",
                )
            return acc, None

        out, _ = jax.lax.scan(
            g_body,
            jnp.zeros((rows, BX, cout), jnp.float32),
            (jnp.swapaxes(npos_rows, 0, 1), w),
        )
        return out * occ_rows[..., None]

    if chunk is None or B <= chunk:
        out = run(npos_all, b.occ)
    else:
        assert B % chunk == 0
        out = jax.lax.map(
            lambda a: run(*a),
            (
                npos_all.reshape(B // chunk, chunk, G, 3),
                b.occ.reshape(B // chunk, chunk, BX),
            ),
        ).reshape(B, BX, cout)
    return b.replace_feats(out)


def voxel_feats_to_bricks(b: Bricks, voxel_feats) -> Bricks:
    """Scatter canonical-order voxel features (V, C) into b's brick slots."""
    C = voxel_feats.shape[-1]
    flat = jnp.zeros((b.capacity * BX, C), voxel_feats.dtype)
    idx = jnp.where(b.v_flat >= 0, b.v_flat, b.capacity * BX)
    flat = flat.at[idx].set(voxel_feats, mode="drop")
    return b.replace_feats(flat.reshape(b.capacity, BX, C))


def brick_slot_coords(b: Bricks):
    """(B, BX, D) int32 grid coordinates of every slot (garbage where
    not occupied — mask with b.occ)."""
    nxs = _num_xsegs(b.dims)
    key = jnp.where(b.valid, b.keys, 0)
    xseg = key % nxs
    x = xseg[:, None] * BX + jnp.arange(BX, dtype=jnp.int32)[None, :]
    cols = [x]
    k = key // nxs
    for d in range(1, len(b.dims)):
        cols.append(jnp.broadcast_to((k % b.dims[d])[:, None], x.shape))
        k = k // b.dims[d]
    return jnp.stack(cols, axis=-1)
