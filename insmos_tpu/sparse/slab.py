"""Slab engine: T-dense sparse tensors + windowed-gather convolutions.

The second-generation TPU-native sparse-conv engine, replacing both the
per-voxel binary-search path (convs.py) and the brick path (bricks.py
removed) on every deployed network. Two measured facts drive the design
(tools/probe_rowdense.py, tools/probe_fixes.py on TPU v5e):

1. Random row gathers cost ~5-7 ns/row REGARDLESS of row width up to
   ~512 B — so the engine must minimize the NUMBER of fetches and make
   every fetch wide.
2. XLA pads trailing array dims to 128 lanes; any hot array with a tiny
   trailing dim (3, 8, ...) explodes 16-50x in memory/bandwidth — so hot
   data is laid out with a wide trailing axis (T*C features) or with the
   long axis trailing (tables as (G, kx, V)).

Representation (``Slab``): sites are the SORTED set of *3D* voxel keys;
the temporal axis of the reference's 4D MinkowskiEngine tensors
(motionnet.py:25-36) is stored DENSE per site: ``feats (V, T*C)``,
``occ (V, T)``. Pose-aligned scan windows overlap heavily on static
structure, so the 3D union is ~2-4x smaller than the 4D voxel count, and
every spatial neighbour fetch serves all T time slices at once. t-kernel
offsets become static shifts of the dense T axis. For 3D tensors T=1 and
the slab degenerates to a plain sorted sparse tensor.

Convolution = windowed gather + one-hot align + matmul:
- Neighbour keys along x are CONSECUTIVE integers, and the sorted site
  array stores whichever of them exist in CONSECUTIVE slots. So for each
  non-x kernel offset group (dy, dz) a single widened ``lax.gather``
  (slice_sizes=(kx, T*C)) fetches all kx x-neighbours in ONE fetch:
  V*G fetches per conv instead of V*K (kx fewer), each kx*T*C wide.
- Which window slot holds which dx is a tiny per-site ``slotmap`` (int8),
  precomputed once per (site set, kernel) via a transient dense grid of
  site indices (one scatter + G widened probe gathers) and consumed as a
  (kx, kx) one-hot einsum — this replaces spconv's indice_key rulebooks
  and MinkowskiEngine's kernel maps (SURVEY.md S2.2).
- Strided convs reuse the same machinery: output sites are derived by
  arithmetic (dedup of child/parent coords) and the window base is
  ``o*s - p`` in the input grid. Inverse convs with kernel==stride==2
  (the MotionNet up-convs) have exactly one parent per fine site.

Capacity overflow (sites beyond a level's static capacity) is COUNTED and
surfaced (``SlabStats``) instead of silently truncating — the reference's
only cap is the 100k voxelizer (models/models.py:287); ours are tested to
sit above measured occupancy and monitored.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .tensor import KEY_SENTINEL

INT32_MAX = jnp.iinfo(jnp.int32).max


@jax.tree_util.register_dataclass
@dataclass
class Slab:
    """Fixed-capacity T-dense sparse tensor on a 3D integer grid.

    keys:   (V,) int32 sorted linearized 3D coords (x fastest); padding
            rows hold KEY_SENTINEL and sort last.
    coords: (V, 3) int32 (x, y, z); garbage on padding rows.
    occ:    (V, T) bool — which (site, t) 4D voxels actually exist.
    feats:  (V, T*C) — ZERO at non-occupied slots (maintained invariant).
    valid:  (V,) bool.
    dims:   static (X, Y, Z).
    T:      static temporal extent (1 for 3D tensors).
    """

    keys: jax.Array
    coords: jax.Array
    occ: jax.Array
    feats: jax.Array
    valid: jax.Array
    dims: tuple[int, ...] = field(metadata={"static": True})
    T: int = field(metadata={"static": True})

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_features(self) -> int:
        return self.feats.shape[-1] // self.T

    def replace_feats(self, feats) -> "Slab":
        return Slab(self.keys, self.coords, self.occ, feats, self.valid, self.dims, self.T)

    def occ_flat(self) -> jax.Array:
        return self.occ.reshape(-1)  # (V*T,)

    def mask_feats(self, feats=None) -> jax.Array:
        """Zero features at non-occupied slots: (V, T*C).

        Flat 2D: the occupancy mask is lane-repeated to (V, T*C) rather
        than reshaping features to (V, T, C) — small-trailing-dim arrays
        are padded to 128 lanes by the TPU tiler (PERF.md), so a (V, T, C)
        materialization at C=8 costs 16x its logical size.
        """
        f = self.feats if feats is None else feats
        C = f.shape[-1] // self.T
        m = jnp.repeat(self.occ, C, axis=1)  # (V, T*C), t-major like feats
        return jnp.where(m, f, 0.0)


def linearize3(coords, dims):
    """(..., 3) int coords -> (...,) int32 key, x fastest; OOB -> sentinel."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = (
        (x >= 0) & (x < dims[0]) & (y >= 0) & (y < dims[1]) & (z >= 0) & (z < dims[2])
    )
    key = (z * dims[1] + y) * dims[0] + x
    return jnp.where(ok, key, KEY_SENTINEL).astype(jnp.int32)


def delinearize3(keys, dims):
    x = keys % dims[0]
    y = (keys // dims[0]) % dims[1]
    z = keys // (dims[0] * dims[1])
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


# --------------------------------------------------------------- building
def _compact_by_sort(order_key, payload, capacity, fill):
    """Keep rows where order_key is small: sort by key, take [:capacity].

    Replaces scatter-based compaction (XLA scatter measured ~85 ns/row on
    the target runtime vs ~8 ns/row for sort+slice at these sizes).
    """
    _, out = jax.lax.sort((order_key, payload), num_keys=1)
    out = out[:capacity]
    if out.shape[0] < capacity:
        out = jnp.concatenate(
            [out, jnp.full((capacity - out.shape[0],), fill, out.dtype)]
        )
    return out


def build_slab(
    coords3,  # (N, 3) int32
    tcol,  # (N,) int32 in [0, T)
    point_valid,  # (N,) bool
    dims: Sequence[int],
    T: int,
    capacity: int,
):
    """Points -> Slab site set. Returns (slab-with-empty-feats,
    point_to_slot (N,) int32 flat (site*T + t) index or -1, n_sites,
    n_dropped_points).

    One 2-key sort + cumsums + one small compaction sort + one occ scatter.
    """
    n = coords3.shape[0]
    key3 = linearize3(coords3, dims)
    key3 = jnp.where(point_valid, key3, KEY_SENTINEL)
    iota = jnp.arange(n, dtype=jnp.int32)
    sk, st, sperm = jax.lax.sort(
        (key3, tcol.astype(jnp.int32), iota), num_keys=2
    )

    alive = sk != KEY_SENTINEL
    first3 = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & alive
    rank3 = jnp.cumsum(first3.astype(jnp.int32)) - 1  # site index per sorted pt
    n_sites = jnp.max(jnp.where(first3, rank3 + 1, 0))  # TRUE count (pre-cap)
    in_cap = alive & (rank3 < capacity)
    n_dropped = jnp.sum(alive & ~in_cap)
    rank3 = jnp.where(in_cap, rank3, -1)

    # compact site keys (order already ascending among firsts)
    site_keys = _compact_by_sort(
        jnp.where(first3 & in_cap, rank3, INT32_MAX),
        sk,
        capacity,
        KEY_SENTINEL,
    )
    site_keys = jnp.where(jnp.arange(capacity) < n_sites, site_keys, KEY_SENTINEL)
    valid = site_keys != KEY_SENTINEL
    coords = jnp.where(
        valid[:, None], delinearize3(jnp.where(valid, site_keys, 0), dims), 0
    )

    # occupancy: scatter first-(site, t) pairs into the flat (V*T) grid
    first4 = (
        jnp.concatenate([jnp.ones((1,), bool), (sk[1:] != sk[:-1]) | (st[1:] != st[:-1])])
        & in_cap
    )
    flat4 = jnp.where(first4, rank3 * T + st, capacity * T)
    occ = jnp.zeros((capacity * T + 1,), bool).at[flat4].set(True, mode="drop")
    occ = occ[:-1].reshape(capacity, T)

    # per-point flat slot: invert the sort permutation by sorting back
    p2slot_sorted = jnp.where(in_cap, rank3 * T + st, -1)
    _, p2slot = jax.lax.sort((sperm, p2slot_sorted), num_keys=1)

    slab = Slab(
        keys=site_keys,
        coords=coords,
        occ=occ,
        feats=jnp.zeros((capacity, T * 0), jnp.float32),
        valid=valid,
        dims=tuple(dims),
        T=T,
    )
    return slab, p2slot, n_sites, n_dropped


def maintain_window_slab(
    prev_keys,  # (cap0,) int32 sorted prev-frame site keys (sentinel pad)
    prev_occ,  # (cap0, W) bool prev window occupancy
    prev_stem,  # (cap0, W*C) prev stem-cache feats
    nslab_keys,  # (scan_cap,) int32 sorted NEW scan's site keys (new frame)
    nslab_valid,  # (scan_cap,) bool
    shift,  # (3,) int32: prev-frame coords = new-frame coords + shift
    dims,
    W: int,
    C: int,
    capacity: int,
):
    """Incrementally maintain the streaming window's L1 site slab.

    Consecutive fixed-frame windows share 9/10 scans related by a pure
    integer-voxel translation, so instead of re-sorting all W*P window
    points per step (build_slab: a 1.3M-row 3-key sort + occupancy
    scatter) and key-matching the stem cache by a 2*cap0-row bisection
    merge (_incremental_stem), this shifts the PREVIOUS step's site keys
    by the translation, rolls its occupancy one slot (dropping the oldest
    scan and any site left unoccupied), and merges the new scan's sorted
    site set — one (cap0 + scan_cap)-row sort. The maintained set equals
    the full rebuild's window union exactly (translation of integer keys
    is exact; the full path re-quantizes f32-translated points, which can
    flip boundary-exact points — the maintained set is the more exact of
    the two).

    Returns (site_keys, coords, occ, stem_shifted, new_pos, n_sites,
    n_dropped): stem_shifted holds cache slots 0..W-2 re-rowed to the new
    site order (slot W-1 zero — the caller writes the fresh scan's stem
    output at rows new_pos[i] for nslab row i).
    """
    cap0 = prev_keys.shape[0]
    scan_cap = nslab_keys.shape[0]

    # shift previous sites into the new frame (exact integer translation)
    pc = delinearize3(jnp.where(prev_keys != KEY_SENTINEL, prev_keys, 0), dims)
    nc = pc - shift[None, :]
    shifted = linearize3(nc, dims)  # OOB -> sentinel
    occ_roll = jnp.concatenate(
        [prev_occ[:, 1:], jnp.zeros((cap0, 1), bool)], axis=1
    )
    keep_old = (
        (prev_keys != KEY_SENTINEL)
        & (shifted != KEY_SENTINEL)
        & jnp.any(occ_roll, axis=1)
    )
    k_old = jnp.where(keep_old, shifted, KEY_SENTINEL)
    k_new = jnp.where(nslab_valid, nslab_keys, KEY_SENTINEL)

    vals = jnp.concatenate([k_old, k_new])
    # old rows sort before new on key ties (stable sort + order of concat)
    payload = jnp.arange(cap0 + scan_cap, dtype=jnp.int32)
    sv, spl = jax.lax.sort((vals, payload), num_keys=1)
    alive = sv != KEY_SENTINEL
    first = jnp.concatenate([jnp.ones((1,), bool), sv[1:] != sv[:-1]]) & alive
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_sites = jnp.max(jnp.where(first, rank + 1, 0))
    in_cap = alive & (rank < capacity)
    n_dropped = jnp.maximum(n_sites - capacity, 0)

    site_keys = _compact_by_sort(
        jnp.where(first & in_cap, rank, INT32_MAX), sv, capacity, KEY_SENTINEL
    )
    site_keys = jnp.where(
        jnp.arange(capacity) < jnp.minimum(n_sites, capacity),
        site_keys, KEY_SENTINEL,
    )
    valid = site_keys != KEY_SENTINEL
    coords = jnp.where(
        valid[:, None], delinearize3(jnp.where(valid, site_keys, 0), dims), 0
    )

    # per-source destination rows (unsort the ranks)
    dest_sorted = jnp.where(in_cap, rank, -1)
    _, dest = jax.lax.sort((spl, dest_sorted), num_keys=1)
    old_pos = dest[:cap0]  # (cap0,) merged row or -1
    new_pos = dest[cap0:]  # (scan_cap,)

    # occupancy + shifted stem cache, re-rowed by scatter (unique rows)
    safe_old = jnp.where(keep_old & (old_pos >= 0), old_pos, capacity)
    occ = (
        jnp.zeros((capacity + 1, W), bool)
        .at[safe_old].set(occ_roll, mode="drop")[:capacity]
    )
    occ = occ.at[:, W - 1].set(valid & False)  # slot W-1 filled below
    new_occ_rows = jnp.where(nslab_valid & (new_pos >= 0), new_pos, capacity)
    occ = (
        jnp.concatenate([occ, jnp.zeros((1, W), bool)])
        .at[new_occ_rows, W - 1].set(True, mode="drop")[:capacity]
    )
    stem_rolled = jnp.concatenate(
        [
            prev_stem[:, C:],
            jnp.zeros((cap0, C), prev_stem.dtype),
        ],
        axis=1,
    )
    stem_shifted = (
        jnp.zeros((capacity + 1, W * C), prev_stem.dtype)
        .at[safe_old].set(stem_rolled, mode="drop")[:capacity]
    )
    return site_keys, coords, occ, stem_shifted, new_pos, n_sites, n_dropped


def slab_from_sparse(x) -> Slab:
    """SparseTensor (3D) -> Slab with T=1 (shared site machinery)."""
    return Slab(
        keys=x.keys,
        coords=x.coords,
        occ=x.valid[:, None],
        feats=x.feats,
        valid=x.valid,
        dims=tuple(x.dims),
        T=1,
    )


def sparse_from_slab(x: Slab):
    """T=1 Slab -> SparseTensor (for dense-BEV projection etc.)."""
    from .tensor import SparseTensor

    assert x.T == 1
    return SparseTensor(x.coords, x.keys, x.feats, x.valid, tuple(x.dims))


def derive_strided_sites(
    x: Slab, kernel3, stride3, pad3, out_dims, capacity: int
):
    """Output site set of a strided conv on the 3D site grid: every output
    site receiving >= 1 kernel contribution, deduplicated, sorted.

    Candidates per input site i (per dim): o in [ceil((i+p-k+1)/s),
    floor((i+p)/s)] — at most ceil(k/s) per dim. Returns (Slab with empty
    feats and occ from OR over children, n_sites, n_dropped_sites).
    """
    per_dim = [int(np.ceil(k / s)) for k, s in zip(kernel3, stride3)]
    ranges = [np.arange(c, dtype=np.int32) for c in per_dim]
    mesh = np.meshgrid(*ranges[::-1], indexing="ij")
    cand = np.stack([m.reshape(-1) for m in mesh[::-1]], axis=-1)  # (Kc, 3)
    Kc = cand.shape[0]

    s = jnp.asarray(stride3, jnp.int32)
    p = jnp.asarray(pad3, jnp.int32)
    k = jnp.asarray(kernel3, jnp.int32)
    i = x.coords
    o_hi = jnp.floor_divide(i + p[None], s[None])
    cands = o_hi[:, None, :] - jnp.asarray(cand)[None]  # (V, Kc, 3)
    lo_ok = cands * s[None, None] - p[None, None] <= i[:, None, :]
    hi_ok = cands * s[None, None] - p[None, None] + (k[None, None] - 1) >= i[:, None, :]
    ok = (lo_ok & hi_ok & (cands >= 0)).all(-1) & x.valid[:, None]

    keys = linearize3(cands.reshape(-1, 3), out_dims)
    keys = jnp.where(ok.reshape(-1), keys, KEY_SENTINEL)
    skeys = jax.lax.sort(keys)
    alive = skeys != KEY_SENTINEL
    first = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]) & alive
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_sites = jnp.max(jnp.where(first, rank + 1, 0))
    n_dropped = jnp.maximum(n_sites - capacity, 0)

    site_keys = _compact_by_sort(
        jnp.where(first & (rank < capacity), rank, INT32_MAX),
        skeys,
        capacity,
        KEY_SENTINEL,
    )
    site_keys = jnp.where(
        jnp.arange(capacity) < jnp.minimum(n_sites, capacity), site_keys, KEY_SENTINEL
    )
    valid = site_keys != KEY_SENTINEL
    coords = jnp.where(
        valid[:, None], delinearize3(jnp.where(valid, site_keys, 0), out_dims), 0
    )
    out = Slab(
        keys=site_keys,
        coords=coords,
        occ=jnp.zeros((capacity, x.T), bool),  # filled by the strided conv
        feats=jnp.zeros((capacity, 0), jnp.float32),
        valid=valid,
        dims=tuple(out_dims),
        T=x.T,
    )
    return out, n_sites, n_dropped


def dilate_mask(src_keys, src_sel, dims, reach: int, q_keys, q_valid):
    """Chebyshev-ball dilation membership: for each query site, is it
    within L-inf distance `reach` of a selected source site?

    Dense-grid route (the sparse alternative — per-offset interval
    bisections — costs G x |queries| merged-sort rows, far more than the
    grid's ~3 separable max-pool passes): scatter source keys into a dense
    bool grid, dilate with three 1-D reduce_windows (the Chebyshev ball is
    an axis product, so the pool is separable), then take at query keys.
    Used by the decoder spatial pruning (minkunet4d) — PERF.md round-4
    'spatial decoder pruning' lever."""
    X, Y, Z = dims
    n = X * Y * Z
    sk = jnp.where(src_sel, src_keys, n)
    grid = jnp.zeros((n + 1,), jnp.bool_).at[sk].set(True, mode="drop")
    g = grid[:n].reshape(Z, Y, X)
    w = 2 * reach + 1
    for win in ((1, 1, w), (1, w, 1), (w, 1, 1)):
        g = jax.lax.reduce_window(
            g, False, jax.lax.bitwise_or, win, (1, 1, 1), "SAME"
        )
    m = jnp.take(g.reshape(-1), jnp.clip(q_keys, 0, n - 1))
    return m & q_valid


def compact_rows(sel, capacity: int):
    """Selected-row indices, compacted to `capacity` (order-preserving, so
    sorted keys stay sorted). Returns ((capacity,) int32 row index or -1,
    overflow count)."""
    V = sel.shape[0]
    iota = jnp.arange(V, dtype=jnp.int32)
    idx = _compact_by_sort(jnp.where(sel, iota, INT32_MAX), iota, capacity, 0)
    n = jnp.sum(sel)
    idx = jnp.where(jnp.arange(capacity) < n, idx, -1)
    return idx, jnp.maximum(n - capacity, 0)


def take_rows(a, idx, fill=0):
    """Row gather with -1 -> fill."""
    rows = jnp.take(a, jnp.maximum(idx, 0), axis=0)
    m = (idx >= 0).reshape((-1,) + (1,) * (a.ndim - 1))
    return jnp.where(m, rows, fill)


# ------------------------------------------------------------ dense grid
def site_grid(x: Slab) -> jax.Array:
    """Transient dense (X*Y*Z + pad,) int32 map: key -> site index or -1.

    One scatter of V entries; consumed by widened window probes. The +2
    tail cells absorb clamped out-of-range probes.
    """
    n_cells = math.prod(x.dims)
    grid = jnp.full((n_cells + 2,), -1, jnp.int32)
    safe = jnp.where(x.valid, x.keys, n_cells + 2)  # OOB -> dropped
    return grid.at[safe].set(
        jnp.arange(x.capacity, dtype=jnp.int32), mode="drop"
    )


@dataclass
class WindowTables:
    """Per-(site set, kernel geometry) neighbour tables.

    wstart:  (G, V) int32 — array index of the first present x-window
             neighbour for group g (Vin = zero-pad row when none).
    slotmap: (G, kx, V) int8 — window slot holding kernel x-position j,
             or -1 when that neighbour is absent.
    """

    wstart: jax.Array
    slotmap: jax.Array
    kx: int
    vin: int

    def conv(self, x: "Slab", weight, out: "Slab", kernel, chunk=None,
             t0_off: int = 0) -> "Slab":
        """Uniform conv entry shared with span_conv.SpanPlan."""
        return window_conv(
            x, weight, self, out, kernel, chunk=chunk, t0_off=t0_off
        )


jax.tree_util.register_dataclass(
    WindowTables, data_fields=["wstart", "slotmap"], meta_fields=["kx", "vin"]
)


def _groups_yz(kernel3):
    """Non-x kernel offset groups (ky, kz), y fastest — enumeration order
    matches make_offsets (weight axis order)."""
    outs = []
    for kz_i in range(kernel3[2]):
        for ky_i in range(kernel3[1]):
            outs.append((ky_i, kz_i))
    return outs


def window_tables(
    grid: jax.Array,  # site_grid(input slab)
    in_dims,
    out_coords,  # (V, 3) int32 output sites
    out_valid,  # (V,)
    kernel3,
    stride3=(1, 1, 1),
    pad3=None,
    vin: int = 0,
) -> WindowTables:
    """Build wstart/slotmap for a (possibly strided) conv.

    Input x needed by output o at kernel x-pos j: ox*sx - px + j —
    consecutive in j, so one widened grid probe of kx cells per (site,
    group) finds all of them. Present neighbours among kx consecutive keys
    occupy consecutive slots of the sorted site array (integer keys with
    nothing in between), so the feature fetch is a single widened gather
    at the first present index.
    """
    kx = int(kernel3[0])
    if pad3 is None:  # centered submanifold
        pad3 = tuple((kk - 1) // 2 for kk in kernel3)
    groups = _groups_yz(kernel3)
    X, Y, Z = in_dims
    n_cells = X * Y * Z

    ox = out_coords[:, 0] * stride3[0] - pad3[0]
    oy0 = out_coords[:, 1] * stride3[1] - pad3[1]
    oz0 = out_coords[:, 2] * stride3[2] - pad3[2]

    # Grid probes as ONE 256-cell overlapped ROW take + one-hot select.
    # A single-element or multi-dim sliced gather is pathologically slow
    # on this runtime (tools probes); the probe cost is take-dominated
    # (~18 ns/row from an HBM-resident grid), so the overlapped 256-wide
    # view halves it vs two 128-wide takes. The one-hot select is an f32
    # einsum — exact for indices < 2^24.
    NR = (n_cells + 2 + 127) // 128
    gpad = jnp.concatenate(
        [grid, jnp.full((NR * 128 + 256 - grid.shape[0],), -1, jnp.int32)]
    )
    # overlapped view: row r covers cells [r*128, r*128 + 256)
    g256 = jnp.concatenate(
        [gpad[: NR * 128].reshape(NR, 128), gpad[128 : NR * 128 + 128].reshape(NR, 128)],
        axis=-1,
    ).astype(jnp.float32)
    iota256 = jnp.arange(256, dtype=jnp.int32)

    wstarts = []
    slotmaps = []
    jx = jnp.arange(kx, dtype=jnp.int32)
    x_ok = (ox[:, None] + jx[None] >= 0) & (ox[:, None] + jx[None] < X)
    for (ky_i, kz_i) in groups:
        iy = oy0 + ky_i
        iz = oz0 + kz_i
        row_ok = out_valid & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        base = (iz * Y + iy) * X + ox  # first cell of the x-window
        row = jnp.clip(jnp.floor_divide(base, 128), 0, NR - 1)
        pos = base - row * 128  # window cell j lives at pair col pos + j
        pair = jnp.take(g256, row, axis=0)  # (V, 256) f32
        onehot = (
            iota256[None, None] == (pos[:, None] + jx[None])[..., None]
        ).astype(jnp.float32)  # (V, kx, 256)
        idx = jnp.einsum(
            "vjw,vw->vj", onehot, pair, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        idx = jnp.where(x_ok & row_ok[:, None], idx, -1)
        present = idx >= 0
        rank = jnp.cumsum(present.astype(jnp.int32), axis=1) - 1  # (V, kx)
        slot = jnp.where(present, rank, -1).astype(jnp.int8)
        start = jnp.min(jnp.where(present, idx, INT32_MAX), axis=1)
        start = jnp.where(start == INT32_MAX, vin, start)
        wstarts.append(start.astype(jnp.int32))
        slotmaps.append(slot.T)  # (kx, V)

    return WindowTables(
        wstart=jnp.stack(wstarts),  # (G, V)
        slotmap=jnp.stack(slotmaps),  # (G, kx, V)
        kx=kx,
        vin=vin,
    )


def slice_slots(x: Slab, t0: int, T_eff: int) -> Slab:
    """View of slots [t0, t0 + T_eff) of a slab: same site set, sliced
    occupancy and (t-major, so contiguous) feature columns.

    Basis of t-pruned inference: the model only consumes the CURRENT
    scan's MotionNet output (reference models/models.py:322-324 computes
    the motion loss on current_motion_feature only), and each 3^4 block
    extends the temporal receptive field by 1 per conv — so decoder
    tensors only need a trailing window of slots. Occ-masked features at
    (site, t) depend only on scans within reach of t, making the sliced
    computation EXACT (tests/test_slab.py)."""
    C = x.num_features
    return Slab(
        x.keys, x.coords,
        x.occ[:, t0 : t0 + T_eff],
        x.feats[:, t0 * C : (t0 + T_eff) * C] if x.feats.shape[-1] else x.feats,
        x.valid, x.dims, T_eff,
    )


def t_band(kt: int, T_in: int, T_out: int, doff: int, dtype):
    """(kt, T_in, T_out) band selectors for folding a t-kernel into flat
    (V, T*C) matmuls. Output slot p (absolute t0_out + p) reads input slot
    i = p + doff + it - lo where doff = t0_out - t0_in; entries outside
    [0, T_in) vanish (window-edge clipping, same as the full-T fold)."""
    lo = (kt - 1) // 2
    return jnp.stack(
        [
            jnp.eye(T_in, T_out, k=-(doff + it - lo), dtype=dtype)
            for it in range(kt)
        ]
    )


# ------------------------------------------------------------ convolution
def _shift_concat(feats_pad, kx, vin):
    """(Vin+kx, TC) -> (Vin+1, kx*TC): row p holds rows p..p+kx-1.

    Pure slice-concat (no gathers); one subsequent PLAIN row take per
    (site, group) then fetches a whole kx-window — XLA's fast gather path
    (~5 ns/row at >=512 B), unlike multi-element sliced gathers which are
    pathologically slow on this runtime.
    """
    return jnp.concatenate(
        [feats_pad[j : j + vin + 1] for j in range(kx)], axis=-1
    )


def _gather_src(f3, wstart_g, slotmap_g, kx, TC):
    """One group's aligned kernel-x windows: (rows, kx*TC)."""
    win = jnp.take(f3, wstart_g, axis=0)  # (rows, kx*TC)
    parts = []
    for d in range(kx):  # kernel x-position d <- window slot slotmap[d]
        sel = jnp.zeros((win.shape[0], TC), win.dtype)
        for ws in range(kx):
            sel = jnp.where(
                (slotmap_g[d] == ws)[:, None],
                win[:, ws * TC : (ws + 1) * TC],
                sel,
            )
        parts.append(sel)
    return jnp.concatenate(parts, axis=-1)


def _f3_of(feats, kx):
    feats_pad = jnp.concatenate([feats, jnp.zeros((kx, feats.shape[1]), feats.dtype)])
    return _shift_concat(feats_pad, kx, feats.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _conv_core(feats, wg, wstart, slotmap, kx, TC, chunk):
    """sum_g gather_src(feats, g) @ wg[g] with a memory-bounded VJP.

    Plain autodiff of the group scan saves every group's (V, kx*TC)
    gathered window as a backward residual — 95.5 GiB at reference
    training scale, and even under jax.checkpoint the scan's transpose
    stacks them per chunk (measured 26.9 GiB vs 15.75 GiB HBM,
    tools/measure_train_step.py). The custom backward instead RECOMPUTES
    each group's gather inside its own scan step (transient) and
    scatter-adds feature cotangents through the window take — residuals
    are just (feats, wg, tables): O(V*T*C), not O(G*V*kx*T*C).
    """
    return _conv_core_fwd(feats, wg, wstart, slotmap, kx, TC, chunk)[0]


def _conv_core_fwd(feats, wg, wstart, slotmap, kx, TC, chunk):
    f3 = _f3_of(feats, kx)
    V = wstart.shape[1]
    G = wstart.shape[0]
    TOC = wg.shape[2]

    def scan_groups(wstart_all, slot_all):
        acc0 = jnp.zeros((wstart_all.shape[1], TOC), jnp.float32)

        def body(acc, sc):
            ws_g, sm_g, w_g = sc
            src = _gather_src(f3, ws_g, sm_g, kx, TC)
            return acc + jnp.matmul(
                src, w_g, preferred_element_type=jnp.float32,
                precision="highest",
            ), None

        acc, _ = jax.lax.scan(body, acc0, (wstart_all, slot_all, wg))
        return acc

    if chunk is None or V <= chunk:
        out = scan_groups(wstart, slotmap)
    else:
        assert V % chunk == 0, f"capacity {V} % chunk {chunk}"
        nc = V // chunk
        ws = wstart.reshape(G, nc, chunk).transpose(1, 0, 2)
        sm = slotmap.reshape(G, kx, nc, chunk).transpose(2, 0, 1, 3)
        out = jax.lax.map(lambda a: scan_groups(*a), (ws, sm)).reshape(V, TOC)
    return out, (feats, wg, wstart, slotmap)


def _conv_core_bwd(kx, TC, chunk, res, g):
    import numpy as np

    feats, wg, wstart, slotmap = res
    Vin = feats.shape[0]
    f3 = _f3_of(feats, kx)
    g32 = g.astype(jnp.float32)

    def body(dfp, sc):
        ws_g, sm_g, w_g = sc
        src = _gather_src(f3, ws_g, sm_g, kx, TC)
        dw_g = jnp.matmul(
            src.astype(jnp.float32).T, g32,
            preferred_element_type=jnp.float32, precision="highest",
        )
        dsrc = jnp.matmul(
            g32, w_g.astype(jnp.float32).T,
            preferred_element_type=jnp.float32, precision="highest",
        )
        # transpose of (window take + slot select): route kernel-x block d
        # back to feats_pad row wstart + slot(d)
        for d in range(kx):
            dsel = dsrc[:, d * TC : (d + 1) * TC]
            for ws in range(kx):
                dfp = dfp.at[ws_g + ws].add(
                    jnp.where((sm_g[d] == ws)[:, None], dsel, 0.0)
                )
        return dfp, dw_g

    dfp0 = jnp.zeros((Vin + kx, TC), jnp.float32)
    dfp, dwg = jax.lax.scan(body, dfp0, (wstart, slotmap, wg))
    dfeats = dfp[:Vin].astype(feats.dtype)
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dfeats, dwg.astype(wg.dtype), zero_i(wstart), zero_i(slotmap)


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def window_conv(
    x: Slab,
    weight,
    tables: WindowTables,
    out: Slab,
    kernel,
    chunk: int | None = None,
    t0_off: int = 0,
) -> Slab:
    """See _window_conv_impl; this wrapper binds the static arguments
    positionally."""
    return _window_conv_impl(x, weight, tables, out, tuple(kernel), chunk, t0_off)


def _window_conv_impl(
    x: Slab,
    weight,  # (K, Cin, Cout), K enumerated x-fastest / t-slowest
    tables: WindowTables,
    out: Slab,  # output site set (occ used for masking)
    kernel,  # (kx, ky, kz[, kt])
    chunk: int | None = None,
    t0_off: int = 0,  # out slot range offset vs input (t-pruned inference)
) -> Slab:
    """Generic windowed sparse conv: subm (out is x, centered tables) or
    strided (out from derive_strided_sites, tables with stride/pad).

    Inner math is FLAT 2D (V, T*C) throughout — no (V, kx, T, C)
    intermediates, whose tiny trailing dims the TPU tiler pads to 128
    lanes (16x bloat at C=8; PERF.md). Per group: one widened row take,
    kx^2 lane-wide selects to align window slots to kernel x-positions,
    and ONE matmul against a weight with the whole t-kernel structure
    folded in as a (T, T) band (block-diagonal over t), so the temporal
    offsets of a 3^4 kernel cost no extra passes.

    Backward memory is bounded by _conv_core's custom VJP (see its
    docstring): gathers are recomputed per group in the transpose instead
    of being saved — 95.5 GiB of residuals (26.9 GiB under plain
    jax.checkpoint) become O(V*T*C) at reference training scale
    (tools/measure_train_step.py, PERF.md).
    """
    kx = tables.kx
    kt = kernel[3] if len(kernel) == 4 else 1
    G = tables.wstart.shape[0]
    K, cin, cout = weight.shape
    assert K == kx * G * kt, (K, kx, G, kt)
    T = x.T
    Tout = out.T
    V = out.capacity
    TC = T * cin

    # Fold the t-kernel into per-group flat weights:
    #   Wg[(d*T + t)*cin + c, p*cout + o] = sum_it w[it,g,d,c,o]
    #                                       * [t == p + t0_off + it - lo]
    w5 = weight.reshape(kt, G, kx, cin, cout)  # t slowest, (z,y)=G, x fastest
    bands = t_band(kt, T, Tout, t0_off, weight.dtype)
    wg = jnp.einsum("igdco,itp->gdtcpo", w5, bands).reshape(
        G, kx * TC, Tout * cout
    )

    out_feats = _conv_core(
        x.mask_feats().astype(weight.dtype), wg, tables.wstart,
        tables.slotmap, kx, TC, chunk,
    )

    res = out.replace_feats(out_feats)
    return res.replace_feats(res.mask_feats())


def strided_occ(
    x: Slab, tables: WindowTables, out: Slab
) -> Slab:
    """Fill out.occ = OR over the gathered children's occupancy (the output
    4D site set of a t-kernel-1 strided conv: same-t children). Flat 2D:
    per-slot lane selects instead of a (V, kx, T) einsum."""
    kx = tables.kx
    T = x.T
    occ_pad = jnp.concatenate(
        [jnp.where(x.valid[:, None], x.occ, False).astype(jnp.float32),
         jnp.zeros((kx, T), jnp.float32)]
    )
    o3 = _shift_concat(occ_pad, kx, x.capacity)
    G = tables.wstart.shape[0]
    acc = jnp.zeros((out.capacity, T), jnp.float32)
    for g in range(G):
        win = jnp.take(o3, tables.wstart[g], axis=0)  # (V, kx*T)
        # window slot w holds the w-th present neighbour: include w < count
        count = (tables.slotmap[g] >= 0).sum(axis=0)  # (V,)
        for w in range(kx):
            acc = acc + jnp.where(
                (w < count)[:, None], win[:, w * T : (w + 1) * T], 0.0
            )
    occ = (acc > 0) & out.valid[:, None]
    return Slab(out.keys, out.coords, occ, out.feats, out.valid, out.dims, out.T)


@functools.partial(jax.checkpoint, prevent_cse=False)
def inverse_s2k2_conv(
    coarse: Slab,
    weight,  # (8, cin, cout) or (K=8*kt?...) — kernel (2,2,2[,1])
    fine: Slab,  # recorded fine site set (occ included)
    parent_idx,  # (Vf,) int32 index into coarse (or -1)
) -> Slab:
    """Inverse of the stride-2 kernel-2 down conv (ME transpose conv in
    MinkUNet, minkunet.py:96-117): each fine site has exactly one coarse
    parent (o = f//2) and one kernel position (k = f & 1 per dim).
    """
    K, cin, cout = weight.shape
    T = coarse.T
    f = coarse.mask_feats().astype(weight.dtype)
    f_pad = jnp.concatenate([f, jnp.zeros((1, T * cin), f.dtype)])
    idx = jnp.where(parent_idx >= 0, parent_idx, coarse.capacity)
    pf = jnp.take(f_pad, idx, axis=0)  # (Vf, T*cin) flat
    kidx = (
        (fine.coords[:, 0] & 1)
        + 2 * (fine.coords[:, 1] & 1)
        + 4 * (fine.coords[:, 2] & 1)
    )
    # one matmul against all 8 kernel positions (block-diagonal over t),
    # then per-site lane select of the right position — flat 2D, no
    # (Vf, T, cin) / per-site-weight intermediates
    eyeT = jnp.eye(T, dtype=weight.dtype)
    w_all = jnp.einsum("kcd,tp->ktcpd", weight[:8], eyeT).reshape(
        8, T * cin, T * cout
    )
    w_cat = jnp.moveaxis(w_all, 0, 1).reshape(T * cin, 8 * T * cout)
    allk = jnp.matmul(
        pf, w_cat, preferred_element_type=jnp.float32, precision="highest"
    )  # (Vf, 8*T*cout), k-major blocks
    TOUT = T * cout
    out = jnp.zeros((fine.capacity, TOUT), jnp.float32)
    for k in range(8):
        out = jnp.where(
            (kidx == k)[:, None], allk[:, k * TOUT : (k + 1) * TOUT], out
        )
    res = fine.replace_feats(out)
    return res.replace_feats(res.mask_feats())


def parent_index(grid_coarse, coarse_dims, fine: Slab) -> jax.Array:
    """(Vf,) index of each fine site's stride-2 parent in the coarse slab."""
    pc = fine.coords // 2
    key = linearize3(pc, coarse_dims)
    n_cells = math.prod(coarse_dims)
    probe = jnp.where(fine.valid & (key != KEY_SENTINEL), key, n_cells + 1)
    return jnp.take(grid_coarse, probe)


def gather_slots(slab: Slab, point_to_slot, C: int):
    """Per-point features from a slab: slot = site*T + t; -1 -> zeros.

    Takes whole (T*C) site rows then extracts the point's t-block — the
    (V*T, C) reshape would relayout the feature array into a tiny-trailing
    form the tiler pads 16-50x (PERF.md)."""
    T = slab.T
    f_pad = jnp.concatenate(
        [slab.feats, jnp.zeros((1, T * C), slab.feats.dtype)]
    )
    site = jnp.where(point_to_slot >= 0, point_to_slot // T, slab.capacity)
    t = jnp.where(point_to_slot >= 0, point_to_slot % T, 0)
    rows = jnp.take(f_pad, site, axis=0)  # (P, T*C)
    cols = t[:, None] * C + jnp.arange(C, dtype=point_to_slot.dtype)[None]
    return jnp.take_along_axis(rows, cols, axis=1)
