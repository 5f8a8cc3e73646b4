"""Sparse convolutions as gather -> one big matmul.

Replaces spconv's SubMConv3d / SparseConv3d / SparseInverseConv3d and
MinkowskiEngine's (transpose) convolutions (SURVEY.md S2.2). Instead of
GPU-style rulebooks, neighbours are found by binary search into the sorted
key array and the conv itself is a single (V, K*Cin) @ (K*Cin, Cout) matmul
that keeps the MXU busy; missing neighbours gather a zero row.

Weight layout: (K, Cin, Cout) with K enumerated by
``coords.make_offsets(kernel)`` — offsets pair positionally with weights.

Site derivation is arithmetic, which removes spconv's indice_key machinery:
- subm: output sites == input sites (SubMConv3d).
- strided: out(o) = sum_k W[k] . in(o*s - p + k); output sites = every o
  receiving >= 1 contribution, deduplicated (SparseConv3d).
- inverse: out(f) = sum_k W[k] . in((f + p - k)/s) over exact divisions,
  with the fine site set passed in explicitly — the caller hands back the
  site set recorded before the paired strided conv, which is exactly what
  spconv's indice_key replay reconstructs (spconv_unet.py:181-207).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .coords import linearize_coords, lookup_keys, make_offsets
from .tensor import SparseTensor
from .voxelize import unique_voxels


def _mm(x, w):
    """Matmul with f32 accumulation at HIGHEST precision (f32 default
    precision lowers pathologically slowly on the target TPU runtime —
    tools/probe_matmul2.py; no-op for bf16 operands)."""
    return jnp.matmul(
        x, w, preferred_element_type=jnp.float32, precision="highest"
    )


def _gather_rows(feats, idx):
    """Gather feature rows; idx -1 -> zeros."""
    v = feats.shape[0]
    padded = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    return jnp.take(padded, jnp.where(idx >= 0, idx, v), axis=0)


def gather_neighbor_idx(x: SparseTensor, query_coords) -> jax.Array:
    """(V, K, D) neighbour coords -> (V, K) row indices into x (or -1)."""
    qkeys = linearize_coords(query_coords, x.dims)
    return lookup_keys(x.keys, qkeys.reshape(-1)).reshape(query_coords.shape[:-1])


def neighbor_table(
    x: SparseTensor, kernel_size: Sequence[int], chunk=None
) -> jax.Array:
    """Precompute the (V, K) submanifold neighbour index table for x's site
    set and a centered kernel. Every subm conv on the same sites + kernel
    reuses it — the binary-search lookups are the dominant cost of a sparse
    conv, so sharing the table across the conv stack is a large win."""
    offsets = jnp.asarray(make_offsets(kernel_size, centered=True), jnp.int32)
    K = offsets.shape[0]

    def run(rows_coords):
        centers = rows_coords[:, None, :] + offsets[None]
        return gather_neighbor_idx(x, centers)

    V = x.capacity
    if chunk is None or V <= chunk:
        return run(x.coords)
    assert V % chunk == 0
    cc = x.coords.reshape(V // chunk, chunk, -1)
    return jax.lax.map(run, cc).reshape(V, K)


def gather_matmul(x: SparseTensor, idx, weight, out_valid, chunk=None):
    """(V, K) neighbour table + (K, Cin, Cout) weight -> (V, Cout) conv."""
    K, cin, cout = weight.shape
    feats = jnp.where(x.valid[:, None], x.feats, 0.0).astype(weight.dtype)
    w2 = weight.reshape(K * cin, cout)

    def run(rows_idx, rows_valid):
        gathered = _gather_rows(feats, rows_idx.reshape(-1)).reshape(-1, K * cin)
        out = _mm(gathered, w2)
        return jnp.where(rows_valid[:, None], out, 0.0)

    V = idx.shape[0]
    if chunk is None or V <= chunk:
        return run(idx, out_valid)
    assert V % chunk == 0
    ci = idx.reshape(V // chunk, chunk, K)
    cv = out_valid.reshape(V // chunk, chunk)
    out = jax.lax.map(lambda a: run(*a), (ci, cv))
    return out.reshape(V, cout)


def _apply_kernel(
    x: SparseTensor, out_coords, out_valid, weight, stride, pad, offsets, chunk=None
):
    """Core gather-conv: for output site o, gather x at o*s - p + k.

    `chunk` bounds live memory: the (rows, K, Cin) gathered block and the
    (rows, K) index block are materialized per chunk of output rows via a
    sequential lax.map — essential for the 4D MotionNet where K is 81-125
    and V is ~1.5M.
    """
    K, cin, cout = weight.shape
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(pad, jnp.int32)
    offs = jnp.asarray(offsets, jnp.int32)  # (K, D)
    feats = jnp.where(x.valid[:, None], x.feats, 0.0).astype(weight.dtype)
    w2 = weight.reshape(K * cin, cout)

    def run(rows_coords, rows_valid):
        centers = rows_coords[:, None, :] * s[None, None] - p[None, None] + offs[None]
        idx = gather_neighbor_idx(x, centers)  # (rows, K)
        gathered = _gather_rows(feats, idx.reshape(-1)).reshape(-1, K * cin)
        out = _mm(gathered, w2)
        return jnp.where(rows_valid[:, None], out, 0.0)

    V = out_coords.shape[0]
    if chunk is None or V <= chunk:
        return run(out_coords, out_valid)
    assert V % chunk == 0, f"capacity {V} not divisible by chunk {chunk}"
    cc = out_coords.reshape(V // chunk, chunk, -1)
    cv = out_valid.reshape(V // chunk, chunk)
    out = jax.lax.map(lambda args: run(*args), (cc, cv))
    return out.reshape(V, cout)


def subm_gather_conv(
    x: SparseTensor, weight, kernel_size: Sequence[int], chunk=None, table=None
) -> SparseTensor:
    """Submanifold conv: output sites = input sites (spconv SubMConv3d /
    ME MinkowskiConvolution with stride 1 and odd kernel).

    `table`: optional precomputed neighbor_table(x, kernel_size) to share
    lookups across convs on the same site set. Without a table the lookup +
    gather + matmul stay fused per chunk (never materializing the full
    (V, K) index table — it can be ~GB for the 4D stem).
    """
    if table is not None:
        feats = gather_matmul(x, table, weight, x.valid, chunk=chunk)
        return x.replace_feats(feats)
    offsets = make_offsets(kernel_size, centered=True)
    feats = _apply_kernel(
        x,
        x.coords,
        x.valid,
        weight,
        stride=np.ones(len(kernel_size), np.int32),
        pad=np.zeros(len(kernel_size), np.int32),
        offsets=offsets,
        chunk=chunk,
    )
    return x.replace_feats(feats)


def strided_conv_sites(
    x: SparseTensor,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    pad: Sequence[int],
    out_dims: Sequence[int],
    capacity: int,
    with_pairs: bool = False,
):
    """Derive the output site set of a strided sparse conv.

    An input site i feeds outputs o with o*s - p + k = i, k in [0, kernel);
    per dim that is the integer range ceil((i+p-k+1)/s) .. floor((i+p)/s).
    We enumerate the <= ceil(k/s) candidates per dim and deduplicate.

    with_pairs=True additionally returns the (input, candidate) -> output
    pairing produced by the dedup — (pairs (V, Kc) int32 output rows or -1,
    kidx (V, Kc) int32 flattened kernel position) — which makes the strided
    conv itself and its exact inverse LOOKUP-FREE (see strided_conv_pairs /
    inverse_conv_pairs): this is the byproduct that replaces spconv's
    indice_key rulebooks.
    """
    D = len(kernel_size)
    per_dim = [int(np.ceil(k / s)) for k, s in zip(kernel_size, stride)]
    cand_ranges = [np.arange(c, dtype=np.int32) for c in per_dim]
    mesh = np.meshgrid(*cand_ranges[::-1], indexing="ij")
    cand = np.stack([m.reshape(-1) for m in mesh[::-1]], axis=-1)  # (Kc, D)
    Kc = cand.shape[0]

    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(pad, jnp.int32)
    k = jnp.asarray(kernel_size, jnp.int32)
    i = x.coords  # (V, D)
    # largest output index per dim: floor((i + p) / s); subsequent candidates
    # step down by 1; validity: o*s - p <= i <= o*s - p + (k-1) and o >= 0
    o_hi = jnp.floor_divide(i + p[None], s[None])
    cands = o_hi[:, None, :] - jnp.asarray(cand)[None]  # (V, Kc, D)
    lo_ok = cands * s[None, None] - p[None, None] <= i[:, None, :]
    hi_ok = cands * s[None, None] - p[None, None] + (k[None, None] - 1) >= i[:, None, :]
    ok = (lo_ok & hi_ok & (cands >= 0)).all(-1) & x.valid[:, None]  # (V, Kc)

    flat = cands.reshape(-1, D)
    sites, p2v, _, _ = unique_voxels(
        flat, out_dims, capacity, point_valid=ok.reshape(-1), first_occurrence_cap=False
    )
    if not with_pairs:
        return sites
    pairs = jnp.where(ok, p2v.reshape(-1, Kc), -1)
    # kernel position of pair (i, o): delta = i + p - o*s, flattened x-fastest
    delta = i[:, None, :] + p[None, None] - cands * s[None, None]  # (V, Kc, D)
    kidx = jnp.zeros(delta.shape[:2], jnp.int32)
    mult = 1
    for d in range(D):
        kidx = kidx + jnp.clip(delta[..., d], 0, kernel_size[d] - 1) * mult
        mult *= kernel_size[d]
    return sites, pairs, kidx


def strided_conv_pairs(
    x: SparseTensor, weight, out_sites: SparseTensor, pairs, kidx
) -> SparseTensor:
    """Strided conv via the derivation pairs: per input voxel, project its
    features by its kernel-position weight and scatter-add into the output —
    zero neighbor lookups (the dedup already paired inputs with outputs)."""
    K, cin, cout = weight.shape
    V, Kc = pairs.shape
    feats = jnp.where(x.valid[:, None], x.feats, 0.0).astype(weight.dtype)
    # (V, K, Cout) projections, then per (input, candidate) select its k row
    proj = jnp.einsum(
        "vc,kcd->vkd", feats, weight,
        preferred_element_type=jnp.float32, precision="highest",
    )
    sel = jnp.take_along_axis(
        proj, jnp.clip(kidx, 0, K - 1)[..., None], axis=1
    )  # (V, Kc, Cout)
    sel = jnp.where(pairs[..., None] >= 0, sel, 0.0)
    tgt = jnp.where(pairs >= 0, pairs, out_sites.capacity)
    out = jnp.zeros((out_sites.capacity + 1, cout), jnp.float32)
    out = out.at[tgt.reshape(-1)].add(sel.reshape(-1, cout), mode="drop")
    out = out[:-1] * out_sites.valid[:, None]
    return out_sites.replace_feats(out)


def inverse_conv_pairs(
    coarse: SparseTensor, weight, fine_sites: SparseTensor, pairs, kidx,
    kernel_size=None, stride=None, pad=None,
) -> SparseTensor:
    """Exact inverse of the paired strided conv: gather each fine site's
    coarse parents (the transposed pairs) and apply the same
    kernel-position weights — zero lookups (spconv SparseInverseConv3d
    semantics).

    With (kernel_size, stride, pad) the PARITY-GROUPED path runs: for a
    fixed candidate slot c, the kernel position is a static function of
    the fine coordinate's per-dim parity (delta_d = (i_d + p_d) mod s_d
    + s_d * cand_d — see strided_conv_sites), so instead of
    materializing every coarse voxel's (K, Cout) projections (lane-padded
    to ~1 GB at L1 scale) and gathering (V*Kc) rows out of it — measured
    ~40 ms/step on a v5e (PERF.md round-4 trace) — we gather the (V, Cin)
    parent FEATURES per candidate (a 100x smaller table) and fold the
    parity selection into one (V, NP*Cin) @ (NP*Cin, Cout) matmul per
    candidate. Without the geometry kwargs the general gather path runs
    (any pairing, tools/tests)."""
    K, cin, cout = weight.shape
    V, Kc = pairs.shape
    feats = jnp.where(coarse.valid[:, None], coarse.feats, 0.0).astype(weight.dtype)

    if stride is not None:
        D = len(stride)
        per_dim = [int(np.ceil(k / s)) for k, s in zip(kernel_size, stride)]
        cand_ranges = [np.arange(c, dtype=np.int32) for c in per_dim]
        mesh = np.meshgrid(*cand_ranges[::-1], indexing="ij")
        cand = np.stack([m.reshape(-1) for m in mesh[::-1]], axis=-1)
        assert cand.shape[0] == Kc, (cand.shape, Kc)
        # static (NP, Kc) kernel-position table over fine-coord parities
        NP = int(np.prod(stride))
        pars = np.stack(
            np.meshgrid(
                *[np.arange(s, dtype=np.int32) for s in stride][::-1],
                indexing="ij",
            )[::-1],
            axis=-1,
        ).reshape(NP, D)
        kid = np.zeros((NP, Kc), np.int32)
        mult = 1
        for d in range(D):
            delta = pars[:, None, d] + stride[d] * cand[None, :, d]
            kid += np.clip(delta, 0, kernel_size[d] - 1) * mult
            mult *= kernel_size[d]
        # per-site flat parity
        pmod = (
            fine_sites.coords + jnp.asarray(pad, jnp.int32)[None]
        ) % jnp.asarray(stride, jnp.int32)[None]
        par = jnp.zeros((V,), jnp.int32)
        m = 1
        for d in range(D):
            par = par + pmod[:, d] * m
            m *= stride[d]
        sel = jax.nn.one_hot(par, NP, dtype=weight.dtype)  # (V, NP)

        fpad = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)])
        out = jnp.zeros((V, cout), jnp.float32)
        for c in range(Kc):
            g = jnp.take(
                fpad,
                jnp.where(pairs[:, c] >= 0, pairs[:, c], fpad.shape[0] - 1),
                axis=0,
            )  # (V, cin)
            wstack = weight[kid[:, c]].reshape(NP * cin, cout)
            gp = (g[:, None, :] * sel[:, :, None]).reshape(V, NP * cin)
            out = out + jnp.matmul(
                gp, wstack, preferred_element_type=jnp.float32,
                precision="highest",
            )
        out = out * fine_sites.valid[:, None]
        return fine_sites.replace_feats(out)

    proj = jnp.einsum(
        "vc,kcd->vkd", feats, weight,
        preferred_element_type=jnp.float32, precision="highest",
    )  # (Vc, K, Cout)
    flatproj = jnp.concatenate(
        [proj.reshape(-1, cout), jnp.zeros((1, cout), proj.dtype)]
    )
    flat_idx = jnp.where(
        pairs >= 0, pairs * K + jnp.clip(kidx, 0, K - 1), flatproj.shape[0] - 1
    )
    gathered = jnp.take(flatproj, flat_idx.reshape(-1), axis=0).reshape(V, Kc, cout)
    out = gathered.sum(axis=1) * fine_sites.valid[:, None]
    return fine_sites.replace_feats(out)


def strided_conv(
    x: SparseTensor,
    weight,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    pad: Sequence[int],
    out_sites: SparseTensor,
    chunk=None,
) -> SparseTensor:
    """Strided sparse conv onto precomputed output sites (spconv SparseConv3d)."""
    offsets = make_offsets(kernel_size, centered=False)
    feats = _apply_kernel(
        x, out_sites.coords, out_sites.valid, weight, stride, pad, offsets, chunk=chunk
    )
    return out_sites.replace_feats(feats)


def inverse_conv(
    x: SparseTensor,
    weight,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    pad: Sequence[int],
    fine_sites: SparseTensor,
    chunk=None,
) -> SparseTensor:
    """Inverse of a strided conv: scatter coarse features back onto the
    recorded fine site set (spconv SparseInverseConv3d / ME transpose conv).

    out(f) = sum_k W[k] . x((f + p - k)/s) for exact integer divisions.
    """
    K, cin, cout = weight.shape
    offs = jnp.asarray(make_offsets(kernel_size, centered=False), jnp.int32)
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(pad, jnp.int32)
    feats = jnp.where(x.valid[:, None], x.feats, 0.0).astype(weight.dtype)
    w2 = weight.reshape(K * cin, cout)

    def run(f_coords, f_valid):
        num = f_coords[:, None, :] + p[None, None] - offs[None]  # (rows, K, D)
        q, r = jnp.divmod(num, s[None, None])
        exact = (r == 0).all(-1)  # (rows, K)
        qkeys = linearize_coords(q, x.dims)
        idx = lookup_keys(x.keys, qkeys.reshape(-1)).reshape(exact.shape)
        idx = jnp.where(exact, idx, -1)
        gathered = _gather_rows(feats, idx.reshape(-1)).reshape(-1, K * cin)
        out = _mm(gathered, w2)
        return jnp.where(f_valid[:, None], out, 0.0)

    V = fine_sites.capacity
    if chunk is None or V <= chunk:
        out = run(fine_sites.coords, fine_sites.valid)
    else:
        assert V % chunk == 0, f"capacity {V} not divisible by chunk {chunk}"
        cc = fine_sites.coords.reshape(V // chunk, chunk, -1)
        cv = fine_sites.valid.reshape(V // chunk, chunk)
        out = jax.lax.map(lambda args: run(*args), (cc, cv)).reshape(V, cout)
    return fine_sites.replace_feats(out)
