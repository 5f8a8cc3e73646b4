"""Coordinate linearization, kernel offset enumeration, and sorted-key lookup."""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .tensor import KEY_SENTINEL


def check_dims(dims: Sequence[int]) -> None:
    total = math.prod(dims)
    assert total < 2**31 - 1, f"grid {dims} overflows int32 keys ({total})"


def linearize_coords(coords, dims: Sequence[int], valid=None):
    """(N, D) int coords -> (N,) int32 keys; x fastest. Out-of-grid or
    invalid rows -> KEY_SENTINEL (sorts last, never matches a query)."""
    check_dims(dims)
    coords = coords.astype(jnp.int32)
    key = jnp.zeros(coords.shape[:-1], jnp.int32)
    in_grid = jnp.ones(coords.shape[:-1], bool)
    for d in reversed(range(len(dims))):
        c = coords[..., d]
        in_grid &= (c >= 0) & (c < dims[d])
        key = key * dims[d] + jnp.clip(c, 0, dims[d] - 1)
    if valid is not None:
        in_grid &= valid
    return jnp.where(in_grid, key, KEY_SENTINEL)


def delinearize_key(keys, dims: Sequence[int]):
    """Inverse of linearize (valid keys only): (N,) -> (N, D)."""
    cols = []
    k = keys
    for d in range(len(dims)):
        cols.append((k % dims[d]).astype(jnp.int32))
        k = k // dims[d]
    return jnp.stack(cols, axis=-1)


def make_offsets(kernel_size: Sequence[int], centered: bool = True) -> np.ndarray:
    """(K, D) int32 kernel offsets, x varying fastest.

    centered=True gives [-(k-1)//2 .. k//2] per dim (odd kernels symmetric);
    centered=False gives [0 .. k) (used with an explicit pad term). The
    enumeration order is the canonical weight-axis order of all conv weights
    in this package: weight[k] pairs with offsets[k].
    """
    ranges = []
    for k in kernel_size:
        if centered:
            lo = -((k - 1) // 2)
            ranges.append(np.arange(lo, lo + k, dtype=np.int32))
        else:
            ranges.append(np.arange(k, dtype=np.int32))
    mesh = np.meshgrid(*ranges, indexing="ij")  # dim 0 slowest
    offs = np.stack([m.reshape(-1) for m in mesh], axis=-1)  # (K, D), dim0 col 0
    # want x (dim 0) fastest in enumeration: reverse the meshgrid nesting
    mesh = np.meshgrid(*ranges[::-1], indexing="ij")
    offs = np.stack([m.reshape(-1) for m in mesh[::-1]], axis=-1)
    return offs.astype(np.int32)


def lookup_keys(sorted_keys, query_keys):
    """Binary-search membership: (Q,) query keys -> (Q,) int32 row index
    into sorted_keys, or -1 when absent. Padding rows (KEY_SENTINEL) never
    match because queries equal to the sentinel are rejected explicitly.

    Hand-rolled bisection: jnp.searchsorted's lowering is
    pathologically slow on some TPU runtimes (measured ~11 us/query on
    v5e-via-axon vs ~20 vectorized gathers here).
    """
    n = sorted_keys.shape[0]
    # interval [0, n] has n+1 candidate answers -> ceil(log2(n+1)) steps;
    # statically unrolled — a lax.fori_loop here lowers to one HLO while
    # per call site and the per-while overhead (~37 us) dwarfs the body
    steps = max(1, math.ceil(math.log2(n + 1)))
    q = query_keys
    lo, hi = jnp.zeros_like(q), jnp.full_like(q, n)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        kv = jnp.take(sorted_keys, mid)
        right = kv < q
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(right, hi, mid)
    idx = jnp.clip(lo, 0, n - 1)
    hit = (jnp.take(sorted_keys, idx) == q) & (q != KEY_SENTINEL)
    return jnp.where(hit, idx, -1).astype(jnp.int32)
