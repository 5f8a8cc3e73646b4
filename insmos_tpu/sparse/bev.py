"""Sparse -> dense BEV projection (reference HeightCompression,
models/backbones_2d/height_compression.py: .dense() then stack z into
channels)."""

from __future__ import annotations

import jax.numpy as jnp

from .tensor import SparseTensor


def to_dense_bev(x: SparseTensor) -> jnp.ndarray:
    """(V voxels over dims (X, Y, Z)) -> (Y, X, Z*C) dense BEV, NHWC.

    Channel index is c*Z + z... the reference reshapes (N, C, D, H, W) ->
    (N, C*D, H, W), i.e. channel = c*D + z with z = depth slot; we emit HWC
    with the same c-major channel order so converted 2D conv weights line up.
    """
    X, Y, Z = x.dims
    C = x.num_features
    feats = jnp.where(x.valid[:, None], x.feats, 0.0)
    cx, cy, cz = x.coords[:, 0], x.coords[:, 1], x.coords[:, 2]
    flat = cy * (X * Z) + cx * Z + cz  # (V,) index into (Y, X, Z)
    flat = jnp.where(x.valid, flat, Y * X * Z)
    dense = jnp.zeros((Y * X * Z, C), feats.dtype)
    dense = dense.at[flat].set(feats, mode="drop")
    dense = dense.reshape(Y, X, Z, C)
    # channel = c*Z + z (c-major, matching torch's view(C*D, H, W))
    return jnp.transpose(dense, (0, 1, 3, 2)).reshape(Y, X, C * Z)
