"""Fixed-capacity sparse voxel tensor.

The one abstraction that replaces both external sparse engines of the
reference (MinkowskiEngine 4D tensors and spconv 3D tensors — SURVEY.md
S2.2): a capacity-padded set of integer voxel coordinates stored in
canonical sorted-key order, plus per-voxel features and a validity mask.

Sorted-key storage is the TPU-native choice: membership / neighbour lookup
is a vectorized binary search (O(log V) fused gather rounds, no dynamic
shapes, no host round-trips), and construction is one stable sort — XLA's
sort is highly optimized on TPU. Invalid (padding) rows carry the key
sentinel INT32_MAX and therefore always sort to the tail, so `valid` rows
are a prefix.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

KEY_SENTINEL = jnp.iinfo(jnp.int32).max


@jax.tree_util.register_dataclass
@dataclass
class SparseTensor:
    """A set of <= capacity voxels on an integer grid.

    coords: (V, D) int32 grid-local coordinates, columns (x, y, z[, t]).
    keys:   (V,) int32 linearized coordinates, ascending; padding rows
            hold KEY_SENTINEL (and therefore sort last).
    feats:  (V, C) features (garbage on padding rows — always mask).
    valid:  (V,) bool.
    dims:   static grid extents (X, Y, Z[, T]) at this tensor's stride.
    """

    coords: jax.Array
    keys: jax.Array
    feats: jax.Array
    valid: jax.Array
    dims: tuple[int, ...] = field(metadata={"static": True})

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_features(self) -> int:
        return self.feats.shape[-1]

    def replace_feats(self, feats: jax.Array) -> "SparseTensor":
        return SparseTensor(self.coords, self.keys, feats, self.valid, self.dims)

    def masked_feats(self) -> jax.Array:
        return jnp.where(self.valid[:, None], self.feats, 0.0)

    def sites(self) -> "SparseTensor":
        """The site set alone (features dropped) — spconv 'indice_key' analog."""
        return SparseTensor(
            self.coords,
            self.keys,
            jnp.zeros((self.capacity, 0), self.feats.dtype),
            self.valid,
            self.dims,
        )
