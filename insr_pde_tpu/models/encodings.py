"""Coordinate encodings: NeRF frequency features + instant-NGP multires hash grid.

TPU-native redesign of reference vortex/hash_encoding.py (present in the
reference but never wired into a model — SURVEY.md §2.10; kept here as a
first-class optional encoder). Pure functions over param pytrees:

  * `Frequency` — [sin(2^l x), cos(2^l x)] bands (reference :36-63);
  * `MultiResHashGrid` — per-level hashed feature tables + multilinear
    interpolation (reference :77-184). The corner enumeration and the
    tiny-cuda-nn prime XOR hash (reference fast_hash, :66-75) are expressed
    as vectorized uint32 ops over a (2^dim,) corner axis — gathers + VPU
    integer ops, jit/vmap/grad-friendly (gradients flow to the tables).

Level growth factor uses the instant-NGP paper's eq. (3) with
(n_levels - 1) in the denominator; the reference divides by
`base_resolution - 1` instead (hash_encoding.py:166), which deviates from
the paper for any n_levels != base_resolution.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# tiny-cuda-nn grid hash primes
PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
          2165219737)


@dataclass(frozen=True)
class Frequency:
    """NeRF positional encoding; output dim = dim * n_levels * 2."""
    dim: int
    n_levels: int = 10

    @property
    def output_dim(self) -> int:
        return self.dim * self.n_levels * 2

    def apply(self, x: jax.Array) -> jax.Array:
        freqs = 2.0 ** jnp.arange(self.n_levels, dtype=x.dtype)
        xb = x[..., None] * freqs                    # (..., dim, L)
        out = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
        return out.reshape(*x.shape[:-1], self.output_dim)


def _fast_hash(inds: jax.Array, dim: int, hashmap_size: int) -> jax.Array:
    """tiny-cuda-nn XOR-prime hash on integer corner coords (..., dim)."""
    primes = jnp.asarray(PRIMES[:dim], jnp.uint32)
    h = (inds.astype(jnp.uint32) * primes)
    acc = h[..., 0]
    for i in range(1, dim):
        acc = acc ^ h[..., i]
    return (acc % jnp.uint32(hashmap_size)).astype(jnp.int32)


@dataclass(frozen=True)
class MultiResHashGrid:
    """Instant-NGP multi-resolution hash encoding.

    params = list of (hashmap_size, n_features) tables; init U[-1e-4, 1e-4]
    as the reference (_HashGrid, hash_encoding.py:98).
    Input coords are expected in [0, 1]^dim.
    """
    dim: int
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 15
    base_resolution: int = 16
    finest_resolution: int = 512

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def level_specs(self) -> List[Tuple[int, int]]:
        """[(resolution, hashmap_size)] per level, paper eq. (2)-(3)."""
        if self.n_levels > 1:
            b = math.exp((math.log(self.finest_resolution)
                          - math.log(self.base_resolution))
                         / (self.n_levels - 1))
        else:
            b = 1.0
        specs = []
        for lv in range(self.n_levels):
            res = int(math.floor(self.base_resolution * (b ** lv)))
            size = min(res ** self.dim, 2 ** self.log2_hashmap_size)
            specs.append((res, size))
        return specs

    def init(self, key: jax.Array, dtype=jnp.float32) -> List[jax.Array]:
        tables = []
        for res, size in self.level_specs:
            key, sub = jax.random.split(key)
            tables.append(jax.random.uniform(
                sub, (size, self.n_features_per_level), dtype, -1e-4, 1e-4))
        return tables

    def apply(self, tables: List[jax.Array], x: jax.Array) -> jax.Array:
        """(..., dim) in [0,1] -> (..., n_levels * n_features_per_level)."""
        # corner offsets (2^dim, dim) in {0, 1}
        n_corners = 1 << self.dim
        corners = ((np.arange(n_corners)[:, None]
                    >> np.arange(self.dim)[None, :]) & 1)
        corners = jnp.asarray(corners, jnp.int32)

        outs = []
        for (res, size), table in zip(self.level_specs, tables):
            xs = x * res
            xi = jnp.floor(xs).astype(jnp.int32)
            xf = xs - jax.lax.stop_gradient(jnp.floor(xs))
            inds = xi[..., None, :] + corners                 # (..., C, dim)
            # weight: prod over dims of (1-xf) for corner bit 0, xf for 1
            w = jnp.where(corners == 0, 1.0 - xf[..., None, :],
                          xf[..., None, :]).prod(axis=-1)     # (..., C)
            hid = _fast_hash(inds, self.dim, size)            # (..., C)
            feats = table[hid]                                # (..., C, F)
            outs.append(jnp.sum(feats * w[..., None], axis=-2))
        return jnp.concatenate(outs, axis=-1)
