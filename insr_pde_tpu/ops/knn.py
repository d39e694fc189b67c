"""K-nearest-neighbor search as one MXU matmul + top_k.

TPU-native equivalent of the reference's pytorch3d `knn_points`/`knn_gather`
C++/CUDA kernels (reference: base/networks.py:303,329). At the scales the
RBF solver uses (<= 10^4 basis sites), a brute-force squared-distance matrix
via `|q|^2 - 2 q.p + |p|^2` feeds the MXU directly and `lax.top_k` runs on
the VPU — no custom kernel needed (SURVEY.md §2.13 item 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def knn(query: jax.Array, points: jax.Array, k: int):
    """K nearest `points` for each `query` row.

    Args:
      query: (Q, d); points: (P, d); k: neighbors.
    Returns:
      (dists (Q, k) squared distances ascending, idx (Q, k) int32).
    """
    q2 = jnp.sum(query ** 2, axis=-1, keepdims=True)          # (Q, 1)
    p2 = jnp.sum(points ** 2, axis=-1)[None, :]               # (1, P)
    d2 = q2 + p2 - 2.0 * jnp.dot(query, points.T,
                                 precision=jax.lax.Precision.HIGHEST)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return jnp.maximum(-neg_d, 0.0), idx


def knn_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (Q, k, ...) rows of `points` by knn indices (pytorch3d
    knn_gather equivalent)."""
    return points[idx]
