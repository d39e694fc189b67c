"""Collocation-point samplers.

TPU-native redesign of the reference sampler set (reference: base/sampling.py:4-64).
All random samplers are pure functions of an explicit `jax.random` key so they can
live inside jitted training loops (one fresh key per Adam iteration) and be
device-sharded by folding the mesh axis index into the key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sample_uniform(resolution: int, sdim: int = 1, flatten: bool = True,
                   dtype=jnp.float32) -> jax.Array:
    """Cell-centered uniform grid in [-1, 1]^sdim.

    Matches reference base/sampling.py:4-11: linspace of cell centers then meshgrid.
    Returns (resolution**sdim, sdim) if flatten else (resolution,)*sdim + (sdim,).
    """
    coords = (jnp.linspace(0.5, resolution - 0.5, resolution, dtype=dtype)
              / resolution * 2.0 - 1.0)
    grid = jnp.stack(jnp.meshgrid(*([coords] * sdim), indexing="ij"), axis=-1)
    if flatten:
        grid = grid.reshape(resolution ** sdim, sdim)
    return grid


@partial(jax.jit, static_argnums=(1, 2))
def sample_random(key: jax.Array, n: int, sdim: int = 1,
                  dtype=jnp.float32) -> jax.Array:
    """Uniform random points in [-1, 1]^sdim, shape (n, sdim).

    Reference: base/sampling.py:14-18.
    """
    return jax.random.uniform(key, (n, sdim), dtype=dtype, minval=-1.0, maxval=1.0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def sample_boundary(key: jax.Array, n: int, sdim: int,
                    epsilon: float = 1e-4, dtype=jnp.float32) -> jax.Array:
    """Random points inside epsilon-shells of the boundary of [-1, 1]^sdim.

    1D: n//2 points near each end; 2D: n//4 per strip (bottom/top/left/right).
    Reference: base/sampling.py:21-42.
    """
    if sdim == 1:
        k1, k2 = jax.random.split(key)
        left = jax.random.uniform(k1, (n // 2, 1), dtype, -1.0, 1.0) * epsilon - 1.0
        right = jax.random.uniform(k2, (n // 2, 1), dtype, -1.0, 1.0) * epsilon + 1.0
        return jnp.concatenate([left, right], axis=0)
    elif sdim == 2:
        # Strip layout identical to the reference: y=-1, y=+1, x=-1, x=+1.
        ranges = jnp.asarray([
            [[-1.0, 1.0], [-1.0 - epsilon, -1.0 + epsilon]],
            [[-1.0, 1.0], [1.0 - epsilon, 1.0 + epsilon]],
            [[-1.0 - epsilon, -1.0 + epsilon], [-1.0, 1.0]],
            [[1.0 - epsilon, 1.0 + epsilon], [-1.0, 1.0]],
        ], dtype=dtype)  # (4, sdim, 2) lo/hi
        m = n // 4
        u = jax.random.uniform(key, (4, m, 2), dtype)
        lo, hi = ranges[..., 0], ranges[..., 1]  # (4, 2)
        pts = lo[:, None, :] + u * (hi - lo)[:, None, :]
        return pts.reshape(4 * m, 2)
    else:
        raise NotImplementedError(f"sample_boundary: sdim={sdim}")


@partial(jax.jit, static_argnums=(1, 2, 3))
def sample_boundary2D_separate(key: jax.Array, n: int, side: str,
                               epsilon: float = 1e-4, dtype=jnp.float32) -> jax.Array:
    """2D boundary strips selected by side, n//2 points per strip.

    Naming follows the reference quirk (base/sampling.py:45-64): 'horizontal'
    means the x = ±1 strips (used for the x-velocity BC), 'vertical' the y = ±1
    strips.
    """
    if side == "horizontal":
        ranges = jnp.asarray([
            [[-1.0 - epsilon, -1.0 + epsilon], [-1.0, 1.0]],
            [[1.0 - epsilon, 1.0 + epsilon], [-1.0, 1.0]],
        ], dtype=dtype)
    elif side == "vertical":
        ranges = jnp.asarray([
            [[-1.0, 1.0], [-1.0 - epsilon, -1.0 + epsilon]],
            [[-1.0, 1.0], [1.0 - epsilon, 1.0 + epsilon]],
        ], dtype=dtype)
    else:
        raise RuntimeError(f"sample_boundary2D_separate: side={side}")
    m = n // 2
    u = jax.random.uniform(key, (2, m, 2), dtype)
    lo, hi = ranges[..., 0], ranges[..., 1]
    pts = lo[:, None, :] + u * (hi - lo)[:, None, :]
    return pts.reshape(2 * m, 2)
