"""Contact / constraint energy library for elasticity.

TPU-native redesign of the reference loss library (reference:
elasticity/losses.py:6-63). The reference gathers colliding points by boolean
mask indexing (data-dependent shapes, losses.py:13-18); since every term is a
sum over colliding points, the masks become `jnp.where` weights on dense
arrays — identical values, static shapes, jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_constraint_loss(q_fixed, q_fixed_target, ratio_constraint):
    """sum ||q_fixed - target||^2 * ratio (reference losses.py:6-8)."""
    return ratio_constraint * jnp.sum((q_fixed - q_fixed_target) ** 2)


def collision_plane_loss(q, qdot, dt, ratio_collide, plane_height):
    """Penalty work for points below a z (last-coord) plane: force
    proportional to penetration depth along the last axis, energy
    -dt * sum(qdot . f) over penetrating points (reference losses.py:10-20)."""
    depth = plane_height - q[..., -1]
    inside = depth > 0.0
    force_last = jnp.where(inside, ratio_collide * depth, 0.0)
    return -dt * jnp.sum(qdot[..., -1] * force_last)


def collision_sphere_loss(q, qdot, dt, ratio_collide, center, radius):
    """Penalty work for points inside a sphere: radial force proportional to
    center distance (reference losses.py:22-39)."""
    vec = q - center
    dist = jnp.sqrt(jnp.sum(vec ** 2, axis=-1))
    direction = vec / jnp.maximum(dist, 1e-12)[..., None]
    inside = dist < radius
    force = jnp.where(inside[..., None],
                      ratio_collide * dist[..., None] * direction, 0.0)
    return -dt * jnp.sum(qdot * force)


def collision_bowl_loss(q, qdot, dt, ratio_collide, center, radius):
    """Penalty work for points outside a bowl (bottom half-sphere): inward
    force for points past the shell below the center (reference
    losses.py:41-59)."""
    vec = center - q
    dist = jnp.sqrt(jnp.sum(vec ** 2, axis=-1))
    direction = vec / jnp.maximum(dist, 1e-12)[..., None]
    outside = (dist > radius) & (q[..., 2] < center[2])
    force = jnp.where(outside[..., None],
                      ratio_collide * dist[..., None] * direction, 0.0)
    return -dt * jnp.sum(qdot * force)


def collision_bar_loss(q, qdot, dt, ratio_collide, bar_height, bar_width,
                       bar_num):
    """Stub returning 0, as the reference (losses.py:61-63)."""
    return jnp.asarray(0.0, q.dtype)
