"""Differential operators as composed JAX transforms.

TPU-native redesign of the reference autograd operators (reference:
base/diff_ops.py:6-82, which loop `torch.autograd.grad` calls over output dims).
Here every operator takes a *function* mapping a single point (d,) -> (m,) and a
batch of points (N, d); the per-output loops vectorize away into `jacfwd`
compositions, vmapped over the batch. Input dims are tiny (1-3), so
forward-mode (jacfwd) is the right default, and laplace/hessian use
forward-over-reverse / forward-over-forward which XLA fuses into one program.

All operators return f32 (the nested derivatives of sin(30x) need full
precision; see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Fn = Callable[[jax.Array], jax.Array]  # (d,) -> (m,)


def gradient(fn: Fn, x: jax.Array) -> jax.Array:
    """VJP of `fn` at `x` with all-ones cotangent: sum_i grad f_i.

    For scalar-output fields (the only use in the reference models) this is the
    true spatial gradient. Shape: like `x` (N, d).
    Reference semantics: base/diff_ops.py:53-58.
    """
    def pull(xi):
        y, vjp = jax.vjp(fn, xi)
        (g,) = vjp(jnp.ones_like(y))
        return g
    return jax.vmap(pull)(x)


def jacobian(fn: Fn, x: jax.Array) -> jax.Array:
    """Batched Jacobian, shape (N, m, d). Reference: base/diff_ops.py:61-82."""
    return jax.vmap(jax.jacfwd(fn))(x)


def divergence(fn: Fn, x: jax.Array) -> jax.Array:
    """Sum_i d f_i / d x_i, shape (N, 1). Requires m == d.

    Reference: base/diff_ops.py:44-50.
    """
    def div(xi):
        jac = jax.jacfwd(fn)(xi)
        return jnp.trace(jac)[None]
    return jax.vmap(div)(x)


def laplace(fn: Fn, x: jax.Array, normalize: bool = False,
            eps: float = 0.0, return_grad: bool = False):
    """div(grad f) of a scalar field, shape (N, 1).

    With normalize=True, the gradient is normalized before taking the
    divergence (reference: base/diff_ops.py:33-41).
    """
    def grad_fn(xi):
        y, vjp = jax.vjp(fn, xi)
        (g,) = vjp(jnp.ones_like(y))
        if normalize:
            g = g / (jnp.linalg.norm(g) + eps)
        return g

    def lap(xi):
        jac = jax.jacfwd(grad_fn)(xi)  # forward-over-reverse Hessian
        return jnp.trace(jac)[None]

    out = jax.vmap(lap)(x)
    if return_grad:
        return out, jax.vmap(grad_fn)(x)
    return out


def hessian(fn: Fn, x: jax.Array) -> jax.Array:
    """Batched Hessian of each output channel, shape (N, m, d, d).

    Reference: base/diff_ops.py:6-30 (without the meta-batch axis; vmap again
    for that).
    """
    return jax.vmap(jax.jacfwd(jax.jacfwd(fn)))(x)


def has_nan(tree) -> jax.Array:
    """Debug check mirroring the reference's NaN status flags
    (base/diff_ops.py:27-29, 78-80). Returns a scalar bool."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.any(jnp.stack([jnp.any(jnp.isnan(l)) for l in leaves]))
