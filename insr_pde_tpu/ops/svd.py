"""Singular values of batched small matrices, safe under autodiff.

The reference differentiates `torch.svd` of the (N, d, d) deformation
gradients (reference: elasticity/model.py:144) but only ever uses the
singular values (ARAP/volume energies at :146-147). A full SVD pullback has
1/(sigma_i^2 - sigma_j^2) terms that NaN at repeated singular values — and the
rest state F = I (all sigma = 1, the *initial condition* of every elasticity
run) is exactly that degenerate point. Here `singular_values` exposes only
sigma with a custom JVP  d sigma_i = u_i^T dF v_i,  which is finite at
degeneracies and linear in dF (so reverse mode transposes automatically).

For 2x2 matrices a closed form (no iterative factorization on the MXU's
critical path) is used; d >= 3 falls back to jnp.linalg.svd for the primal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sv_2x2(F: jax.Array) -> jax.Array:
    """Closed-form singular values of (..., 2, 2), descending."""
    a, b = F[..., 0, 0], F[..., 0, 1]
    c, d = F[..., 1, 0], F[..., 1, 1]
    q = jnp.hypot(a + d, b - c) * 0.5
    r = jnp.hypot(a - d, b + c) * 0.5
    return jnp.stack([q + r, jnp.abs(q - r)], axis=-1)


@jax.custom_jvp
def singular_values(F: jax.Array) -> jax.Array:
    """Singular values of (..., d, d), descending, shape (..., d)."""
    if F.shape[-1] == 2:
        return _sv_2x2(F)
    return jnp.linalg.svd(F, compute_uv=False)


@singular_values.defjvp
def _singular_values_jvp(primals, tangents):
    (F,), (dF,) = primals, tangents
    U, s, Vt = jnp.linalg.svd(F, full_matrices=False)
    ds = jnp.einsum("...ai,...ab,...ib->...i", U, dF, Vt)
    return s, ds
