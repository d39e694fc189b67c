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


def _sv_3x3(F: jax.Array) -> jax.Array:
    """Closed-form singular values of (..., 3, 3): Cardano eigenvalues of
    C = F^T F (symmetric 3x3), descending. Values are exact and stable
    including full degeneracy (C = q I); derivatives are supplied by the
    custom JVPs of the wrapping ops, never by differentiating this."""
    C = jnp.einsum("...ji,...jk->...ik", F, F)
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    A = C - q[..., None, None] * jnp.eye(3, dtype=F.dtype)
    p2 = jnp.sum(A ** 2, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = A / p[..., None, None]
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    eigs = jnp.stack([e1, e2, e3], axis=-1)
    degenerate = (p2 < 1e-24)[..., None]
    eigs = jnp.where(degenerate, q[..., None], eigs)
    return jnp.sqrt(jnp.maximum(eigs, 0.0))


@jax.custom_jvp
def singular_values(F: jax.Array) -> jax.Array:
    """Singular values of (..., d, d), descending, shape (..., d)."""
    if F.shape[-1] == 2:
        return _sv_2x2(F)
    if F.shape[-1] == 3:
        return _sv_3x3(F)
    return jnp.linalg.svd(F, compute_uv=False)


@singular_values.defjvp
def _singular_values_jvp(primals, tangents):
    (F,), (dF,) = primals, tangents
    U, s, Vt = jnp.linalg.svd(F, full_matrices=False)
    ds = jnp.einsum("...ai,...ab,...ib->...i", U, dF, Vt)
    return s, ds


# ---- SVD-free elasticity energies -----------------------------------------
# XLA's batched small-matrix SVD dominates the elasticity iteration on TPU
# (measured: ~85% of a 3D step). The two energies the models actually use
# have closed forms that never factorize:
#   sum_i (sigma_i - 1)^2 = |F|_F^2 - 2 nuclear(F) + d,
#       with d nuclear(F)/dF = R, the polar factor (Newton iteration,
#       quadratic convergence, exact and stable at the rest state F = I);
#   (prod_i sigma_i - 1)^2 = (|det F| - 1)^2.


def _inv_transpose(X: jax.Array) -> jax.Array:
    """Closed-form inverse-transpose of (..., d, d) for d in {2, 3} via the
    adjugate — elementwise ops only (no LU), which keeps the composite
    training programs small."""
    d = X.shape[-1]
    det = jnp.linalg.det(X)[..., None, None]
    if d == 2:
        a, b = X[..., 0, 0], X[..., 0, 1]
        c, e = X[..., 1, 0], X[..., 1, 1]
        adj_t = jnp.stack([jnp.stack([e, -c], -1),
                           jnp.stack([-b, a], -1)], -2)
    elif d == 3:
        c0 = jnp.cross(X[..., 1, :], X[..., 2, :])
        c1 = jnp.cross(X[..., 2, :], X[..., 0, :])
        c2 = jnp.cross(X[..., 0, :], X[..., 1, :])
        adj_t = jnp.stack([c0, c1, c2], axis=-2)  # rows = cofactor rows
    else:
        return jnp.swapaxes(jnp.linalg.inv(X), -2, -1)
    return adj_t / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)


def polar_rotation(F: jax.Array, n_iters: int = 6) -> jax.Array:
    """Polar factor R = U V^T of (..., d, d) via Higham's Newton iteration
    X <- (X + X^-T) / 2 (F is pre-normalized; quadratic convergence — 6
    steps reach f32 accuracy for well-conditioned F).

    Near-singular F (collapsed/inverted elements under hard contact — seen
    in the bunny plane-collision scene at full scale) makes X^-T blow past
    f32 range and the iterate goes non-finite, which would poison the ARAP
    gradient and then the whole parameter vector. Such matrices have no
    well-separated polar factor anyway; freeze them at their (normalized)
    input so dE/dF = 2(F - R) stays bounded and the OTHER samples' descent
    direction survives."""
    norm = jnp.sqrt(jnp.sum(F ** 2, axis=(-2, -1), keepdims=True))
    X = F / jnp.maximum(norm, 1e-12)
    for _ in range(n_iters):
        Xn = 0.5 * (X + _inv_transpose(X))
        ok = jnp.all(jnp.isfinite(Xn) & (jnp.abs(Xn) < 1e6),
                     axis=(-2, -1), keepdims=True)
        X = jnp.where(ok, Xn, X)
    return X


@jax.custom_jvp
def nuclear_norm(F: jax.Array) -> jax.Array:
    """sum_i sigma_i of (..., d, d), shape (...)."""
    return jnp.sum(singular_values(F), axis=-1)


@nuclear_norm.defjvp
def _nuclear_jvp(primals, tangents):
    (F,), (dF,) = primals, tangents
    # d nuclear / dF = U V^T = polar factor (no SVD: Newton iteration)
    R = polar_rotation(F)
    return (jnp.sum(singular_values(F), axis=-1),
            jnp.sum(R * dF, axis=(-2, -1)))


def arap_energy(F: jax.Array) -> jax.Array:
    """sum_i (sigma_i - 1)^2 summed over the batch — SVD only in the cheap
    scalar primal (closed-form for 2x2; for 3x3 the factorization-free
    gradient is what matters: dE/dF = 2 (F - R))."""
    d = F.shape[-1]
    fro2 = jnp.sum(F ** 2, axis=(-2, -1))
    return jnp.sum(fro2 - 2.0 * nuclear_norm(F) + d)


def volume_energy(F: jax.Array) -> jax.Array:
    """sum over batch of (prod_i sigma_i - 1)^2 = (|det F| - 1)^2."""
    det = jnp.linalg.det(F)
    return jnp.sum((jnp.abs(det) - 1.0) ** 2)
