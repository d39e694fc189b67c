"""Forward-Laplacian propagation for SIREN MLPs.

Computes value, spatial Jacobian and Laplacian of the network in ONE batched
forward chain (the "forward Laplacian" scheme): per layer, carry
(h, J = dh/dx, L = lap h) and push them through

    linear:  z = h W + b      ->  Jz = J W,          Lz = L W
    sin:     s = sin(w z)     ->  Js = w cos(w z) Jz,
                                  Ls = w cos(w z) Lz - w^2 sin(w z) sum_d Jz_d^2

Everything is (N, F)/(N, d, F) batched matmuls and VPU elementwise ops — no
per-point vmap, no nested forward-over-reverse autodiff. This replaces the
hot path of the fluid pressure solve (reference fluid/model.py:103-125 runs
nested torch autograd there — SURVEY.md §3.1 "hottest region"); the same
chain also yields divergence/gradient for the other phases. Differentiating
THROUGH these outputs w.r.t. params (for the training loss) is ordinary
first-order reverse mode over matmuls/sines.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .precision import precision_of

OMEGA_0 = 30.0

Params = List[Tuple[jax.Array, jax.Array]]


def value_grad_laplacian(params: Params, coords: jax.Array,
                         omega: float = OMEGA_0, precision=None):
    """(u (N, m), J (N, d, m), L (N, m)) of a sine-MLP at (N, d) coords.

    `precision` is the per-model matmul precision name (None -> process
    default; see ops/precision.precision_of)."""
    prec = precision_of(precision)
    n, d = coords.shape
    h = coords
    J = jnp.broadcast_to(jnp.eye(d, dtype=coords.dtype)[None], (n, d, d))
    L = jnp.zeros((n, d), coords.dtype)
    n_layers = len(params)
    for i, (w, b) in enumerate(params):
        z = jnp.dot(h, w, precision=prec) + b
        Jz = jnp.einsum("ndf,fg->ndg", J, w,
                        precision=prec)
        Lz = jnp.dot(L, w, precision=prec)
        if i < n_layers - 1:
            c = jnp.cos(omega * z)
            s = jnp.sin(omega * z)
            h = s
            J = omega * c[:, None, :] * Jz
            L = (omega * c * Lz
                 - (omega ** 2) * s * jnp.sum(Jz ** 2, axis=1))
        else:
            h, J, L = z, Jz, Lz
    return h, J, L


def value_grad(params: Params, coords: jax.Array, omega: float = OMEGA_0,
               precision=None):
    """(u (N, m), J (N, d, m)) — the first-order half of the chain."""
    prec = precision_of(precision)
    n, d = coords.shape
    h = coords
    J = jnp.broadcast_to(jnp.eye(d, dtype=coords.dtype)[None], (n, d, d))
    n_layers = len(params)
    for i, (w, b) in enumerate(params):
        z = jnp.dot(h, w, precision=prec) + b
        Jz = jnp.einsum("ndf,fg->ndg", J, w,
                        precision=prec)
        if i < n_layers - 1:
            c = jnp.cos(omega * z)
            h = jnp.sin(omega * z)
            J = omega * c[:, None, :] * Jz
        else:
            h, J = z, Jz
    return h, J
