"""Forward-Laplacian chain vs the autodiff diff-ops."""

import jax
import jax.numpy as jnp
import numpy as np

from insr_pde_tpu.models.networks import MLP
from insr_pde_tpu.ops.diff import divergence, gradient, jacobian, laplace
from insr_pde_tpu.ops.forward_laplacian import value_grad, value_grad_laplacian


def test_matches_autodiff_ops():
    net = MLP(2, 1, num_hidden_layers=3, hidden_features=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=-1,
                           maxval=1)
    u, J, L = value_grad_laplacian(params, x)
    np.testing.assert_allclose(np.asarray(u), np.asarray(net.apply(params, x)),
                               atol=1e-5)
    p_fn = net.point_fn(params)
    np.testing.assert_allclose(np.asarray(J[:, :, 0]),
                               np.asarray(gradient(p_fn, x)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(L[:, 0]),
                               np.asarray(laplace(p_fn, x)[:, 0]),
                               rtol=2e-3, atol=0.5)


def test_vector_field_divergence():
    net = MLP(2, 2, num_hidden_layers=2, hidden_features=24)
    params = net.init(jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(3), (32, 2), minval=-1,
                           maxval=1)
    u, J = value_grad(params, x)
    div = J[:, 0, 0] + J[:, 1, 1]
    div_ref = divergence(net.point_fn(params), x)[:, 0]
    np.testing.assert_allclose(np.asarray(div), np.asarray(div_ref),
                               atol=1e-3)
    jac_ref = jacobian(net.point_fn(params), x)  # (N, m, d)
    np.testing.assert_allclose(np.asarray(J),
                               np.asarray(jnp.swapaxes(jac_ref, 1, 2)),
                               atol=1e-3)


def test_gradients_through_laplacian():
    """Training uses d(lap)/d(params): reverse mode through the chain must
    match reverse mode through the nested-autodiff laplace."""
    net = MLP(2, 1, num_hidden_layers=2, hidden_features=16)
    params = net.init(jax.random.PRNGKey(4))
    x = jax.random.uniform(jax.random.PRNGKey(5), (16, 2), minval=-1,
                           maxval=1)

    def loss_fwd(p):
        return jnp.mean(value_grad_laplacian(p, x)[2] ** 2)

    def loss_ad(p):
        return jnp.mean(laplace(net.point_fn(p), x) ** 2)

    g1 = jax.grad(loss_fwd)(params)
    g2 = jax.grad(loss_ad)(params)
    for (w1, b1), (w2, b2) in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   rtol=2e-3, atol=1e-2)
