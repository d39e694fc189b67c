"""Diff-op unit tests against analytic derivatives of known fields
(the test strategy the reference lacks; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from insr_pde_tpu.ops import divergence, gradient, hessian, jacobian, laplace

KEY = jax.random.PRNGKey(0)


def scalar_field(x):
    # f(x, y) = sin(x) * y^2 + x
    return (jnp.sin(x[0]) * x[1] ** 2 + x[0])[None]


def vector_field(x):
    # F = [x^2 y, x + y^3]
    return jnp.stack([x[0] ** 2 * x[1], x[0] + x[1] ** 3])


def test_gradient_scalar():
    x = jax.random.uniform(KEY, (64, 2), minval=-1, maxval=1)
    g = gradient(scalar_field, x)
    expected = jnp.stack([jnp.cos(x[:, 0]) * x[:, 1] ** 2 + 1,
                          2 * jnp.sin(x[:, 0]) * x[:, 1]], axis=-1)
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-6)


def test_gradient_vector_is_vjp_with_ones():
    # reference semantics (base/diff_ops.py:53-58): sum of jacobian rows
    x = jax.random.uniform(KEY, (32, 2), minval=-1, maxval=1)
    g = gradient(vector_field, x)
    jac = jacobian(vector_field, x)
    np.testing.assert_allclose(g, jac.sum(axis=1), rtol=1e-5, atol=1e-6)


def test_jacobian():
    x = jax.random.uniform(KEY, (16, 2), minval=-1, maxval=1)
    jac = jacobian(vector_field, x)
    assert jac.shape == (16, 2, 2)
    expected = jnp.stack([
        jnp.stack([2 * x[:, 0] * x[:, 1], x[:, 0] ** 2], axis=-1),
        jnp.stack([jnp.ones_like(x[:, 0]), 3 * x[:, 1] ** 2], axis=-1),
    ], axis=1)
    np.testing.assert_allclose(jac, expected, rtol=1e-5, atol=1e-6)


def test_divergence():
    x = jax.random.uniform(KEY, (16, 2), minval=-1, maxval=1)
    div = divergence(vector_field, x)
    expected = (2 * x[:, 0] * x[:, 1] + 3 * x[:, 1] ** 2)[:, None]
    np.testing.assert_allclose(div, expected, rtol=1e-5, atol=1e-6)


def test_laplace():
    x = jax.random.uniform(KEY, (16, 2), minval=-1, maxval=1)
    lap = laplace(scalar_field, x)
    expected = (-jnp.sin(x[:, 0]) * x[:, 1] ** 2
                + 2 * jnp.sin(x[:, 0]))[:, None]
    np.testing.assert_allclose(lap, expected, rtol=1e-5, atol=1e-6)


def test_laplace_return_grad():
    x = jax.random.uniform(KEY, (8, 2), minval=-1, maxval=1)
    lap, g = laplace(scalar_field, x, return_grad=True)
    np.testing.assert_allclose(g, gradient(scalar_field, x), rtol=1e-6)


def test_hessian():
    x = jax.random.uniform(KEY, (8, 2), minval=-1, maxval=1)
    h = hessian(scalar_field, x)
    assert h.shape == (8, 1, 2, 2)
    h00 = -jnp.sin(x[:, 0]) * x[:, 1] ** 2
    h01 = 2 * jnp.cos(x[:, 0]) * x[:, 1]
    h11 = 2 * jnp.sin(x[:, 0])
    np.testing.assert_allclose(h[:, 0, 0, 0], h00, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h[:, 0, 0, 1], h01, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h[:, 0, 1, 0], h01, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h[:, 0, 1, 1], h11, rtol=1e-5, atol=1e-6)


def test_ops_jittable():
    x = jax.random.uniform(KEY, (8, 2), minval=-1, maxval=1)
    lap = jax.jit(lambda xs: laplace(scalar_field, xs))(x)
    assert lap.shape == (8, 1)
