import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.ops import (sample_boundary, sample_boundary2D_separate,
                              sample_random, sample_uniform)


def test_sample_uniform_1d_cell_centers():
    g = sample_uniform(4, 1)
    # cell centers of [-1,1] split into 4: -0.75, -0.25, 0.25, 0.75
    np.testing.assert_allclose(g[:, 0], [-0.75, -0.25, 0.25, 0.75], atol=1e-6)


def test_sample_uniform_2d_shape_and_flatten():
    g = sample_uniform(8, 2)
    assert g.shape == (64, 2)
    g2 = sample_uniform(8, 2, flatten=False)
    assert g2.shape == (8, 8, 2)
    assert jnp.all(g2 >= -1) and jnp.all(g2 <= 1)


def test_sample_random_range_and_determinism():
    key = jax.random.PRNGKey(0)
    x = sample_random(key, 10000, 3)
    assert x.shape == (10000, 3)
    assert jnp.all(x >= -1) and jnp.all(x <= 1)
    # uniform moments
    assert abs(float(x.mean())) < 0.02
    np.testing.assert_array_equal(x, sample_random(key, 10000, 3))


def test_sample_boundary_1d():
    x = sample_boundary(jax.random.PRNGKey(1), 100, 1, epsilon=1e-3)
    assert x.shape == (100, 1)
    near = jnp.minimum(jnp.abs(x - 1.0), jnp.abs(x + 1.0))
    assert jnp.all(near <= 1e-3 + 1e-7)


def test_sample_boundary_2d():
    x = sample_boundary(jax.random.PRNGKey(2), 400, 2, epsilon=1e-3)
    assert x.shape == (400, 2)
    dist_to_bnd = jnp.minimum(jnp.min(jnp.abs(x - 1.0), axis=1),
                              jnp.min(jnp.abs(x + 1.0), axis=1))
    assert jnp.all(dist_to_bnd <= 1e-3 + 1e-7)


@pytest.mark.parametrize("side,axis", [("horizontal", 0), ("vertical", 1)])
def test_sample_boundary2d_separate(side, axis):
    # reference quirk: 'horizontal' = x=±1 strips (base/sampling.py:47-49)
    x = sample_boundary2D_separate(jax.random.PRNGKey(3), 200, side,
                                   epsilon=1e-3)
    assert x.shape == (200, 2)
    assert jnp.all(jnp.abs(jnp.abs(x[:, axis]) - 1.0) <= 1e-3 + 1e-7)
    other = 1 - axis
    assert jnp.all(jnp.abs(x[:, other]) <= 1.0)
