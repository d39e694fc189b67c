"""Frequency + multires hash grid encoding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from insr_pde_tpu.models.encodings import Frequency, MultiResHashGrid


def test_frequency_shapes_and_values():
    enc = Frequency(dim=2, n_levels=4)
    x = jnp.asarray([[0.5, -0.25]])
    out = enc.apply(x)
    assert out.shape == (1, enc.output_dim) == (1, 16)
    # first dim's bands: sin/cos of 0.5 * [1,2,4,8]
    np.testing.assert_allclose(np.asarray(out[0, :4]),
                               np.sin(0.5 * np.asarray([1, 2, 4, 8.0])),
                               atol=1e-6)


def test_hashgrid_shapes_and_range():
    enc = MultiResHashGrid(dim=2, n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=8, base_resolution=4,
                           finest_resolution=32)
    tables = enc.init(jax.random.PRNGKey(0))
    assert len(tables) == 4
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 2))
    out = enc.apply(tables, x)
    assert out.shape == (17, 8)
    # init range 1e-4, interp is convex -> outputs bounded by it
    assert float(jnp.max(jnp.abs(out))) <= 1e-4 + 1e-8


def test_hashgrid_interpolation_is_continuous():
    """Multilinear interp: value at a table lattice point equals gathered
    entry; halfway between, it is between neighbors."""
    enc = MultiResHashGrid(dim=1, n_levels=1, n_features_per_level=1,
                           log2_hashmap_size=10, base_resolution=8,
                           finest_resolution=8)
    tables = enc.init(jax.random.PRNGKey(2))
    x = jnp.linspace(0.0, 0.9, 200)[:, None]
    out = enc.apply(tables, x)[:, 0]
    diffs = jnp.abs(jnp.diff(out))
    assert float(jnp.max(diffs)) < 2e-5  # no jumps at cell boundaries


def test_hashgrid_gradients_flow_to_tables():
    enc = MultiResHashGrid(dim=2, n_levels=2, n_features_per_level=2,
                           log2_hashmap_size=6, base_resolution=4,
                           finest_resolution=8)
    tables = enc.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (9, 2))

    def loss(tables):
        return jnp.sum(enc.apply(tables, x) ** 2)

    g = jax.grad(loss)(tables)
    assert any(float(jnp.max(jnp.abs(t))) > 0 for t in g)


def test_hashgrid_jit_and_vmap():
    enc = MultiResHashGrid(dim=3, n_levels=2, n_features_per_level=2,
                           log2_hashmap_size=6, base_resolution=4,
                           finest_resolution=8)
    tables = enc.init(jax.random.PRNGKey(5))
    x = jax.random.uniform(jax.random.PRNGKey(6), (5, 3))
    out1 = jax.jit(enc.apply)(tables, x)
    out2 = jax.vmap(lambda xi: enc.apply(tables, xi))(x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
