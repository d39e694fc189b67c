import jax
import jax.numpy as jnp
import math
import numpy as np
import pytest

from insr_pde_tpu.models.networks import MLP, OMEGA_0, get_network


class Cfg:
    network = "siren"
    num_hidden_layers = 2
    hidden_features = 32
    nonlinearity = "sine"


def test_factory_and_shapes():
    net = get_network(Cfg(), 2, 3)
    params = net.init(jax.random.PRNGKey(0))
    # 1 input + 2 hidden + 1 output layers
    assert len(params) == 4
    x = jnp.zeros((5, 2))
    y = net.apply(params, x)
    assert y.shape == (5, 3)


def test_grid_network_is_hashgrid_and_unknown_raises():
    """The reference's 'grid' choice raises NotImplementedError
    (base/networks.py:12-17); here it maps to the real hash-grid field."""
    from insr_pde_tpu.models.networks import HashGridField
    cfg = Cfg()
    cfg.network = "grid"
    assert isinstance(get_network(cfg, 2, 3), HashGridField)
    cfg.network = "nope"
    with pytest.raises(NotImplementedError):
        get_network(cfg, 2, 3)


def test_siren_init_distributions():
    """Init parity with reference base/networks.py:80-93."""
    net = MLP(3, 1, num_hidden_layers=1, hidden_features=256)
    params = net.init(jax.random.PRNGKey(1))
    w0 = params[0][0]
    assert float(jnp.abs(w0).max()) <= 1.0 / 3 + 1e-6  # U[±1/in]
    for w, _ in params[1:]:
        fan_in = w.shape[0]
        bound = math.sqrt(6.0 / fan_in) / OMEGA_0
        assert float(jnp.abs(w).max()) <= bound + 1e-7
        # roughly uniform: std ~ bound/sqrt(3)
        assert abs(float(w.std()) - bound / math.sqrt(3)) < 0.15 * bound


def test_siren_output_scale():
    """A freshly initialized SIREN should produce O(1)-bounded outputs."""
    net = MLP(2, 2, num_hidden_layers=3, hidden_features=64)
    params = net.init(jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1000, 2), minval=-1,
                           maxval=1)
    y = net.apply(params, x)
    assert float(jnp.abs(y).max()) < 5.0


def test_point_fn_and_weights():
    net = MLP(2, 2, num_hidden_layers=1, hidden_features=16)
    params = net.init(jax.random.PRNGKey(4))
    x = jnp.array([0.3, -0.2])
    np.testing.assert_allclose(net.point_fn(params)(x),
                               net.apply(params, x), rtol=1e-6)
    w = jnp.array([2.0, 0.5])
    np.testing.assert_allclose(net.apply(params, x, weights=w),
                               net.apply(params, x) * w, rtol=1e-6)


def test_relu_and_elu_variants():
    for nl in ("relu", "elu"):
        net = MLP(2, 1, num_hidden_layers=1, hidden_features=16,
                  nonlinearity=nl)
        params = net.init(jax.random.PRNGKey(5))
        y = net.apply(params, jnp.ones((4, 2)))
        assert y.shape == (4, 1)
        assert not bool(jnp.any(jnp.isnan(y)))


def test_value_grad_dispatch_matches_autodiff():
    """net.value_grad/_laplacian must return the *network's own* derivatives
    for every nonlinearity (regression: relu/elu nets previously got sine
    forward-Laplacian derivatives — ADVICE r1 medium)."""
    from insr_pde_tpu.ops.diff import hessian, jacobian

    x = jax.random.uniform(jax.random.PRNGKey(7), (32, 2), minval=-1, maxval=1)
    for nl in ("sine", "relu", "elu"):
        net = MLP(2, 1, num_hidden_layers=1, hidden_features=16,
                  nonlinearity=nl)
        params = net.init(jax.random.PRNGKey(3))
        u, J, L = net.value_grad_laplacian(params, x)
        u2, J2 = net.value_grad(params, x)

        fn = net.point_fn(params)
        J_ref = jnp.swapaxes(jacobian(fn, x), 1, 2)       # (N, d, m)
        L_ref = jnp.trace(hessian(fn, x), axis1=2, axis2=3)
        np.testing.assert_allclose(np.asarray(u), np.asarray(net.apply(params, x)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(J2), np.asarray(J_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u))


def test_hashgrid_field_fits_signal(tmp_path):
    """`--network hashgrid` end-to-end: the encoded field fits the advection
    initial condition (reference's hash encoder is dead code; here it's a
    usable backbone)."""
    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel

    cfg = Config(pde="advection", proj_dir=str(tmp_path), tag="hg",
                 network="hashgrid", init_cond="example1",
                 num_hidden_layers=2, hidden_features=32,
                 sample_resolution=500, vis_resolution=100,
                 max_n_iters=600, chunk_size=200, lr=5e-3,
                 early_stop=False, vis_frequency=10 ** 9,
                 backup_sources=False)
    cfg.setup_dirs()
    model = Advection1DModel(cfg)
    res = model.initialize()
    assert res.final_loss < 5e-3
