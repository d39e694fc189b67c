"""Fused SIREN Pallas kernel: interpreter-mode correctness on CPU.

(The compiled TPU path is exercised by bench/verify runs on hardware; these
tests pin the kernel math against the reference XLA forward.)"""

import jax
import jax.numpy as jnp
import numpy as np

from insr_pde_tpu.models.networks import MLP
from insr_pde_tpu.ops.pallas_siren import (_forward_reference,
                                           siren_forward_interpret)


def test_kernel_matches_mlp_apply():
    net = MLP(in_features=2, out_features=2, num_hidden_layers=3,
              hidden_features=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 2), minval=-1,
                           maxval=1)
    ref = net.apply(params, x)
    out = siren_forward_interpret(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_odd_batch_and_width():
    net = MLP(in_features=3, out_features=1, num_hidden_layers=2,
              hidden_features=20)
    params = net.init(jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(3), (517, 3), minval=-1,
                           maxval=1)
    out = siren_forward_interpret(params, x)
    ref = _forward_reference(params, x)
    assert out.shape == (517, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_apply_fused_falls_back_on_cpu():
    """On non-TPU backends apply_fused must route to the XLA path and
    match apply exactly."""
    net = MLP(in_features=2, out_features=2, num_hidden_layers=2,
              hidden_features=16)
    params = net.init(jax.random.PRNGKey(4))
    x = jax.random.uniform(jax.random.PRNGKey(5), (7, 11, 2))
    np.testing.assert_allclose(np.asarray(net.apply_fused(params, x)),
                               np.asarray(net.apply(params, x)), atol=1e-7)
