"""Equivalence pins for the fused Pallas value+grad+Laplacian kernels
(tools/experiments/pallas_vgl.py — demoted experiment, measured negative
result) against the XLA forward-Laplacian chain + autodiff.

Lives outside tests/ with its component, so the suite's CPU-forcing
conftest does not apply — force the CPU platform here (interpreter mode).
Run directly: `pytest tools/experiments/test_pallas_vgl.py`.
"""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.models.networks import MLP
from insr_pde_tpu.ops import forward_laplacian as fl
from tools.experiments.pallas_vgl import (siren_vgl_bwd_interpret,
                                          siren_vgl_interpret)


@pytest.mark.parametrize("d,m,layers,width,n", [
    (2, 1, 3, 32, 300),    # fluid pressure net (paper scale shape)
    (2, 2, 2, 16, 64),     # vector output
    (1, 1, 2, 20, 130),    # 1D advection net
    (3, 2, 1, 24, 32),     # 3D input
])
def test_vgl_forward_matches_xla_chain(d, m, layers, width, n):
    net = MLP(in_features=d, out_features=m, num_hidden_layers=layers,
              hidden_features=width)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d),
                           minval=-1.0, maxval=1.0)
    u_ref, J_ref, L_ref = fl.value_grad_laplacian(params, x)
    u, J, L = siren_vgl_interpret(params, x)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("d,m,layers,width,n", [
    (2, 1, 3, 32, 300),
    (2, 2, 2, 16, 64),
])
def test_vgl_backward_matches_autodiff(d, m, layers, width, n):
    """Hand-scheduled backward == jax.vjp of the XLA chain, for random
    cotangents on all three outputs (params AND coords gradients)."""
    net = MLP(in_features=d, out_features=m, num_hidden_layers=layers,
              hidden_features=width)
    params = net.init(jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(3), (n, d),
                           minval=-1.0, maxval=1.0)
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    gu = jax.random.normal(ks[0], (n, m))
    gJ = jax.random.normal(ks[1], (n, d, m))
    gL = jax.random.normal(ks[2], (n, m))

    _, vjp = jax.vjp(lambda p, c: fl.value_grad_laplacian(p, c), params, x)
    gp_ref, gx_ref = vjp((gu, gJ, gL))

    gp, gx = siren_vgl_bwd_interpret(params, x, gu, gJ, gL)

    for (gw, gb), (gw_r, gb_r) in zip(gp, gp_ref):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   rtol=1e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                                   rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=5e-3)


def test_vgl_laplacian_only_cotangent():
    """The pressure-loss pattern: cotangent only on L (gu = gJ = 0)."""
    net = MLP(in_features=2, out_features=1, num_hidden_layers=3,
              hidden_features=32)
    params = net.init(jax.random.PRNGKey(5))
    x = jax.random.uniform(jax.random.PRNGKey(6), (200, 2),
                           minval=-1.0, maxval=1.0)
    target = jnp.sin(3.0 * x[:, 0]) * jnp.cos(2.0 * x[:, 1])

    def loss_xla(p):
        L = fl.value_grad_laplacian(p, x)[2][:, 0]
        return jnp.mean((L - target) ** 2)

    g_ref = jax.grad(loss_xla)(params)
    lval = loss_xla(params)

    # same loss through the kernel's vjp: gL = 2 (L - target) / n
    L = siren_vgl_interpret(params, x)[2]
    gL = (2.0 * (L[:, 0] - target) / x.shape[0])[:, None]
    gp, _ = siren_vgl_bwd_interpret(
        params, x, jnp.zeros_like(L), jnp.zeros((x.shape[0], 2, 1)), gL)

    Lv = float(jnp.mean((L[:, 0] - target) ** 2))
    assert abs(Lv - float(lval)) < 1e-4 * max(1.0, abs(float(lval)))
    # f32 accumulation-order noise through the w^3 Laplacian-cotangent terms
    # reaches ~0.2% on O(10^3)-magnitude entries
    for (gw, gb), (gw_r, gb_r) in zip(gp, g_ref):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                                   rtol=5e-3, atol=1e-3)
