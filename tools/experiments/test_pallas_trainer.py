"""Fused whole-loop Pallas trainer: interpret-mode equivalence vs a plain
JAX/optax implementation of the identical update sequence.

Lives outside tests/ (the component is demoted to an experiment), so the
suite's CPU-forcing conftest does not apply — force the CPU platform here
before any jax usage."""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from insr_pde_tpu.models.networks import MLP
from tools.experiments.pallas_trainer import fused_advect_fit

HL, DT, VEL, LR = 2.0, 0.05, 0.25, 1e-3
NS, NB, NIT = 128, 16, 60


@pytest.fixture(scope="module")
def setup():
    net = MLP(1, 1, num_hidden_layers=2, hidden_features=20)
    params = net.init(jax.random.PRNGKey(0))
    prev = net.init(jax.random.PRNGKey(1))
    uni = jax.random.uniform(jax.random.PRNGKey(2), (NIT, NS + NB, 2))
    return net, params, prev, uni


def _reference_loop(net, params, prev, uni):
    """Same math with net.apply + jacfwd + optax.adam."""
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    def u_du(p, x):
        f = lambda xi: net.apply(p, xi[None, :])[0]
        def one(xi):
            return f(xi)[0], jax.jacfwd(f)(xi)[0, 0]
        return jax.vmap(one)(x[:, None])

    @jax.jit
    def step(params, opt_state, table):
        x = (table[:NS, 0] * 2.0 - 1.0) * HL
        side = jnp.where(table[NS:, 1] < 0.5, -1.0, 1.0)
        xb = side * HL + (table[NS:, 0] * 2.0 - 1.0) * 1e-4

        def loss(p):
            u, du = u_du(p, x)
            u0, du0 = u_du(prev, x)
            resid = (u - u0) / DT + VEL * (du + du0) / 2.0
            main = jnp.mean(resid ** 2)
            ub = net.apply(p, xb[:, None])[:, 0]
            return main + jnp.mean(ub ** 2), main

        (_, main), g = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, main

    mains = []
    for i in range(NIT):
        params, opt_state, main = step(params, opt_state, uni[i])
        mains.append(float(main))
    return params, np.asarray(mains)


def test_fused_trainer_matches_plain_jax(setup):
    net, params, prev, uni = setup
    ref_params, ref_mains = _reference_loop(net, params, prev, uni)
    new_params, losses = fused_advect_fit(
        params, prev, jnp.int32(0), n_iters=NIT, n_samples=NS,
        n_boundary=NB, half_length=HL, dt=DT, vel=VEL, lr=LR,
        early_stop=False, interpret=True, host_uniforms=uni)

    np.testing.assert_allclose(np.asarray(losses), ref_mains, rtol=2e-3)
    for (w1, b1), (w2, b2) in zip(new_params, ref_params):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   atol=5e-5)


def test_fused_trainer_padding_stays_zero(setup):
    net, params, prev, uni = setup
    from tools.experiments.pallas_trainer import _pad_params
    new_params, _ = fused_advect_fit(
        params, prev, jnp.int32(0), n_iters=10, n_samples=NS,
        n_boundary=NB, half_length=HL, dt=DT, vel=VEL, lr=LR,
        early_stop=False, interpret=True, host_uniforms=uni[:10])
    # returned shapes are the unpadded originals and finite
    for (w, b), (w0, b0) in zip(new_params, params):
        assert w.shape == w0.shape and b.shape == b0.shape
        assert bool(jnp.all(jnp.isfinite(w)))
