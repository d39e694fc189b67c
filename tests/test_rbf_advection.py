"""Space-time RBF advection: the solved field must transport the initial
condition along characteristics (u(x,t) = u0(x - v t)).

This exercises the hat-PoU continuous representation — with the reference's
indicator PoUs the field cannot propagate between slice windows at all (it
decays to zero or freezes; see rbf.point_basis docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.models.rbf_advection import (RBFAdvectionConfig,
                                               RBFAdvectionModel)


def gaussian(x):
    c = jnp.asarray([-0.4, 0.0])
    return jnp.exp(-jnp.sum((x - c) ** 2, axis=-1) / (2 * 0.2 ** 2))


@pytest.mark.slow
def test_rbf_advection_transports_bump():
    cfg = RBFAdvectionConfig(
        velocity=(0.5, 0.0), time_num=11, time_length=1.0,
        collocation_pts_num=800, boundary_num=100, n_spatial_basis=400,
        n_feat=8, neighbor_k=8, band_width=1.0, cgls_maxiter=4000,
        cgls_damp=0.01)
    model = RBFAdvectionModel(cfg, gaussian)
    res = model.solve()
    assert np.isfinite(res)

    g = jnp.linspace(-0.9, 0.9, 25)
    grid = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)

    u0 = model.evaluate(grid, 0.0)
    err0 = float(jnp.sqrt(jnp.mean((u0 - gaussian(grid)) ** 2)))
    assert err0 < 0.05, f"init fit rmse {err0}"

    u1 = model.evaluate(grid, 1.0)
    exact1 = gaussian(grid - jnp.asarray([0.5, 0.0]))
    err1 = float(jnp.sqrt(jnp.mean((u1 - exact1) ** 2)))
    assert err1 < 0.08, f"t=1 transport rmse {err1}"
    # the bump must actually have moved: comparing against the UN-shifted
    # profile must be clearly worse
    err_static = float(jnp.sqrt(jnp.mean((u1 - gaussian(grid)) ** 2)))
    assert err_static > 3 * err1
    # amplitude survives transport
    assert float(u1.max()) > 0.7
