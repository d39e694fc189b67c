"""2D fluid integration tests on tiny configs (SURVEY.md §4): init fit to
Taylor-Green, one full operator-splitting step with residual drops, and
divergence reduction after projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.config import Config
from insr_pde_tpu.models.examples import (taylorgreen_multi_velocity,
                                          taylorgreen_velocity)
from insr_pde_tpu.models.fluid import Fluid2DModel
from insr_pde_tpu.ops.diff import divergence
from insr_pde_tpu.ops.sampling import sample_random


@pytest.fixture
def cfg(tmp_path):
    return Config(
        pde="fluid", proj_dir=str(tmp_path), tag="fluid_test",
        init_cond="taylorgreen", num_hidden_layers=3, hidden_features=32,
        sample_resolution=32, vis_resolution=16, max_n_iters=600,
        chunk_size=200, dt=0.05, early_stop=False, backup_sources=False,
        seed=3,
    )


def test_taylorgreen_examples():
    x = sample_random(jax.random.PRNGKey(0), 100, 2)
    v = taylorgreen_velocity(x, rescale=True)
    assert v.shape == (100, 2)
    assert float(jnp.abs(v).max()) <= 1 / np.pi + 1e-5
    # analytic: u(x,y) = sin(pi(x+1))cos(pi(y+1))/pi
    u = np.sin(np.pi * (np.asarray(x[:, 0]) + 1)) * \
        np.cos(np.pi * (np.asarray(x[:, 1]) + 1)) / np.pi
    np.testing.assert_allclose(v[:, 0], u, atol=1e-5)

    vm = taylorgreen_multi_velocity(x)
    assert vm.shape == (100, 2)
    # outside both patches the field is zero
    outside = (np.asarray(x[:, 0]) > 0.1) & (np.asarray(x[:, 1]) > 0.1) & \
              (np.asarray(x[:, 0]) < 0.6) & (np.asarray(x[:, 1]) < 0.6)
    if outside.any():
        np.testing.assert_allclose(np.asarray(vm)[outside], 0.0, atol=1e-6)


def test_fluid_initialize_and_step(cfg):
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)

    res0 = model.initialize()
    assert res0.final_loss < 1e-2

    # init fit quality against analytic Taylor-Green
    x = sample_random(jax.random.PRNGKey(42), 500, 2)
    pred = model.vel_net.apply(model.fields["velocity"], x)
    ref = taylorgreen_velocity(x, rescale=True)
    rel_l2 = float(jnp.linalg.norm(pred - ref) / jnp.linalg.norm(ref))
    assert rel_l2 < 0.5  # loose: only 600 iters

    res_a, res_p, res_j = model.step()
    assert model.timestep == 1
    # advect/projection targets are near-identity at small dt: require small
    # final residuals; the pressure Poisson solve must show an actual drop
    assert res_a.final_loss < 1e-3
    assert res_j.final_loss < 1e-3
    assert res_p.final_loss < float(res_p.history["main"][0])

    # velocity should remain bounded and similar in magnitude
    u = model.vel_net.apply(model.fields["velocity"], x)
    assert float(jnp.abs(u).max()) < 2.0


def test_fluid_write_output(cfg, tmp_path):
    import os
    cfg.max_n_iters = 100
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)
    model.initialize()
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    model.write_output(out)
    for suffix in ("_vel.png", "_mag.png", "_curl.png", ".npy"):
        assert os.path.exists(os.path.join(out, f"t000{suffix}"))
    arr = np.load(os.path.join(out, "t000.npy"))
    assert arr.shape == (16, 16, 2)


def test_fluid_rejects_degenerate_laplacian_networks(cfg, tmp_path):
    """The pressure Poisson phase needs real second derivatives: hashgrid
    (multilinear interp) and relu MLPs have lap p == 0 a.e. and must be
    refused at construction (VERDICT r2 weak #5)."""
    for net, extra in [("grid", {}), ("hashgrid", {}),
                       ("siren", {"nonlinearity": "relu"})]:
        bad = Config(
            pde="fluid", proj_dir=str(tmp_path), tag=f"fluid_bad_{net}",
            init_cond="taylorgreen", network=net, num_hidden_layers=2,
            hidden_features=16, sample_resolution=8, vis_resolution=8,
            max_n_iters=10, chunk_size=10, backup_sources=False, **extra)
        with pytest.raises(ValueError, match="second derivatives"):
            Fluid2DModel(bad)


def test_advect_scheme_and_sobolev_losses(cfg):
    """MacCormack and Sobolev advect knobs: losses are finite, the
    Sobolev term supervises the Jacobian (present only when enabled), and
    the MacCormack target reduces to plain semi-Lagrangian for a constant
    velocity field (round-trip defect is identically zero)."""
    key = jax.random.PRNGKey(0)

    cfg.advect_scheme = "maccormack"
    cfg.advect_sobolev = 0.5
    m = Fluid2DModel(cfg)
    prev = m.fields["velocity"]
    ld = m._advect_loss(prev, key, {"prev": prev})
    assert set(ld) == {"main", "sobolev", "bc"}
    assert all(np.isfinite(float(v)) for v in ld.values())

    # constant field: zero defect -> MacCormack == semilag target exactly
    const = jax.tree_util.tree_map(jnp.zeros_like, prev)
    cfg2 = cfg
    cfg2.advect_sobolev = 0.0
    m2 = Fluid2DModel(cfg2)
    ld_mc = m2._advect_loss(prev, key, {"prev": const})
    cfg2.advect_scheme = "semilag"
    m3 = Fluid2DModel(cfg2)
    ld_sl = m3._advect_loss(prev, key, {"prev": const})
    np.testing.assert_allclose(float(ld_mc["main"]), float(ld_sl["main"]),
                               rtol=1e-6)


def test_sobolev_advect_reduces_derivative_noise(cfg):
    """The measurable claim behind --advect_sobolev: after an advect fit
    at equal iteration budget, the DERIVATIVE-space error of the fitted
    field (vs the target's Jacobian) is smaller with supervision on."""
    from insr_pde_tpu.models.solver import Solver

    def fit_and_jac_err(sob):
        cfg.advect_sobolev = sob
        cfg.seed = 3
        m = Fluid2DModel(cfg)
        prev = m.fields["velocity"]
        solver = Solver(m._advect_loss, lr=1e-4, max_n_iters=800,
                        chunk_size=200, early_stop=False)
        res = solver.fit(prev, jax.random.PRNGKey(5), aux={"prev": prev})
        # derivative error on a fresh batch vs the (plain) target Jacobian
        x = sample_random(jax.random.PRNGKey(9), 2048, 2)
        u_p, J_p = m.vel_net.value_grad(prev, x)
        back = jnp.clip(x - u_p * m.dt, -1.0, 1.0)
        _, J_a = m.vel_net.value_grad(prev, back)
        db = jnp.eye(2)[None] - m.dt * J_p
        J_t = jnp.einsum("njk,nki->nji", db, J_a)
        _, J_f = m.vel_net.value_grad(res.params, x)
        return float(jnp.mean((J_f - J_t) ** 2))

    err_off = fit_and_jac_err(0.0)
    err_on = fit_and_jac_err(1.0)
    assert err_on < err_off, (err_on, err_off)


def test_merged_target_fn_matches_split_advect_target(cfg):
    """The merged step's pure advected function u*(x) must equal the split
    advect phase's fitting target (same composition, same clipping), and
    its jacfwd divergence must match finite differences."""
    m = Fluid2DModel(cfg)
    prev = m.fields["velocity"]
    fn = m._advect_target_fn(prev)
    x = sample_random(jax.random.PRNGKey(1), 256, 2) * 0.95

    u_prev = m.vel_net.apply(prev, x)
    back = jnp.clip(x - u_prev * m.dt, -1.0, 1.0)
    expected = m.vel_net.apply(prev, back)
    np.testing.assert_allclose(np.asarray(jax.vmap(fn)(x)),
                               np.asarray(expected), rtol=2e-5, atol=1e-6)

    div = divergence(fn, x)[:, 0]
    eps = 1e-4
    ex = jnp.array([eps, 0.0])
    ey = jnp.array([0.0, eps])
    fd = ((jax.vmap(fn)(x + ex)[:, 0] - jax.vmap(fn)(x - ex)[:, 0])
          + (jax.vmap(fn)(x + ey)[:, 1] - jax.vmap(fn)(x - ey)[:, 1])) \
        / (2 * eps)
    np.testing.assert_allclose(np.asarray(div), np.asarray(fd),
                               rtol=5e-3, atol=5e-4)


def test_merged_step_runs_and_losses_drop(cfg):
    """fluid_step=merged: initialize + one step runs, returns two phase
    results (pressure, combined fit), all losses finite and dropping."""
    cfg.fluid_step = "merged"
    cfg.advect_sobolev = 0.3
    cfg.setup_dirs()
    m = Fluid2DModel(cfg)
    m.initialize()
    results = m.step()
    assert len(results) == 2
    for res in results:
        assert np.isfinite(res.final_loss)
    # the combined fit must land close to its target at this tiny budget
    assert results[1].final_loss < 5e-2


def test_rk2_trace_reduces_curvature_bias(cfg):
    """--advect_trace rk2: for a rotational (TG) field the midpoint trace
    lands closer to the true curved characteristic than the straight-line
    one. Measured as target error vs a 16-substep reference trace."""
    cfg.setup_dirs()
    m = Fluid2DModel(cfg)
    m.initialize()
    prev = m.fields["velocity"]
    vel = m.vel_net.point_fn(prev)
    x = sample_random(jax.random.PRNGKey(7), 512, 2) * 0.7

    def substep_trace(xi, n=16):
        d = m.dt / n
        for _ in range(n):
            xi = jnp.clip(xi - d * vel(xi), -1.0, 1.0)
        return xi
    ref_target = m.vel_net.apply(prev, jax.vmap(substep_trace)(x))

    errs = {}
    for tr in ("euler", "rk2"):
        cfg.advect_trace = tr
        fn = Fluid2DModel(cfg)._advect_target_fn(prev)
        errs[tr] = float(jnp.mean((jax.vmap(fn)(x) - ref_target) ** 2))
    assert errs["rk2"] < 0.2 * errs["euler"], errs


def test_merged2_step_runs_and_is_self_consistent(cfg):
    """fluid_step=merged2 (+rk2): bootstrap on the first step, pressure_prev
    threads across steps, losses finite; the trapezoidal predictor with
    q_old=0-params differs from the plain composition only by grad(q_old)."""
    cfg.fluid_step = "merged2"
    cfg.advect_trace = "rk2"
    cfg.setup_dirs()
    m = Fluid2DModel(cfg)
    m.initialize()
    m.step()
    assert "pressure_prev" in m.fields
    res_p, res_j = m.step()       # second step exercises the q_old path
    assert np.isfinite(res_p.final_loss) and np.isfinite(res_j.final_loss)

    # predictor consistency: fn2 == fn - grad q_old at the traced point
    prev = m.fields["velocity_prev"]
    p_old = m.fields["pressure_prev"]
    fn = m._advect_target_fn(prev)
    fn2 = m._advect_target_fn(prev, p_old)
    x = sample_random(jax.random.PRNGKey(3), 128, 2) * 0.9
    vel = m.vel_net.point_fn(prev)
    p_pt = m.p_net.point_fn(p_old)

    def manual(xi):
        u0 = vel(xi)
        mid = jnp.clip(xi - 0.5 * m.dt * u0, -1.0, 1.0)
        b = jnp.clip(xi - m.dt * vel(mid), -1.0, 1.0)
        return fn(xi) - jax.jacfwd(p_pt)(b)[0]

    np.testing.assert_allclose(np.asarray(jax.vmap(fn2)(x)),
                               np.asarray(jax.vmap(manual)(x)),
                               rtol=2e-5, atol=1e-6)


def test_merged2_resume_restores_pressure_prev(cfg):
    """--ckpt resume must continue the trapezoidal chain: pressure_prev is
    pre-created in __init__ (so load_pytree's structure includes it — a
    leaf absent from `like` is silently DROPPED from the checkpoint), and a
    resumed step must reuse the restored q_old instead of re-bootstrapping."""
    cfg.fluid_step = "merged2"
    cfg.advect_trace = "rk2"
    cfg.max_n_iters = 120
    cfg.chunk_size = 60
    cfg.setup_dirs()
    m = Fluid2DModel(cfg)
    m.initialize()
    m.step()
    m.step()                      # ckpt_step_t002 now holds a real q_old
    saved_q_old = m.fields["pressure_prev"]

    m2 = Fluid2DModel(cfg)
    assert "pressure_prev" in m2.fields   # pre-created, restorable
    m2.load_ckpt(2)
    for a, b in zip(jax.tree_util.tree_leaves(saved_q_old),
                    jax.tree_util.tree_leaves(m2.fields["pressure_prev"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the resumed step must NOT run the bootstrap phase
    tags = []
    orig = m2._run_phase

    def spy(tag, *args, **kwargs):
        tags.append(tag)
        return orig(tag, *args, **kwargs)

    m2._run_phase = spy
    m2.step()
    assert m2.timestep == 3
    assert "solve_pressure_m2boot" not in tags
    assert tags == ["solve_pressure_merged2", "project_advect2"]
