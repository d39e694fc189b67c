"""Physics validation against closed forms (slow-ish; still CPU-budgeted).

SURVEY.md §4: the bar to exceed — per-PDE residual-drop integration tests
and analytic-solution checks (Taylor-Green has closed form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.config import Config
from insr_pde_tpu.models.examples import taylorgreen_velocity
from insr_pde_tpu.ops.diff import divergence
from insr_pde_tpu.ops.sampling import sample_random


@pytest.mark.slow
def test_advection_peak_drifts_at_velocity(tmp_path):
    """After N steps the bump's peak must have moved ~ vel * dt * N."""
    from insr_pde_tpu.models.advection import Advection1DModel
    cfg = Config(
        pde="advection", proj_dir=str(tmp_path), tag="phys",
        init_cond="example1", num_hidden_layers=2, hidden_features=20,
        sample_resolution=2000, vis_resolution=400, max_n_iters=3000,
        chunk_size=1000, early_stop=True, dt=0.2, vel=0.5, length=4.0,
        vis_frequency=10 ** 9, backup_sources=False)
    cfg.setup_dirs()
    model = Advection1DModel(cfg)
    model.initialize()
    values, samples = model.sample_field(cfg.vis_resolution,
                                         return_samples=True)
    peak0 = float(samples[int(jnp.argmax(values))])
    n_steps = 3
    for _ in range(n_steps):
        model.step()
    values, samples = model.sample_field(cfg.vis_resolution,
                                         return_samples=True)
    peak1 = float(samples[int(jnp.argmax(values))])
    drift = peak1 - peak0
    expected = cfg.vel * cfg.dt * n_steps  # 0.3
    assert abs(drift - expected) < 0.1, (drift, expected)
    # amplitude approximately preserved
    assert float(jnp.max(values)) > 0.7


@pytest.mark.slow
def test_fluid_init_matches_taylorgreen_and_projection_reduces_divergence(
        tmp_path):
    from insr_pde_tpu.models.fluid import Fluid2DModel
    cfg = Config(
        pde="fluid", proj_dir=str(tmp_path), tag="phys",
        init_cond="taylorgreen", num_hidden_layers=3, hidden_features=32,
        sample_resolution=24, vis_resolution=32, max_n_iters=2500,
        chunk_size=500, early_stop=True, dt=0.05,
        vis_frequency=10 ** 9, backup_sources=False)
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)
    model.initialize()

    # init fit: relative L2 against the closed-form Taylor-Green field
    grid = sample_random(jax.random.PRNGKey(1), 1024, 2) * 0.95
    u = model.vel_net.apply(model.fields["velocity"], grid)
    ref = taylorgreen_velocity(grid, rescale=True)
    rel = float(jnp.linalg.norm(u - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, f"taylor-green init fit rel L2 {rel}"

    # one full split step: divergence after projection must not blow up,
    # and must be smaller than after the pure advection phase
    model.fields["velocity_prev"] = model.fields["velocity"]
    res_a = model._run_phase("advect_velocity", model._advect_loss,
                             model.fields["velocity"],
                             aux={"prev": model.fields["velocity_prev"]})
    vel_after_advect = res_a.params

    def div_rms(params):
        fn = model.vel_net.point_fn(params)
        d = divergence(fn, grid)
        return float(jnp.sqrt(jnp.mean(d ** 2)))

    model.fields["velocity"] = vel_after_advect
    res_p = model._run_phase("solve_pressure", model._pressure_loss,
                             model.fields["pressure"],
                             aux={"vel": model.fields["velocity"]})
    model.fields["pressure"] = res_p.params
    model.fields["velocity_prev"] = model.fields["velocity"]
    res_j = model._run_phase("projection", model._projection_loss,
                             model.fields["velocity"],
                             aux={"prev": model.fields["velocity_prev"],
                                  "pressure": model.fields["pressure"]})

    div_before = div_rms(vel_after_advect)
    div_after = div_rms(res_j.params)
    assert np.isfinite(div_after)
    # projection should not increase divergence by more than noise
    assert div_after < div_before * 1.5, (div_before, div_after)


@pytest.mark.slow
def test_fluid_taylorgreen_stays_near_steady(tmp_path):
    """The 2D Taylor-Green field is a steady Euler solution: after a few
    operator-splitting steps the simulated velocity should stay close to
    the initial field (this is the paper's fluid experiment)."""
    from insr_pde_tpu.models.fluid import Fluid2DModel
    cfg = Config(
        pde="fluid", proj_dir=str(tmp_path), tag="tg",
        init_cond="taylorgreen", num_hidden_layers=3, hidden_features=32,
        sample_resolution=32, vis_resolution=32, max_n_iters=2500,
        chunk_size=500, early_stop=True, dt=0.05,
        vis_frequency=10 ** 9, backup_sources=False)
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)
    model.initialize()
    u0 = np.asarray(model.sample_field(32))
    for _ in range(2):
        model.step()
    u2 = np.asarray(model.sample_field(32))
    rel = np.linalg.norm(u2 - u0) / np.linalg.norm(u0)
    assert rel < 0.25, f"Taylor-Green drifted {rel:.3f} after 2 steps"
