"""Training-engine tests: Adam+plateau semantics, early stop, aux threading,
and multi-device sharding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from insr_pde_tpu.models.solver import (PlateauState, Solver, plateau_init,
                                        plateau_update)


def _quadratic_loss(params, key, aux):
    # deterministic strongly-convex problem
    target = jnp.asarray([1.0, -2.0, 3.0])
    return {"main": jnp.sum((params - target) ** 2)}


def test_solver_converges_quadratic():
    solver = Solver(_quadratic_loss, lr=0.1, max_n_iters=2000, chunk_size=100,
                    early_stop=False)
    res = solver.fit(jnp.zeros(3), jax.random.PRNGKey(0))
    np.testing.assert_allclose(res.params, [1.0, -2.0, 3.0], atol=1e-2)
    assert res.n_iters == 2000
    assert res.history["main"].shape == (2000,)
    assert res.final_loss < 1e-3


def test_plateau_reduces_lr_and_early_stops():
    # a loss that cannot improve -> plateau fires every `patience` iters,
    # lr decays 1e-1 per fire until the early-stop latch at 1.1e-3
    def const_loss(params, key, aux):
        return {"main": jnp.asarray(1.0)}

    solver = Solver(const_loss, lr=1e-1, max_n_iters=10000, chunk_size=100,
                    early_stop=True, plateau_patience=50,
                    plateau_min_lr=1e-3, early_stop_min_lr=1.1e-3)
    res = solver.fit(jnp.zeros(2), jax.random.PRNGKey(0))
    # needs 2 decades: ~2*(patience+1) iterations, far below max
    assert res.n_iters < 500
    lr_hist = res.history["_lr"]
    np.testing.assert_allclose(float(lr_hist[0]), 1e-1, rtol=1e-6)
    # the final active iteration trains at the pre-decay lr (the reference
    # breaks after the scheduler step, base/baseModel.py:132-134), so the last
    # recorded lr is one decade above the stop threshold
    np.testing.assert_allclose(float(lr_hist[-1]), 1e-2, rtol=1e-5)


def test_plateau_update_matches_torch_semantics():
    st = plateau_init()
    kw = dict(factor=0.1, patience=2, threshold=1e-4, min_scale=1e-4,
              stop_scale=1.1e-4, early_stop=True)
    # first loss always improves vs inf
    st = plateau_update(st, jnp.asarray(1.0), **kw)
    assert float(st.best) == 1.0 and int(st.bad) == 0
    # non-improving (within rel threshold) increments bad
    for i in range(2):
        st = plateau_update(st, jnp.asarray(1.0), **kw)
        assert int(st.bad) == i + 1
        assert float(st.scale) == 1.0
    # third non-improving step: bad(3) > patience(2) -> decay
    st = plateau_update(st, jnp.asarray(1.0), **kw)
    np.testing.assert_allclose(float(st.scale), 0.1, rtol=1e-6)
    assert int(st.bad) == 0
    # a real improvement resets
    st = plateau_update(st, jnp.asarray(0.5), **kw)
    assert float(st.best) == 0.5 and int(st.bad) == 0


def test_aux_threading_no_recompile():
    calls = []

    def loss(params, key, aux):
        calls.append(1)  # traced once per compiled variant
        return {"main": jnp.sum((params - aux["target"]) ** 2)}

    solver = Solver(loss, lr=0.05, max_n_iters=200, chunk_size=100,
                    early_stop=False)
    r1 = solver.fit(jnp.zeros(2), jax.random.PRNGKey(0),
                    aux={"target": jnp.asarray([1.0, 1.0])})
    n_traces = len(calls)
    r2 = solver.fit(jnp.zeros(2), jax.random.PRNGKey(1),
                    aux={"target": jnp.asarray([-1.0, 2.0])})
    assert len(calls) == n_traces  # same compiled fn reused with new aux
    np.testing.assert_allclose(r1.params, [1.0, 1.0], atol=0.05)
    np.testing.assert_allclose(r2.params, [-1.0, 2.0], atol=0.05)


def test_callback_reports_last_active_loss():
    """Early stop mid-chunk: the callback must see the loss at the last
    *active* iteration, not the frozen-latch value logged at chunk end
    (regression for models/solver.py history/callback divergence)."""
    def const_loss(params, key, aux):
        return {"main": jnp.asarray(1.0)}

    seen = []
    solver = Solver(const_loss, lr=1e-1, max_n_iters=10000, chunk_size=100,
                    early_stop=True, plateau_patience=50,
                    plateau_min_lr=1e-3, early_stop_min_lr=1.1e-3)
    res = solver.fit(jnp.zeros(2), jax.random.PRNGKey(0),
                     callback=lambda it, p, losses: seen.append(dict(losses)))
    assert res.n_iters < 10000  # early stop actually fired
    # last callback lr must equal the last history (active) lr, not the
    # post-freeze value
    np.testing.assert_allclose(float(seen[-1]["_lr"]),
                               float(res.history["_lr"][-1]), rtol=1e-6)


def test_sharded_solver_matches_single_device():
    """DP/SP over the collocation batch: an 8-device mesh where every device
    contributes the same deterministic loss must match the unsharded run."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(np.asarray(devices[:8]), ("data",))

    solver_1 = Solver(_quadratic_loss, lr=0.1, max_n_iters=300, chunk_size=100,
                      early_stop=False)
    solver_8 = Solver(_quadratic_loss, lr=0.1, max_n_iters=300, chunk_size=100,
                      early_stop=False, mesh=mesh)
    r1 = solver_1.fit(jnp.zeros(3), jax.random.PRNGKey(0))
    r8 = solver_8.fit(jnp.zeros(3), jax.random.PRNGKey(0))
    np.testing.assert_allclose(r1.params, r8.params, rtol=1e-5, atol=1e-6)


def test_sharded_stochastic_loss_runs():
    """Stochastic loss with per-device RNG fold-in: just verify convergence."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    def noisy_loss(params, key, aux):
        x = jax.random.normal(key, (64, 3))
        target = jnp.asarray([1.0, -2.0, 3.0])
        pred = x * params
        return {"main": jnp.mean((pred - x * target) ** 2)}

    solver = Solver(noisy_loss, lr=0.1, max_n_iters=500, chunk_size=100,
                    early_stop=False, mesh=mesh)
    res = solver.fit(jnp.zeros(3), jax.random.PRNGKey(0))
    np.testing.assert_allclose(res.params, [1.0, -2.0, 3.0], atol=0.05)


def test_sharded_solver_weak_scaling_layout():
    """DP layout-intent pin: under an n-device mesh each device runs the
    SAME per-device collocation batch (weak scaling — per-device compiled
    work ~constant as the mesh grows, total work scales with n), and the
    gradient pmean's replica group spans the whole mesh."""
    import re

    from jax.sharding import Mesh

    def loss(params, key, aux):
        x = jax.random.uniform(key, (256, 2))
        return {"main": jnp.mean((x @ params) ** 2)}

    params = jnp.ones((2, 3))
    flops = {}
    for n in (1, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",)) if n > 1 \
            else None
        solver = Solver(loss, lr=1e-2, max_n_iters=32, chunk_size=32,
                        early_stop=False, mesh=mesh)
        state = solver.init_state(params, jax.random.PRNGKey(0))
        lo = solver._get_chunk_fn(32).lower(state, None)
        ca = lo.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops[n] = float(ca["flops"])
        if n == 8:
            st = lo.as_text()
            groups = re.findall(
                r"all_reduce.*?replica_groups = dense<(.*?)>", st)
            assert groups and "[[0, 1, 2, 3, 4, 5, 6, 7]]" in groups[0], \
                groups[:1]
    # weak scaling: per-device work within 35% of the single-device program
    # (the pmean and sharding bookkeeping add a little)
    assert flops[8] < 1.35 * flops[1], flops


def test_pipelined_fit_matches_unpipelined():
    """pipeline=True speculatively dispatches one chunk ahead; the freeze
    latch must make the result — params, n_iters, and the recorded history —
    bit-identical to the sequential loop, including when early stop latches
    mid-chunk (the speculative chunk's outputs are discarded)."""
    def decaying_loss(params, key, aux):
        # improves for a while then plateaus -> early stop fires mid-run
        return {"main": jnp.sum(params ** 2) + 1.0}

    for early_stop in (False, True):
        kw = dict(lr=1e-1, max_n_iters=1200, chunk_size=100,
                  early_stop=early_stop, plateau_patience=50,
                  plateau_min_lr=1e-3, early_stop_min_lr=1.1e-3)
        seq = Solver(decaying_loss, pipeline=False, **kw)
        pip = Solver(decaying_loss, pipeline=True, **kw)
        r_seq = seq.fit(jnp.asarray([2.0, -3.0]), jax.random.PRNGKey(7))
        r_pip = pip.fit(jnp.asarray([2.0, -3.0]), jax.random.PRNGKey(7))
        assert r_seq.n_iters == r_pip.n_iters, early_stop
        np.testing.assert_array_equal(np.asarray(r_seq.params),
                                      np.asarray(r_pip.params))
        for k in r_seq.history:
            np.testing.assert_array_equal(r_seq.history[k],
                                          r_pip.history[k], err_msg=k)
        if early_stop:
            assert r_seq.n_iters < 1200  # the latch actually fired


def test_nonfinite_iteration_is_skipped_not_written():
    """An iteration whose loss (or grad) is non-finite must not write its
    update: once params go NaN every later iteration is lost (seen in the
    bunny contact scene at full scale). The solver skips the write and
    keeps optimizing on the next sample."""
    def loss(params, key, aux):
        main = jnp.sum((params - jnp.asarray([1.0, -2.0, 3.0])) ** 2)
        # ~30% of sample keys produce a poisoned batch
        poisoned = jax.random.uniform(key) < 0.3
        return {"main": jnp.where(poisoned, jnp.nan, main)}

    solver = Solver(loss, lr=0.1, max_n_iters=2000, chunk_size=100,
                    early_stop=False)
    res = solver.fit(jnp.zeros(3), jax.random.PRNGKey(0))
    assert np.isnan(res.history["main"]).any()       # poison did occur
    assert np.all(np.isfinite(np.asarray(res.params)))
    np.testing.assert_allclose(res.params, [1.0, -2.0, 3.0], atol=1e-2)


def test_polar_rotation_finite_for_singular_F():
    """Collapsed/inverted deformation gradients must yield bounded ARAP
    gradients (the Newton polar iteration used to blow past f32 range)."""
    from insr_pde_tpu.ops.svd import arap_energy, polar_rotation

    F = jnp.stack([jnp.eye(3),
                   jnp.zeros((3, 3)),                      # fully collapsed
                   jnp.diag(jnp.asarray([1.0, 1.0, 0.0])),  # rank-2
                   jnp.diag(jnp.asarray([1.0, 1.0, -1e-9]))  # near-inverted
                   ])
    R = polar_rotation(F)
    assert np.all(np.isfinite(np.asarray(R)))
    g = jax.grad(arap_energy)(F)
    assert np.all(np.isfinite(np.asarray(g)))
