"""RBF basis + vortex solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.models.rbf import (RBFConfig, column_ids, field_dt,
                                     field_grad, field_lap, field_value,
                                     init_rbf, point_basis,
                                     point_basis_dense)
from insr_pde_tpu.models.vortex import (VortexConfig, VortexModel,
                                        build_points)


@pytest.fixture(scope="module")
def small_rbf():
    cfg = RBFConfig(dim=2, n_vars=3, n_feat=4, n_spatial_basis=25,
                    time_num=3, band_width=2.0, neighbor_k=4, seed=0)
    params = init_rbf(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_rbf_shapes(small_rbf):
    cfg, p = small_rbf
    assert p.centers.shape == (75, 2)
    assert p.A.shape == (75, 3, 4, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 2), minval=-1,
                           maxval=1)
    t = jnp.zeros(10)
    pb = point_basis(cfg, p, x, t)
    assert pb.phi.shape == (10, 4, 3, 4)
    assert pb.dx.shape == (10, 4, 3, 4, 2)
    assert field_value(pb, p.u).shape == (10, 3)
    assert field_grad(pb, p.u).shape == (10, 3, 2)
    assert field_dt(pb, p.u).shape == (10, 3)
    assert field_lap(pb, p.u).shape == (10, 3)


def test_rbf_analytic_derivatives_match_autodiff(small_rbf):
    """The closed-form sigma'/sigma'' derivative operators must agree with
    differentiating the value evaluation itself (with frozen KNN idx)."""
    cfg, p = small_rbf
    x = jax.random.uniform(jax.random.PRNGKey(2), (6, 2), minval=-0.5,
                           maxval=0.5)
    t = jnp.full(6, 0.25)
    pb = point_basis(cfg, p, x, t)

    def val_fn(xi, ti, idx_row):
        pb_i = point_basis(cfg, p, xi[None], ti[None], idx=idx_row[None])
        return field_value(pb_i, p.u)[0]

    # spatial jacobian per point
    jac_auto = jax.vmap(lambda xi, ti, ir: jax.jacfwd(val_fn)(xi, ti, ir))(
        x, t, pb.idx)
    jac_analytic = field_grad(pb, p.u)
    np.testing.assert_allclose(np.asarray(jac_auto),
                               np.asarray(jac_analytic), atol=1e-4)

    dt_auto = jax.vmap(
        lambda xi, ti, ir: jax.jacfwd(val_fn, argnums=1)(xi, ti, ir))(
        x, t, pb.idx)
    np.testing.assert_allclose(np.asarray(dt_auto),
                               np.asarray(field_dt(pb, p.u)), atol=1e-4)

    lap_auto = jax.vmap(lambda xi, ti, ir: jnp.trace(
        jax.hessian(val_fn)(xi, ti, ir), axis1=-2, axis2=-1))(x, t, pb.idx)
    np.testing.assert_allclose(np.asarray(lap_auto),
                               np.asarray(field_lap(pb, p.u)), atol=1e-4)


def test_dense_variant_includes_knn(small_rbf):
    """Dense (all-sites) evaluation == KNN evaluation when PoU support
    already restricts to the K neighbors' region (large bandwidth here
    makes them differ only by truncation; check value closeness)."""
    cfg, p = small_rbf
    x = jnp.zeros((3, 2))
    t = jnp.zeros(3)
    v_knn = field_value(point_basis(cfg, p, x, t), p.u)
    v_dense = field_value(point_basis_dense(cfg, p, x, t), p.u)
    # dense includes every site inside the PoU support; KNN keeps the
    # closest 4 — dense must dominate in magnitude of included mass
    assert v_dense.shape == v_knn.shape == (3, 3)


def test_column_ids_layout(small_rbf):
    cfg, _ = small_rbf
    idx = jnp.asarray([[2, 7]])
    cols = column_ids(cfg, idx, var=1)
    # site 2, var 1: (2*3+1)*4 .. +4
    expected = np.concatenate([np.arange(28, 32), np.arange(88, 92)])
    assert np.array_equal(np.asarray(cols)[0], expected)


@pytest.fixture(scope="module")
def tiny_vortex():
    cfg = VortexConfig(
        collocation_pts_num=64, boundary_num=32, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=400, picard_iters=2,
        vis_resolution=16, seed=3)
    return VortexModel(cfg, log=False)


def test_build_points_layout():
    cfg = VortexConfig(collocation_pts_num=10, boundary_num=8, time_num=3)
    pts = build_points(cfg, jax.random.PRNGKey(0))
    per_slice = 18
    assert pts.x.shape == (3 * per_slice, 2)
    assert len(pts.inner) == 2 * 10
    assert len(pts.neu) == 2 * 4 == len(pts.norm)
    assert len(pts.dirp) == 2 * 2
    assert len(pts.left) == 3 * 2
    assert len(pts.init) == 16
    # inlet points are on x = -1
    assert float(jnp.max(jnp.abs(pts.x[pts.left, 0] + 1.0))) < 1e-3
    # outlet points on x = +1
    assert float(jnp.max(jnp.abs(pts.x[pts.dirp, 0] - 1.0))) < 1e-3


def test_vortex_matrix_solver_reduces_residual(tiny_vortex):
    model = tiny_vortex
    A, b = jax.jit(model.assemble)(model.params.u)
    res0 = float(jnp.linalg.norm(A.mv(model.params.u.reshape(-1)) - b))
    final = model.matrix_solver()
    assert np.isfinite(final)
    assert final < res0 * 0.5


def test_vortex_solution_hits_inlet_bc(tiny_vortex):
    model = tiny_vortex
    # after matrix_solver (run in previous test on the shared fixture),
    # velocity at the inlet should approach (internal_v, 0)
    pb = point_basis(model.rbf_cfg, model.params,
                     model.pts.x[model.pts.left], model.pts.t[model.pts.left])
    from insr_pde_tpu.models.rbf import field_value
    v = field_value(pb, model.params.u)
    vx = float(jnp.mean(v[:, 0]))
    assert abs(vx - model.cfg.internal_v) < 0.5 * model.cfg.internal_v


def test_vortex_train_path_decreases_loss():
    cfg = VortexConfig(
        collocation_pts_num=32, boundary_num=16, time_num=2,
        n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, train_lr=0.05, seed=5)
    model = VortexModel(cfg, log=False)
    l0 = model.train(1)
    l1 = model.train(60)
    assert np.isfinite(l1)
    assert l1 < l0


def test_vortex_write_output(tmp_path, tiny_vortex):
    tiny_vortex.write_output(str(tmp_path), resolution=8)
    assert (tmp_path / "field.npy").exists()
    assert (tmp_path / "slice00_speed.png").exists()


def test_pou_sine_shape():
    from insr_pde_tpu.models.rbf import pou_sine
    x = jnp.asarray([-2.0, -1.25, -1.0, -0.75, 0.0, 0.75, 1.0, 1.25, 2.0])
    v = np.asarray(pou_sine(x))
    np.testing.assert_allclose(
        v, [0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 0.5, 0.0, 0.0], atol=1e-6)


def test_spatial_knn(small_rbf):
    from insr_pde_tpu.models.rbf import spatial_knn_idx
    cfg, p = small_rbf
    x = jnp.zeros((2, 2))
    idx = spatial_knn_idx(cfg, p, x)
    assert idx.shape == (2, cfg.neighbor_k)
    # nearest centers to the origin must be within the central cells
    d = jnp.linalg.norm(p.centers[idx[0]], axis=-1)
    assert float(jnp.max(d)) < 0.5


def test_vortex_matrix_solver_cg_path():
    cfg = VortexConfig(
        collocation_pts_num=32, boundary_num=16, time_num=2,
        n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=300, picard_iters=1, seed=7)
    model = VortexModel(cfg, log=False)
    res = model.matrix_solver(solver="cg")
    assert np.isfinite(res)


def test_vortex_hat_pou_mode():
    """The continuous-PoU mode (structured slice windows + hat weights)
    solves the same system; residual decreases and the inlet BC holds."""
    cfg = VortexConfig(
        collocation_pts_num=64, boundary_num=32, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=500, picard_iters=2,
        pou="hat", cgls_damp=0.01, seed=11)
    model = VortexModel(cfg, log=False)
    res = model.matrix_solver()
    assert np.isfinite(res)
    pb = model._point_basis(model.params, model.pts.x[model.pts.left],
                            model.pts.t[model.pts.left])
    v = field_value(pb, model.params.u)
    assert abs(float(jnp.mean(v[:, 0])) - 1.0) < 0.5


def test_structured_idx_distinct_at_boundaries(small_rbf):
    """Slice windows must stay DISTINCT at t=0 and t=T (an endpoint clip
    would duplicate sites and break the sparse assembly invariant)."""
    from insr_pde_tpu.models.rbf import structured_spacetime_idx
    cfg, p = small_rbf
    x = jnp.zeros((3, 2))
    for tval in (0.0, cfg.time_length / 2, cfg.time_length):
        idx = structured_spacetime_idx(cfg, p, x, jnp.full(3, tval), 2)
        row = np.asarray(idx[0])
        assert len(set(row.tolist())) == len(row), f"dup sites at t={tval}"


def test_hat_pou_derivatives_match_autodiff():
    """With hat PoUs the operator columns include dw/dx and dw/dt product
    terms; they must match differentiating the value evaluation."""
    from insr_pde_tpu.models.rbf import (RBFConfig, field_dt, field_grad,
                                         field_value, init_rbf, point_basis,
                                         structured_spacetime_idx)
    cfg = RBFConfig(dim=2, n_vars=2, n_feat=3, n_spatial_basis=16,
                    time_num=4, band_width=2.0, neighbor_k=4, seed=2,
                    pou_width=2.0 / 4)
    p = init_rbf(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 2), minval=-0.4,
                           maxval=0.4)
    t = jax.random.uniform(jax.random.PRNGKey(2), (5,), minval=0.1,
                           maxval=0.9)
    idx = structured_spacetime_idx(cfg, p, x, t, 2)

    def val(xi, ti, ir):
        pb = point_basis(cfg, p, xi[None], ti[None], idx=ir[None],
                         time_pou="hat", space_pou="hat")
        return field_value(pb, p.u)[0]

    pb = point_basis(cfg, p, x, t, idx=idx, time_pou="hat", space_pou="hat")
    jac_auto = jax.vmap(lambda a, b, c: jax.jacfwd(val)(a, b, c))(x, t, idx)
    np.testing.assert_allclose(np.asarray(jac_auto),
                               np.asarray(field_grad(pb, p.u)), atol=1e-4)
    dt_auto = jax.vmap(lambda a, b, c: jax.jacfwd(val, argnums=1)(a, b, c))(
        x, t, idx)
    np.testing.assert_allclose(np.asarray(dt_auto),
                               np.asarray(field_dt(pb, p.u)), atol=1e-4)


def test_vortex_sharded_solve_matches_single_device():
    from jax.sharding import Mesh
    cfg = VortexConfig(
        collocation_pts_num=48, boundary_num=16, time_num=2,
        n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=300, picard_iters=1,
        pou="hat", cgls_damp=0.01, seed=13)
    m1 = VortexModel(cfg, log=False)
    m1.matrix_solver()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    m2 = VortexModel(cfg, log=False, mesh=mesh)
    m2.matrix_solver()
    u1, u2 = np.asarray(m1.params.u), np.asarray(m2.params.u)
    # f32 reduction-order differences across shards on an ill-conditioned
    # under-converged system: compare relatively
    rel = np.linalg.norm(u1 - u2) / np.linalg.norm(u1)
    assert rel < 2e-2, rel


def test_second_order_derivatives_match_autodiff():
    """basis_hess / basis_dxdt (full Hessian + mixed space-time columns,
    incl. PoU product-rule terms) must match differentiating the value
    evaluation, for every PoU family."""
    from insr_pde_tpu.models.rbf import (field_dxdt, field_hess,
                                         structured_spacetime_idx)
    cfg = RBFConfig(dim=2, n_vars=2, n_feat=4, n_spatial_basis=25,
                    time_num=4, band_width=1.0, neighbor_k=4, seed=0,
                    pou_width=2.0 / 5)
    p = init_rbf(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2), minval=-0.9,
                           maxval=0.9)
    t = jax.random.uniform(jax.random.PRNGKey(2), (8,), minval=0.05,
                           maxval=0.95)
    for pou in ("simple", "hat", "smooth", "smooth2"):
        idx = structured_spacetime_idx(cfg, p, x, t, 2)
        pb2 = point_basis(cfg, p, x, t, idx=idx, time_pou=pou,
                          space_pou=pou, second=True)
        H = field_hess(pb2, p.u)
        XT = field_dxdt(pb2, p.u)

        def val(xi, ti, ir):
            pb = point_basis(cfg, p, xi[None], ti[None], idx=ir[None],
                             time_pou=pou, space_pou=pou)
            return field_value(pb, p.u)[0]

        H_auto = jax.vmap(
            lambda a, b, c: jax.jacfwd(jax.jacfwd(val))(a, b, c))(x, t, idx)
        XT_auto = jax.vmap(lambda a, b, c: jax.jacfwd(
            lambda ti: jax.jacfwd(val)(a, ti, c))(b))(x, t, idx)
        np.testing.assert_allclose(np.asarray(H_auto), np.asarray(H),
                                   atol=1e-3, err_msg=pou)
        np.testing.assert_allclose(np.asarray(XT_auto), np.asarray(XT),
                                   atol=1e-3, err_msg=pou)


def test_pou_smooth_is_c1_partition_of_unity():
    """S(x) + S(1-x) = 1 (exact PoU at unit spacing) and zero slope at the
    center and edges (the C1 property the stream formulation needs)."""
    from insr_pde_tpu.models.rbf import (pou_smooth, pou_smooth2,
                                         pou_smooth2_grad, pou_smooth2_hess,
                                         pou_smooth_grad)
    xi = jnp.linspace(0.0, 1.0, 33)
    np.testing.assert_allclose(
        np.asarray(pou_smooth(xi) + pou_smooth(1.0 - xi)), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pou_smooth2(xi) + pou_smooth2(1.0 - xi)), 1.0, atol=1e-6)
    for edge in (0.0, 1.0, -1.0):
        assert abs(float(pou_smooth_grad(jnp.asarray(edge)))) < 1e-6
        # quintic: grad AND second derivative vanish at center/edges (C2)
        assert abs(float(pou_smooth2_grad(jnp.asarray(edge)))) < 1e-6
        assert abs(float(pou_smooth2_hess(jnp.asarray(edge)))) < 1e-6


@pytest.fixture(scope="module")
def tiny_stream():
    from insr_pde_tpu.models.vortex import StreamVortexModel
    cfg = VortexConfig(
        collocation_pts_num=64, boundary_num=32, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=2000, picard_iters=2,
        pou="smooth", cgls_damp=0.0, w_bc=5.0, vis_resolution=16, seed=3)
    model = StreamVortexModel(cfg, log=False)
    model.matrix_solver()
    return model


def test_stream_continuity_is_exact_analytically(tiny_stream):
    """div u = psi_yx - psi_xy vanishes identically for the curl
    representation (basis_hess symmetry) — at arbitrary query points."""
    import insr_pde_tpu.models.vortex as V
    from insr_pde_tpu.models.rbf import field_hess
    m = tiny_stream
    x = jax.random.uniform(jax.random.PRNGKey(9), (128, 2), minval=-0.95,
                           maxval=0.95)
    t = jax.random.uniform(jax.random.PRNGKey(10), (128,), minval=0.0,
                           maxval=m.cfg.time_length)
    pb2 = m._point_basis(m.params, x, t, second=True)
    H = field_hess(pb2, m.params.u)[:, V.PSI]
    div = H[:, 1, 0] - H[:, 0, 1]          # d u0/dx0 + d u1/dx1
    scale = float(jnp.max(jnp.abs(H))) + 1e-30
    assert float(jnp.max(jnp.abs(div))) / scale < 1e-6


def test_stream_divergence_fd_beats_velocity_form(tiny_stream):
    """The independent finite-difference continuity check: the stream
    formulation must be at least an order of magnitude more
    divergence-free than the velocity formulation at the same scale
    (round-1 velocity-form measurement: relative divergence ~O(1))."""
    from insr_pde_tpu.models.vortex import relative_divergence
    m = tiny_stream
    rd_stream = relative_divergence(m, 32)
    assert rd_stream < 0.1, rd_stream

    cfg = VortexConfig(
        collocation_pts_num=64, boundary_num=32, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=2000, picard_iters=2,
        pou="smooth", cgls_damp=0.0, w_bc=5.0, vis_resolution=16, seed=3)
    mv = VortexModel(cfg, log=False)
    mv.matrix_solver()
    rd_vel = relative_divergence(mv, 32)
    assert rd_stream < 0.2 * rd_vel, (rd_stream, rd_vel)


def test_stream_train_path_decreases_loss():
    from insr_pde_tpu.models.vortex import StreamVortexModel
    cfg = VortexConfig(
        collocation_pts_num=32, boundary_num=16, time_num=2,
        n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, train_lr=0.05, pou="smooth", seed=5)
    model = StreamVortexModel(cfg, log=False)
    l0 = model.train(1)
    l1 = model.train(60)
    assert np.isfinite(l1)
    assert l1 < l0


def test_stream_write_output(tmp_path, tiny_stream):
    tiny_stream.write_output(str(tmp_path), resolution=8)
    assert (tmp_path / "field.npy").exists()
    arr = np.load(tmp_path / "field.npy")
    assert arr.shape == (3, 64, 3)  # [u, v, p] per grid point per slice


def test_block_residual_layout_matches_assembly(tiny_stream, tiny_vortex):
    """block_names_counts must tile the assembled system exactly (same row
    order as assemble()); block_residuals keys on it for diagnostics."""
    for m in (tiny_stream, tiny_vortex):
        _, b = m.assemble(m.params.u)
        counts = m.block_names_counts()
        assert sum(n for _, n in counts) == b.shape[0], m.__class__.__name__
        blocks = m.block_residuals()
        assert set(blocks) == {name for name, _ in counts}
        # the inlet data rows are nonzero (u = v, or the psi profile in
        # value-BC mode) — checks the offsets line up with the right rows
        stream_value = (getattr(m.cfg, "stream_bc", None)
                        in ("value", "both") and hasattr(m, "gauge_ids"))
        inlet_key = "inlet_psi" if stream_value else "inlet_u"
        assert blocks[inlet_key]["rhs_rms"] > 0
        assert blocks["outlet_p"]["rhs_rms"] == 0.0
        # stream value-BC modes carry the channel flux on the top wall
        # (wall_psi rows); derivative free-slip rows are homogeneous
        if stream_value:
            assert blocks["wall_psi"]["rhs_rms"] > 0
        else:
            assert blocks["free_slip"]["rhs_rms"] == 0.0


def test_stream_value_bc_solver_stays_bounded():
    """End-to-end pin of the CGLS divergence guard on the hardest small
    system we have: the psi-Dirichlet (value-BC) stream assembly with
    damping + Jacobi preconditioning. Before the best-iterate guard in
    ops/linalg.cgls, this configuration diverged outright in f32
    (|Ax-b| ~ 3.4e4 from |b| ~ 3e2 at 4000 iterations — conjugacy loss on
    the ill-conditioned normal equations); the guard must keep the
    returned iterate at least as good as the starting point."""
    from insr_pde_tpu.models.vortex import StreamVortexModel
    cfg = VortexConfig(
        collocation_pts_num=128, boundary_num=64, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=4000, picard_iters=1,
        pou="smooth", cgls_damp=0.01, cgls_precondition="on",
        w_bc=5.0, vis_resolution=16, seed=3, stream_bc="value")
    m = StreamVortexModel(cfg, log=False)
    _, b = m.assemble(m.params.u)
    res = m.matrix_solver()
    assert np.isfinite(res)
    assert res <= float(jnp.linalg.norm(b)) * 1.01, res
    vals, _ = m.sample_field(32)
    g = np.asarray(vals).reshape(vals.shape[0], 32, 32, -1)
    assert float(np.max(np.abs(g[..., :2]))) < 100.0


def test_stream_bc_both_layout_and_solve():
    """stream_bc='both' adds value AND derivative BC rows (Hermite-style
    pinning, VERDICT r2 #1); the layout map must tile the system and the
    tiny benign scene must still solve to a bounded residual."""
    from insr_pde_tpu.models.vortex import StreamVortexModel
    cfg = VortexConfig(
        collocation_pts_num=64, boundary_num=32, time_num=3,
        n_spatial_basis=25, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=1500, picard_iters=1,
        pou="smooth", cgls_damp=0.0, w_bc=5.0, vis_resolution=16, seed=3,
        stream_bc="both")
    m = StreamVortexModel(cfg, log=False)
    _, b = m.assemble(m.params.u)
    counts = m.block_names_counts()
    assert sum(n for _, n in counts) == b.shape[0]
    names = [n for n, _ in counts]
    # both families of BC rows present
    assert "wall_psi" in names and "free_slip" in names
    assert "inlet_psi" in names and "inlet_u" in names
    res = m.matrix_solver()
    assert np.isfinite(res)
    blocks = m.block_residuals()
    # the derivative inlet rows must be actively fit (residual below the
    # rhs magnitude, i.e. better than the zero field) — a tiny 25-site
    # basis cannot satisfy every block, so this is the scale-appropriate
    # check; the at-scale quality bar lives in COMPARISON.md
    assert blocks["inlet_u"]["rms"] < blocks["inlet_u"]["rhs_rms"]


def test_poly_tail_derivatives_match_autodiff():
    """The per-site polynomial tail (RBFConfig.poly, RBF-FD augmentation)
    must carry the same analytic first/second derivative chain as the
    sigmoid features, for both degrees and with PoU product-rule terms."""
    from insr_pde_tpu.models.rbf import (field_dxdt, field_hess,
                                         structured_spacetime_idx)
    for degree, norm in ((1, False), (2, True)):
        cfg = RBFConfig(dim=2, n_vars=2, n_feat=3, n_spatial_basis=25,
                        time_num=4, band_width=1.0, neighbor_k=4, seed=0,
                        pou_width=2.0 / 5, poly=degree, pou_normalize=norm)
        assert cfg.n_feat_total == cfg.n_feat + cfg.n_poly
        p = init_rbf(cfg, jax.random.PRNGKey(0))
        assert p.u.shape == (cfg.n_sites, 2, cfg.n_feat_total)
        x = jax.random.uniform(jax.random.PRNGKey(1), (6, 2), minval=-0.9,
                               maxval=0.9)
        t = jax.random.uniform(jax.random.PRNGKey(2), (6,), minval=0.05,
                               maxval=0.95)
        idx = structured_spacetime_idx(cfg, p, x, t, 2)
        pb2 = point_basis(cfg, p, x, t, idx=idx, time_pou="smooth",
                          space_pou="smooth", second=True)

        def val(xi, ti, ir):
            pb = point_basis(cfg, p, xi[None], ti[None], idx=ir[None],
                             time_pou="smooth", space_pou="smooth")
            return field_value(pb, p.u)[0]

        jac_auto = jax.vmap(lambda a, b, c: jax.jacfwd(val)(a, b, c))(
            x, t, idx)
        np.testing.assert_allclose(np.asarray(jac_auto),
                                   np.asarray(field_grad(pb2, p.u)),
                                   atol=1e-4, err_msg=f"poly={degree}")
        dt_auto = jax.vmap(
            lambda a, b, c: jax.jacfwd(val, argnums=1)(a, b, c))(x, t, idx)
        np.testing.assert_allclose(np.asarray(dt_auto),
                                   np.asarray(field_dt(pb2, p.u)),
                                   atol=1e-4, err_msg=f"poly={degree}")
        H_auto = jax.vmap(
            lambda a, b, c: jax.jacfwd(jax.jacfwd(val))(a, b, c))(x, t, idx)
        np.testing.assert_allclose(np.asarray(H_auto),
                                   np.asarray(field_hess(pb2, p.u)),
                                   atol=1e-3, err_msg=f"poly={degree}")
        XT_auto = jax.vmap(lambda a, b, c: jax.jacfwd(
            lambda ti: jax.jacfwd(val)(a, ti, c))(b))(x, t, idx)
        np.testing.assert_allclose(np.asarray(XT_auto),
                                   np.asarray(field_dxdt(pb2, p.u)),
                                   atol=1e-3, err_msg=f"poly={degree}")


def test_poly_tail_represents_linear_exactly():
    """With poly>=1 AND Shepard-normalized PoU weights a globally-linear
    field lies EXACTLY in the span everywhere (including the half-spacing
    edge strips the site grid under-covers): set each site's tail
    coefficients to the same global polynomial and the normalized
    partition of unity makes window switches cancel identically — the
    property that motivates the augmentation (the channel scene's true
    stream function is linear, and its inlet rows live in the edge
    strips)."""
    from insr_pde_tpu.models.rbf import structured_spacetime_idx
    cfg = RBFConfig(dim=2, n_vars=1, n_feat=3, n_spatial_basis=25,
                    time_num=4, band_width=1.0, neighbor_k=4, seed=0,
                    pou_width=2.0 / 5, poly=1, pou_normalize=True)
    p = init_rbf(cfg, jax.random.PRNGKey(0))
    # target f(x, y, t) = 2 + 3y. Tail features are SITE-LOCAL monomials
    # ((x - c)/bw etc.), so per-site coefficients differ: f = (2 + 3 c_y)
    # * 1 + (3 * bw) * y_rel.
    u = np.zeros((cfg.n_sites, 1, cfg.n_feat_total), np.float32)
    cy = np.asarray(p.centers)[:, 1]
    u[:, 0, cfg.n_feat + 0] = 2.0 + 3.0 * cy          # constant term
    u[:, 0, cfg.n_feat + 2] = 3.0 * cfg.band_width    # y_rel term
    u = jnp.asarray(u)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 2), minval=-0.95,
                           maxval=0.95)
    t = jax.random.uniform(jax.random.PRNGKey(2), (50,), minval=0.0,
                           maxval=1.0)
    for pou in ("smooth", "smooth2"):
        idx = structured_spacetime_idx(cfg, p, x, t, 2)
        pb = point_basis(cfg, p, x, t, idx=idx, time_pou=pou, space_pou=pou)
        vals = field_value(pb, u)[:, 0]
        np.testing.assert_allclose(np.asarray(vals),
                                   np.asarray(2.0 + 3.0 * x[:, 1]),
                                   atol=1e-5, err_msg=pou)
        g = field_grad(pb, u)[:, 0]
        np.testing.assert_allclose(np.asarray(g),
                                   np.tile([0.0, 3.0], (50, 1)),
                                   atol=1e-4, err_msg=pou)


def test_stream_normalized_channel_is_credible():
    """The round-3 channel-scene configuration (Shepard-normalized smooth
    space PoU + indicator time PoU + per-slice windows + Hermite BCs +
    block-whitened CGLS) must produce a CREDIBLE uniform channel flow at
    a well-determined small scale: inlet hit to sub-percent on every
    post-impulse slice AND bounded velocity everywhere (the unnormalized
    config measures inlet 0.34 / max|u| 206 on this exact scene — the
    boundary-strip partition-of-unity deficiency, COMPARISON.md round 3)."""
    from insr_pde_tpu.models.vortex import StreamVortexModel
    cfg = VortexConfig(rho=1.0, internal_v=1.0, n_spatial_basis=49,
                       time_num=3, collocation_pts_num=300,
                       boundary_num=120, pou="smooth", pou_time="simple",
                       time_window=1, band_width=1.0, stream_bc="both",
                       w_bc=5.0, pou_normalize=True,
                       cgls_precondition="block", cgls_maxiter=1200,
                       cgls_tol=1e-12, picard_iters=1, seed=3,
                       log_dir="/tmp/bp_log")
    m = StreamVortexModel(cfg, log=False)
    res = m.matrix_solver()
    assert np.isfinite(res)
    vals, _ = m.sample_field(32)
    g = np.asarray(vals).reshape(vals.shape[0], 32, 32, -1)
    # inlet column (x = -1), u component, post-impulse slices
    per = np.mean(np.abs(g[:, 0, :, 0] - 1.0), axis=1)
    assert float(np.mean(per[1:])) < 0.05, per
    # the flow must be bounded everywhere (no between-collocation spikes)
    speed = np.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)
    assert float(speed.max()) < 10.0, float(speed.max())


def test_vortex_sharded_chunked_block_solve_matches_single_chip():
    """mesh + cgls_chunk + block whitener together (the round-3 sharded
    production path — previously the three features excluded each other):
    the row-sharded chunked whitened solve matches the single-chip chunked
    whitened solve."""
    from jax.sharding import Mesh
    cfg = VortexConfig(
        collocation_pts_num=48, boundary_num=16, time_num=2,
        n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
        internal_v=1.0, rho=1.0, cgls_maxiter=300, picard_iters=1,
        pou="hat", cgls_damp=0.01, cgls_chunk=40,
        cgls_precondition="block", seed=13)
    m1 = VortexModel(cfg, log=False)
    m1.matrix_solver()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    m2 = VortexModel(cfg, log=False, mesh=mesh)
    m2.matrix_solver()
    u1, u2 = np.asarray(m1.params.u), np.asarray(m2.params.u)
    rel = np.linalg.norm(u1 - u2) / np.linalg.norm(u1)
    assert rel < 2e-2, rel


def test_reuse_whitener_computes_once_and_matches(monkeypatch):
    """reuse_whitener=True on a cold solve: the block eigen-whitener is
    built exactly twice (it=0's system has no convection — its W measured
    3x worse on later systems — and it=1's representative W is cached for
    it>=2), and the solve converges toward the SAME least-squares optimum,
    at a bounded rate penalty: a stale-but-full-rank W changes the CGLS
    convergence RATE, never the fixed point (measured on this system:
    1.7x residual at 3k iterations, parity by 6k, reuse ahead by 12k).
    (Iterates are NOT compared: on a rank-deficient system CGLS converges
    to the min-norm solution in the WHITENED variable, which legitimately
    depends on W — only the residual is whitener-invariant.)"""
    import insr_pde_tpu.ops.linalg as L

    calls = {"n": 0}
    real = L.block_whitener_host

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    base = dict(collocation_pts_num=48, boundary_num=16, time_num=2,
                n_spatial_basis=16, n_feat=4, neighbor_k=4, band_width=2.0,
                internal_v=1.0, rho=1.0, cgls_maxiter=3000, cgls_tol=1e-10,
                picard_iters=3, pou="hat", cgls_damp=0.0, cgls_chunk=500,
                cgls_precondition="block", seed=13)
    m1 = VortexModel(VortexConfig(**base), log=False)
    res1 = m1.matrix_solver()

    monkeypatch.setattr(L, "block_whitener_host", counting)
    m2 = VortexModel(VortexConfig(**base, reuse_whitener=True), log=False)
    res2 = m2.matrix_solver()
    assert calls["n"] == 2, calls["n"]

    assert float(res2) < 2.0 * float(res1), (res1, res2)


def test_picard_timings_log_operand_footprint():
    """Every Picard entry records the assemble->solve operand bytes and
    whether they were shipped through the host (the round-3 operand-size
    cliff diagnostic, VERDICT r3 weak #2)."""
    cfg = VortexConfig(collocation_pts_num=48, boundary_num=16, time_num=2,
                       n_spatial_basis=16, n_feat=4, neighbor_k=4,
                       band_width=2.0, internal_v=1.0, rho=1.0,
                       cgls_maxiter=60, picard_iters=1, cgls_chunk=30,
                       seed=13)
    m = VortexModel(cfg, log=False)
    m.matrix_solver()
    entry = m.picard_timings[0]
    assert entry["operand_mb"] > 0
    assert entry["host_shipped"] is False


def test_assemble_sharded_matches_single_device():
    """Per-shard row assembly (VERDICT r3 missing #3) defines the SAME
    least-squares system as the single-device assemble: row order differs
    and inert zero rows pad each block to a device multiple, but the normal
    equations A^T A x and A^T b — all CGLS sees — must agree."""
    import jax
    from jax.sharding import Mesh

    from insr_pde_tpu.models.vortex import StreamVortexModel

    cfg = VortexConfig(rho=1.0, internal_v=1.0, n_spatial_basis=25,
                       time_num=3, collocation_pts_num=150, boundary_num=60,
                       pou="smooth", pou_time="simple", time_window=1,
                       band_width=1.0, stream_bc="both", w_bc=5.0,
                       pou_normalize=True, picard_iters=1, seed=5,
                       log_dir="/tmp/asm_log")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    m1 = StreamVortexModel(cfg, log=False)
    m2 = StreamVortexModel(cfg, log=False, mesh=mesh)
    u = jnp.asarray(m1.params.u)
    ubar = u
    A1, b1 = m1.assemble(ubar)
    A2, b2 = m2.assemble_sharded(u.reshape(-1))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (A1.n_cols,))
    np.testing.assert_allclose(np.asarray(A1.rmv(A1.mv(x))),
                               np.asarray(A2.rmv(A2.mv(x))),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A1.rmv(b1)),
                               np.asarray(A2.rmv(b2)),
                               rtol=2e-4, atol=1e-5)
