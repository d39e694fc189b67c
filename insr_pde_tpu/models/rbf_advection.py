"""2D advection as a space-time random-basis least-squares solve.

Capability parity with the reference's `vortex/advect.ipynb` (SURVEY.md
§2.10), which drives the same sparse machinery as the vortex model for the
linear transport equation. Being linear, the whole space-time field solves in
ONE CGLS pass — no timestepping, no Picard loop:

  residual blocks:
    1. transport    du/dt + v . grad u = 0     (interior, t > 0)
    2. initial      u(x, 0) = u0(x)            (t = 0 slice)
    3. inflow       u = u0(x - v t) on the upwind boundary (all t)

Reuses the RBF basis (models/rbf.py), the PaddedSparse/CGLS stack
(ops/linalg.py), and the per-block max normalization of the vortex solver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import PaddedSparse, cgls_sparse
from .rbf import (RBFConfig, basis_dt, basis_dx, basis_val, column_ids,
                  field_value, init_rbf, point_basis,
                  structured_spacetime_idx)


@dataclass
class RBFAdvectionConfig:
    velocity: tuple = (0.5, 0.0)
    time_num: int = 8
    time_length: float = 1.0
    collocation_pts_num: int = 800
    boundary_num: int = 200
    n_spatial_basis: int = 400
    n_feat: int = 8
    neighbor_k: int = 6
    band_width: float = 10.0
    seed: int = 7
    time_window: int = 2       # slices coupled per point (see rbf.py
                               # structured_spacetime_idx)
    cgls_maxiter: int = 1500
    cgls_tol: float = 1e-10
    cgls_damp: float = 1e-2    # Tikhonov damping on column-scaled coeffs


class _Points(NamedTuple):
    x: jax.Array
    t: jax.Array
    inner: np.ndarray
    init: np.ndarray
    inflow: np.ndarray


class RBFAdvectionModel:
    """u(x, t) scalar field on [-1,1]^2 x [0, T], constant velocity."""

    def __init__(self, cfg: RBFAdvectionConfig,
                 init_cond: Callable[[jax.Array], jax.Array]):
        self.cfg = cfg
        self.init_cond = init_cond
        rbf_tmp = RBFConfig(dim=2, n_spatial_basis=cfg.n_spatial_basis)
        self.rbf_cfg = RBFConfig(
            dim=2, n_vars=1, n_feat=cfg.n_feat,
            n_spatial_basis=cfg.n_spatial_basis, time_num=cfg.time_num,
            time_length=cfg.time_length, band_width=cfg.band_width,
            neighbor_k=cfg.neighbor_k, seed=cfg.seed,
            # bilinear spatial PoU over the site-grid cell corners
            pou_width=rbf_tmp.spatial_spacing)
        key = jax.random.PRNGKey(cfg.seed)
        kb, kp = jax.random.split(key)
        self.params = init_rbf(self.rbf_cfg, kb)
        self.pts = self._build_points(kp)
        self.pb = jax.jit(self._point_basis)(self.params, self.pts.x,
                                             self.pts.t)

    def _point_basis(self, params, x, t):
        idx = structured_spacetime_idx(self.rbf_cfg, params, x, t,
                                       self.cfg.time_window)
        # hat PoUs in BOTH axes: continuous across slice windows and
        # K-neighbor switches (see rbf.py point_basis docstring)
        return point_basis(self.rbf_cfg, params, x, t, idx=idx,
                           time_pou="hat", space_pou="hat")

    def _build_points(self, key) -> _Points:
        """Space-time Monte Carlo: interior and inflow points at RANDOM
        times in (0, T] (not replicated at slice times — the residual must
        constrain the field between slices too), plus a t=0 slice carrying
        the initial condition."""
        cfg = self.cfg
        eps = 1e-4
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        n_in = cfg.collocation_pts_num * cfg.time_num
        x_in = jax.random.uniform(k1, (n_in, 2), minval=-1.0, maxval=1.0)
        t_in = jax.random.uniform(k2, (n_in,), minval=0.0,
                                  maxval=cfg.time_length)

        # upwind (inflow) boundary: the face where v points inward
        vx, vy = cfg.velocity
        m = cfg.boundary_num * cfg.time_num
        u = jax.random.uniform(k3, (m, 2))
        if abs(vx) >= abs(vy):
            lead = -1.0 if vx >= 0 else 1.0
            x_bc = jnp.stack(
                [lead + u[:, 0] * eps, u[:, 1] * 2.0 - 1.0], axis=1)
        else:
            lead = -1.0 if vy >= 0 else 1.0
            x_bc = jnp.stack(
                [u[:, 1] * 2.0 - 1.0, lead + u[:, 0] * eps], axis=1)
        t_bc = jax.random.uniform(k4, (m,), minval=0.0,
                                  maxval=cfg.time_length)

        n0 = cfg.collocation_pts_num
        x_0 = jax.random.uniform(k5, (n0, 2), minval=-1.0, maxval=1.0)
        t_0 = jnp.zeros(n0)

        x = jnp.concatenate([x_in, x_bc, x_0], axis=0)
        t = jnp.concatenate([t_in, t_bc, t_0], axis=0)
        return _Points(
            x=x, t=t,
            inner=np.arange(n_in),
            inflow=np.arange(n_in, n_in + m),
            init=np.arange(n_in + m, n_in + m + n0))

    def assemble(self, pb=None):
        cfg, pts, rcfg = self.cfg, self.pts, self.rbf_cfg
        pb = self.pb if pb is None else pb
        K, J = cfg.neighbor_k * cfg.time_window, cfg.n_feat
        KJ = K * J
        vel = jnp.asarray(cfg.velocity)

        rows_vals, rows_cols, rhs_list = [], [], []

        def add_block(vals, cols, rhs):
            scale = jnp.maximum(jnp.max(jnp.abs(vals)), 1e-30)
            rows_vals.append(vals / scale)
            rows_cols.append(cols)
            rhs_list.append(rhs / scale)

        def gather(ids):
            return jax.tree_util.tree_map(lambda a: a[ids], pb)

        # transport rows: d/dt + v . d/dx (columns via the basis operators,
        # which carry the time-PoU product rule)
        pbi = gather(pts.inner)
        conv = jnp.einsum("qkjd,d->qkj", basis_dx(pbi)[:, :, 0, :, :], vel)
        vals = (basis_dt(pbi)[:, :, 0, :] + conv).reshape(-1, KJ)
        add_block(vals, column_ids(rcfg, pbi.idx, 0),
                  jnp.zeros(vals.shape[0]))

        # initial rows: u(x, 0) = u0(x)
        pb0 = gather(pts.init)
        add_block(basis_val(pb0)[:, :, 0, :].reshape(-1, KJ),
                  column_ids(rcfg, pb0.idx, 0),
                  self.init_cond(pts.x[pts.init]))

        # inflow rows: u = u0(x - v t) (exact characteristic value)
        pbf = gather(pts.inflow)
        upwind = pts.x[pts.inflow] - vel * pts.t[pts.inflow][:, None]
        add_block(basis_val(pbf)[:, :, 0, :].reshape(-1, KJ),
                  column_ids(rcfg, pbf.idx, 0), self.init_cond(upwind))

        A = PaddedSparse(vals=jnp.concatenate(rows_vals, axis=0),
                         cols=jnp.concatenate(rows_cols, axis=0),
                         n_cols=rcfg.n_coeffs)
        return A, jnp.concatenate(rhs_list, axis=0)

    def solve(self) -> float:
        """One CGLS pass over the full space-time system; returns the final
        least-squares residual norm."""

        # pb as an argument: a closure would bake the gathered features
        # into the HLO as constants (100s of MB at reference scale), which
        # the tunneled-TPU compile path ships on every compilation
        @jax.jit
        def run(u0, pb):
            A, b = self.assemble(pb)
            # no Jacobi column scaling here: with Tikhonov damping it
            # re-amplifies weak (rarely-gathered) columns exactly where the
            # field is least constrained; per-block normalization + the
            # unit-variance random features keep columns comparable already
            x, info = cgls_sparse(A, b, u0,
                                  maxiter=self.cfg.cgls_maxiter,
                                  tol=self.cfg.cgls_tol,
                                  precondition=False,
                                  damp=self.cfg.cgls_damp)
            return x, jnp.linalg.norm(A.mv(x) - b)

        x, res = run(self.params.u.reshape(-1) * 0.0, self.pb)
        self.params = self.params._replace(
            u=x.reshape(self.params.u.shape))
        return float(res)

    def evaluate(self, x: jax.Array, t: float) -> jax.Array:
        pb = self._point_basis(self.params, x, jnp.full(x.shape[0], t))
        return field_value(pb, self.params.u)[:, 0]
