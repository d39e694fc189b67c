"""1D advection with constant velocity.

TPU-native redesign of reference advection/model.py:10-111: scalar field u(x)
as a SIREN, implicit-midpoint residual per timestep, Dirichlet zero-boundary
penalty. The per-timestep solve is one compiled chunked scan (see solver.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import sample_boundary, sample_random, sample_uniform
from ..utils.viz import draw_signal1D, save_figure
from .base import BaseModel
from .examples import get_examples


class Advection1DModel(BaseModel):
    def __init__(self, cfg, mesh=None):
        super().__init__(cfg, mesh)
        self.vel = cfg.vel
        self.length = cfg.length
        self.net = self._create_field("field", 1, 1)
        self._create_field("field_prev", 1, 1)
        if not cfg.init_cond:
            raise ValueError("advection requires --init_cond (e.g. example1)")
        self.init_cond_func = get_examples(cfg.init_cond)

        # Per-device share of the collocation budget when a mesh is present
        # (total points per iteration == cfg.sample_resolution, as reference
        # advection/model.py:27).
        n_dev = 1 if mesh is None else mesh.size
        self.n_samples = max(1, self.sample_resolution // n_dev)
        self.n_boundary = max(max(self.sample_resolution // 100, 10) // n_dev, 2)

    @property
    def _trainable_fields(self):
        return {"field": self.fields["field"]}

    # ---- pure loss functions ----
    def _init_loss(self, params, key, aux):
        """MSE fit to the initial condition (reference
        advection/model.py:43-52)."""
        x = sample_random(key, self.n_samples, 1) * (self.length / 2.0)
        ref = self.init_cond_func(x)
        out = self.net.apply(params, x)
        return {"main": jnp.mean((out - ref) ** 2)}

    def _advect_loss(self, params, key, aux):
        """Implicit midpoint residual + Dirichlet zero-BC penalty
        (reference advection/model.py:68-91)."""
        k1, k2 = jax.random.split(key)
        x = sample_random(k1, self.n_samples, 1) * (self.length / 2.0)
        prev = aux["prev"]

        # stack current + previous params on a leading axis so both fields
        # evaluate as ONE batched matmul chain (2, N, ...) — halves the op
        # count of the hot step vs two separate evaluation chains
        both = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                      params, prev)

        def val_grad(p):
            f = lambda xi: self.net.apply(p, xi)
            def vg(xi):
                return f(xi), jax.jacfwd(f)(xi)[..., 0]
            return jax.vmap(vg)(x)

        vals, grads = jax.vmap(val_grad)(both)
        u, u0 = vals[0], vals[1]
        grad_u = grads[0]
        grad_u0 = jax.lax.stop_gradient(grads[1])
        fn = lambda xi: self.net.apply(params, xi)

        dudt = (u - u0) / self.dt
        main = jnp.mean((dudt + self.vel * (grad_u + grad_u0) / 2.0) ** 2)

        # hard-coded zero boundary condition on ~1% of samples, factor 1.0
        # (reference advection/model.py:84-88)
        xb = sample_boundary(k2, self.n_boundary, 1) * (self.length / 2.0)
        bc = jnp.mean(fn(xb) ** 2) * 1.0
        return {"main": main, "bc": bc}

    # ---- field sampling / outputs ----
    def sample_field(self, resolution, return_samples=False):
        """Evaluate the current field on a uniform grid (reference
        advection/model.py:29-35)."""
        grid = sample_uniform(resolution, 1) * (self.length / 2.0)
        out = self.net.apply(self.fields["field"], grid)[..., 0]
        if return_samples:
            return out, grid[..., 0]
        return out

    # ---- timestep protocol ----
    def initialize(self):
        self.begin_timestep()
        res = self._run_phase("initialize", self._init_loss,
                              self.fields["field"], aux=None,
                              vis_fn=self._vis_field)
        self.fields["field"] = res.params
        self.end_timestep()
        return res

    def step(self):
        """advection: du/dt = -(vel . grad) u (reference
        advection/model.py:62-66)."""
        self.begin_timestep()
        self.fields["field_prev"] = self.fields["field"]
        res = self._run_phase("advect", self._advect_loss,
                              self.fields["field"],
                              aux={"prev": self.fields["field_prev"]},
                              vis_fn=self._vis_field)
        self.fields["field"] = res.params
        self.end_timestep()
        return res

    def _vis_field(self, params):
        values, samples = self.sample_field(self.vis_resolution,
                                            return_samples=True)
        fig = draw_signal1D(np.asarray(samples), np.asarray(values), y_max=1.0)
        self.tb.add_figure("field", fig, global_step=self.train_step)

    def write_output(self, output_folder):
        values, samples = self.sample_field(self.vis_resolution,
                                            return_samples=True)
        values = np.asarray(values)
        samples = np.asarray(samples)
        fig = draw_signal1D(samples, values, y_max=1.0)
        save_figure(fig, os.path.join(output_folder,
                                      f"t{self.timestep:03d}.png"))
        np.savez(os.path.join(output_folder, f"t{self.timestep:03d}.npz"),
                 values)
