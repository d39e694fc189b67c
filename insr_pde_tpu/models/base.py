"""Core model protocol: timestep loop, per-phase solves, checkpoint, metrics.

TPU-native redesign of the reference BaseModel (reference:
base/baseModel.py:10-162). Differences by design:
  * fields are param pytrees in `self.fields`, not mutable nn.Modules;
    "copy weights to prev net" (e.g. fluid/model.py:64) is a pytree assignment;
  * each training phase is a cached `Solver` (compiled chunked lax.scan);
    frozen fields and per-step scalars are threaded as traced `aux` so the
    compiled program is reused every timestep;
  * device layout comes from an optional jax.sharding.Mesh (multi-chip DP/SP
    over collocation points) instead of a hard-coded cuda:0
    (base/baseModel.py:25).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..utils.ckpt import load_pytree, save_pytree
from ..utils.logging import MetricsWriter
from .networks import get_network
from .solver import Solver


class BaseModel:
    def __init__(self, cfg: Config, mesh=None):
        # per-model precision snapshot: threaded into the networks (via
        # get_network) and each phase Solver, NOT a process-global write —
        # two models with different cfg.matmul_precision stay independent
        # (ADVICE r2)
        self.matmul_precision = getattr(cfg, "matmul_precision", None)
        self.cfg = cfg
        self.dt = cfg.dt
        self.max_n_iters = cfg.max_n_iters
        self.sample_resolution = cfg.sample_resolution
        self.vis_resolution = cfg.vis_resolution
        self.timestep = -1
        self.mesh = mesh
        self.tb: Optional[MetricsWriter] = None

        # early-stop constants (reference base/baseModel.py:21-22);
        # patience/threshold/factor are configurable with reference
        # defaults (Config.plateau_*)
        self.min_lr = 1.1e-8
        self.early_stop_plateau = getattr(cfg, "plateau_patience", 500)
        self.train_step = 0

        self.key = jax.random.PRNGKey(cfg.seed)
        self.fields: Dict[str, Any] = {}   # name -> param pytree
        self.networks: Dict[str, Any] = {}  # name -> MLP module (static)
        self._solvers: Dict[str, Solver] = {}

    # ---- construction ----
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _create_field(self, name: str, in_dim: int, out_dim: int):
        """Create a network module + init params (reference
        base/baseModel.py:27-28)."""
        net = get_network(self.cfg, in_dim, out_dim)
        self.networks[name] = net
        self.fields[name] = net.init(self._next_key())
        return net

    # ---- protocol (reference base/baseModel.py:30-53) ----
    @property
    def _trainable_fields(self):
        raise NotImplementedError

    def initialize(self):
        raise NotImplementedError

    def step(self):
        raise NotImplementedError

    def write_output(self, output_folder: str):
        pass

    # ---- timestep orchestration (reference @_timestepping,
    #      base/baseModel.py:87-94) ----
    def begin_timestep(self):
        self.timestep += 1
        if self.tb is not None:
            self.tb.close()
        self.tb = MetricsWriter(
            os.path.join(self.cfg.log_dir, f"t{self.timestep:03d}"),
            write_tb=self.cfg.write_tb)

    def end_timestep(self):
        self.save_ckpt()

    # ---- training loop (reference @_training_loop,
    #      base/baseModel.py:96-135) ----
    def _run_phase(self, tag: str, loss_fn: Callable, params, aux=None,
                   vis_fn: Optional[Callable] = None):
        """Fit `params` by minimizing sum(loss_fn(params, key, aux).values()).

        Returns the optimized params. Scalars are logged per iteration; the
        optional vis_fn(params) runs every cfg.vis_frequency iterations
        (rounded to chunk boundaries), mirroring the reference's
        _vis<phase> hooks.
        """
        if tag not in self._solvers:
            self._solvers[tag] = Solver(
                loss_fn, lr=self.cfg.lr, max_n_iters=self.max_n_iters,
                chunk_size=self.cfg.chunk_size,
                early_stop=self.cfg.early_stop,
                plateau_patience=self.early_stop_plateau,
                plateau_threshold=getattr(self.cfg, "plateau_threshold", 1e-4),
                plateau_factor=getattr(self.cfg, "plateau_factor", 0.1),
                early_stop_min_lr=self.min_lr,
                mesh=self.mesh, mesh_axis=self.cfg.mesh_axis,
                debug_nan=getattr(self.cfg, "debug_nan", False),
                precision=self.matmul_precision)
        solver = self._solvers[tag]

        # Only thread a callback when an in-training vis can actually fire
        # (the reference's hooks fire every vis_frequency iterations,
        # base/baseModel.py:122-124). With vis off (no hook, no sink, or
        # vis_frequency beyond the iteration budget) a callback would still
        # cost an unravel + figure render per phase — measured as real
        # per-timestep host overhead on the tunneled TPU.
        want_vis = (vis_fn is not None and self.tb is not None
                    and self.cfg.vis_frequency <= self.max_n_iters)
        callback = None
        if want_vis:
            last_vis = [0]

            def callback(it, p, losses):
                self.train_step = it
                if (it - last_vis[0] >= self.cfg.vis_frequency
                        or last_vis[0] == 0):
                    last_vis[0] = it
                    vis_fn(p)

        result = solver.fit(params, self._next_key(), aux, callback=callback)
        self.train_step = result.n_iters

        # per-iteration scalar history -> metrics sink (one bulk write)
        if self.tb is not None:
            hist = {k: np.asarray(v) for k, v in result.history.items()}
            n = len(hist.get("main", []))
            self.tb.add_scalars_history(tag, hist,
                                        stride=max(1, n // 2000))
        return result

    # ---- checkpointing (reference base/baseModel.py:137-162) ----
    def save_ckpt(self, name: Optional[str] = None):
        if name is None:
            path = os.path.join(self.cfg.model_dir,
                                f"ckpt_step_t{self.timestep:03d}.npz")
        else:
            path = os.path.join(self.cfg.model_dir, f"ckpt_{name}.npz")
        save_pytree(path, self.fields, metadata={"timestep": self.timestep})

    def load_ckpt(self, name):
        if isinstance(name, int):
            path = os.path.join(self.cfg.model_dir,
                                f"ckpt_step_t{name:03d}.npz")
        elif name == "latest":
            steps = [
                f for f in os.listdir(self.cfg.model_dir)
                if f.startswith("ckpt_step_t") and f.endswith(".npz")]
            if not steps:
                raise FileNotFoundError(
                    f"no per-step checkpoints in {self.cfg.model_dir}")
            # numeric max, not lexicographic: 't1000' sorts before 't999'
            latest = max(steps, key=lambda f: int(f[len("ckpt_step_t"):-4]))
            path = os.path.join(self.cfg.model_dir, latest)
        else:
            path = os.path.join(self.cfg.model_dir, f"ckpt_{name}.npz")
        self.fields, meta = load_pytree(path, self.fields)
        self.timestep = int(meta["timestep"])
