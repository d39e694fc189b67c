"""Fluid analytic golden: multi-step velocity L2 vs the exact Taylor-Green
solution at paper scale.

The reference's fluid model is INVISCID (no viscosity term anywhere in its
losses — reference fluid/model.py:72-151), and the Taylor-Green vortex whose
cells are aligned with the free-slip box is a STEADY solution of the
incompressible Euler equations: u.grad(u) = -grad(p)/rho with
p = -rho (cos 2x + cos 2y)/4. So the exact solution at every timestep IS the
initial condition (reference fluid/examples.py:17-32) — no decay; any drift
is numerical error (init-fit error + operator-splitting dissipation).

Usage:
  python tools/compare_fluid_tg.py [--timesteps 8] [--platform cpu|tpu]
      [--sr 128] [--iters 20000] [--eval_res 256]

Prints one JSON line per timestep:
  {"t": k, "rel_l2": ..., "sec": ...}
and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from insr_pde_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser("compare_fluid_tg")
    ap.add_argument("--timesteps", type=int, default=8)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--sr", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--eval_res", type=int, default=256)
    ap.add_argument("--proj_dir", type=str, default=None)
    ap.add_argument("--precision", type=str, default="highest",
                    choices=["default", "high", "highest"],
                    help="MXU pass count for the derivative chains")
    ap.add_argument("--plateau_patience", type=int, default=500)
    ap.add_argument("--plateau_threshold", type=float, default=1e-4)
    ap.add_argument("--plateau_factor", type=float, default=0.1)
    ap.add_argument("--advect_scheme", type=str, default="semilag",
                    choices=["semilag", "maccormack"])
    ap.add_argument("--advect_sobolev", type=float, default=0.0)
    ap.add_argument("--fluid_step", type=str, default="split",
                    choices=["split", "merged", "merged2"])
    ap.add_argument("--advect_trace", type=str, default="euler",
                    choices=["euler", "rk2"])
    ap.add_argument("--save_ckpt", action="store_true",
                    help="write a per-step checkpoint (base save_ckpt) so a "
                         "tunnel stall doesn't lose the horizon; needs "
                         "--proj_dir")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest per-step ckpt under "
                         "--proj_dir (RNG key stream restarts; sample draws "
                         "after the resume point differ statistically from "
                         "a continuous run)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.examples import taylorgreen_velocity
    from insr_pde_tpu.models.fluid import Fluid2DModel
    from insr_pde_tpu.ops.sampling import sample_uniform

    tmp_ctx = tempfile.TemporaryDirectory()
    proj = args.proj_dir or tmp_ctx.name
    cfg = Config(
        pde="fluid", proj_dir=proj, tag="tg_golden",
        init_cond="taylorgreen", num_hidden_layers=args.layers,
        hidden_features=args.hidden, sample_resolution=args.sr,
        vis_resolution=32, max_n_iters=args.iters, chunk_size=1000,
        early_stop=True, dt=args.dt, vis_frequency=10 ** 9,
        backup_sources=False, overwrite=True,
        matmul_precision=args.precision,
        plateau_patience=args.plateau_patience,
        plateau_threshold=args.plateau_threshold,
        plateau_factor=args.plateau_factor,
        advect_scheme=args.advect_scheme,
        advect_sobolev=args.advect_sobolev,
        fluid_step=args.fluid_step,
        advect_trace=args.advect_trace,
    )
    if args.resume:
        cfg.ckpt = "latest"  # setup_dirs must not wipe the exp dir
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)

    grid = sample_uniform(args.eval_res, 2, flatten=True)
    exact = taylorgreen_velocity(grid, rescale=True)
    exact_norm = float(jnp.linalg.norm(exact))

    @jax.jit
    def metrics(params):
        u = model.vel_net.apply(params, grid)
        rel = jnp.linalg.norm(u - exact) / exact_norm
        # best-fit amplitude of the exact TG mode: 1-alpha isolates the
        # DISSIPATIVE (amplitude-decay) part of the drift from phase/shape
        # error — semi-Lagrangian re-fitting decays the mode linearly
        alpha = jnp.vdot(u, exact).real / exact_norm ** 2
        return rel, alpha

    rows = []

    def report(k, sec):
        r, alpha = (float(v) for v in metrics(model.fields["velocity"]))
        rows.append(r)
        print(json.dumps({"t": k, "rel_l2": round(r, 6),
                          "amp": round(alpha, 6),
                          "sec": round(sec, 1)}), flush=True)

    start = 1
    if args.resume:
        model.load_ckpt("latest")
        start = model.timestep + 1
        print(json.dumps({"resumed_at": model.timestep}), flush=True)
    else:
        t0 = time.time()
        model.initialize()
        report(0, time.time() - t0)
        if args.save_ckpt:
            model.save_ckpt()
    for k in range(start, args.timesteps + 1):
        t0 = time.time()
        model.step()
        report(k, time.time() - t0)
        if args.save_ckpt:
            model.save_ckpt()

    print(json.dumps({
        "summary": "fluid_taylorgreen_analytic_golden",
        "sr": args.sr, "iters": args.iters, "dt": args.dt,
        "hidden": args.hidden, "precision": args.precision,
        "plateau": [args.plateau_patience, args.plateau_threshold,
                    args.plateau_factor],
        "advect": [args.advect_scheme, args.advect_sobolev],
        "fluid_step": args.fluid_step,
        "advect_trace": args.advect_trace,
        "rel_l2_t0": round(rows[0], 6),
        "rel_l2_final": round(rows[-1], 6),
        "rel_l2_max": round(max(rows), 6),
        "timesteps": args.timesteps,
    }))


if __name__ == "__main__":
    main()
