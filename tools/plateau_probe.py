"""Plateau-schedule study on the pressure-phase optimization stall.

Round-3 width study (COMPARISON.md) localized the fluid horizon limiter:
advect/projection fits land at ~1e-8 MSE while the pressure Poisson fit
stalls at ~8e-6 — two orders higher, scheduler-limited (the per-step drift
is width-INDEPENDENT, so capacity is ruled out). This probe attacks the
stall directly: ONE paper-scale advected velocity field (init fit + advect
phase at the reference schedule), then the pressure phase re-fit from the
same initial pressure params under candidate ReduceLROnPlateau schedules
(reference semantics: base/baseModel.py:55-62 — factor 0.1, patience 500,
rel threshold 1e-4, stop at lr<=1.1e-8).

Same RNG key stream per candidate, so the MC collocation draws are
identical and only the schedule differs.

Usage:
  python tools/plateau_probe.py [--platform cpu] [--sr 128] [--hidden 32]
      [--candidates ref,p1500,t0,f5p300,...]

Prints one JSON line per candidate:
  {"cand": ..., "final": ..., "tail_mean": ..., "best": ..., "iters": ...}
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

# name -> (lr, max_n_iters, factor, patience, threshold)
CANDIDATES = {
    # reference schedule (the measured ~8e-6 stall)
    "ref":      (1e-4, 20000, 0.1, 500, 1e-4),
    # more patience at each LR level
    "p1500":    (1e-4, 20000, 0.1, 1500, 1e-4),
    # rel-threshold 0: ANY improvement resets patience (slower decay)
    "t0":       (1e-4, 20000, 0.1, 500, 0.0),
    # gentler decay: more LR levels between 1e-4 and the 1e-8 stop floor
    "f5p300":   (1e-4, 20000, 0.5, 300, 1e-4),
    "f5p100":   (1e-4, 20000, 0.5, 100, 1e-4),
    # gentler decay with a bigger budget (decay chain is ~23 levels long)
    "f5p300x3": (1e-4, 60000, 0.5, 300, 1e-4),
    # higher entry LR, reference decay
    "lr3e4":    (3e-4, 20000, 0.1, 500, 1e-4),
    "lr1e3":    (1e-3, 20000, 0.1, 500, 1e-4),
    # higher entry LR + gentle decay
    "lr1e3f5":  (1e-3, 30000, 0.5, 200, 1e-4),
}


def main(argv=None):
    ap = argparse.ArgumentParser("plateau_probe")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--sr", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--precision", type=str, default="highest")
    ap.add_argument("--candidates", type=str, default=",".join(CANDIDATES))
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--advect_sobolev", type=float, default=0.0,
                    help="derivative-supervise the setup advect fit: the "
                         "pressure floor is the advect fit's derivative "
                         "noise, so this moves the TARGET, not the "
                         "schedule")
    ap.add_argument("--advect_scheme", type=str, default="semilag")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel
    from insr_pde_tpu.models.solver import Solver

    tmp = tempfile.mkdtemp()
    cfg = Config(
        pde="fluid", proj_dir=tmp, tag="plateau", init_cond="taylorgreen",
        num_hidden_layers=args.layers, hidden_features=args.hidden,
        sample_resolution=args.sr, vis_resolution=16, max_n_iters=20000,
        chunk_size=args.chunk, early_stop=True, dt=args.dt,
        vis_frequency=10 ** 9, backup_sources=False, overwrite=True,
        matmul_precision=args.precision,
        advect_sobolev=args.advect_sobolev, advect_scheme=args.advect_scheme)
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)

    # the ONE shared advected state (reference schedule)
    t0 = time.time()
    model.initialize()
    model.fields["velocity_prev"] = model.fields["velocity"]
    res_a = model._run_phase("advect_velocity", model._advect_loss,
                             model.fields["velocity"],
                             aux={"prev": model.fields["velocity_prev"]})
    model.fields["velocity"] = res_a.params
    print(json.dumps({"setup": "init+advect", "sec": round(time.time() - t0, 1),
                      "advect_final": res_a.final_loss}), flush=True)

    aux = {"vel": model.fields["velocity"]}
    p0 = model.fields["pressure"]
    key = jax.random.PRNGKey(7)

    for name in args.candidates.split(","):
        lr, max_it, factor, patience, threshold = CANDIDATES[name]
        solver = Solver(model._pressure_loss, lr=lr, max_n_iters=max_it,
                        chunk_size=args.chunk, early_stop=True,
                        plateau_factor=factor, plateau_patience=patience,
                        plateau_threshold=threshold,
                        precision=args.precision)
        t0 = time.time()
        res = solver.fit(p0, key, aux=aux)
        sec = time.time() - t0
        hist = np.asarray(res.history["main"])
        tail = hist[-200:] if hist.size >= 200 else hist
        print(json.dumps({
            "cand": name, "lr": lr, "max_iters": max_it,
            "factor": factor, "patience": patience, "threshold": threshold,
            "final": float(res.final_loss),
            "tail_mean": float(tail.mean()),
            "best": float(hist.min()),
            "iters": int(res.n_iters), "sec": round(sec, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
