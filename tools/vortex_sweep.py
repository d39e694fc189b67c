"""Config sweep for the vortex channel scene: measure BOTH acceptance
metrics (inlet relative error AND FD relative divergence — VERDICT r2 #1)
per configuration, with the f64 scipy LSQR ground truth and/or this
framework's f32 CGLS.

Each config is a JSON object of VortexConfig overrides plus:
  "name":        row label
  "formulation": "stream" | "velocity" (default stream)
  "solver":      "lsqr" (f64 host truth), "cgls" (our f32 path), or "both"

Usage:
  python tools/vortex_sweep.py --configs sweep.json [--out results.json]
  python tools/vortex_sweep.py --inline '[{"name":"a","collocation_pts_num":2000}]'

Prints one markdown table row per (config, solver); the acceptance bar is
inlet <= 1e-2 AND rel_div <= 1e-2 at reference scale (400 basis x 10
slices, rho=1000, v=8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def measure(model, resolution=64):
    """(inlet rel err, FD relative divergence, per-slice inlet err) on the
    sampled grid. The per-slice breakdown separates "the smooth time basis
    cannot jump at the impulsive start" (early slices bad, late slices
    fine) from a uniform representation failure."""
    import numpy as _np

    from insr_pde_tpu.models.vortex import relative_divergence
    vals, _ = model.sample_field(resolution)
    vals = _np.asarray(vals)
    r = resolution
    g = vals.reshape(vals.shape[0], r, r, -1)
    v = model.cfg.internal_v
    per_slice = _np.mean(_np.abs(g[:, 0, :, 0] - v), axis=1) / max(
        abs(v), 1e-30)
    inlet = float(_np.mean(per_slice[1:]))
    return inlet, relative_divergence(model, resolution), per_slice


def run_config(spec: dict, keep_fields: bool = False) -> list[dict]:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import scipy.sparse.linalg as spl

    from insr_pde_tpu.models.vortex import (StreamVortexModel, VortexConfig,
                                            VortexModel)
    from tools.vortex_truth import to_csr

    spec = dict(spec)
    name = spec.pop("name", "cfg")
    formulation = spec.pop("formulation", "stream")
    solver = spec.pop("solver", "lsqr")
    lsqr_iters = spec.pop("lsqr_iters", 20000)
    resolution = spec.pop("resolution", 64)

    defaults = dict(rho=1000.0, internal_v=8.0, pou="smooth",
                    band_width=1.0, w_bc=5.0, picard_iters=1,
                    cgls_maxiter=2000, log_dir="/tmp/vortex_sweep_log")
    defaults.update(spec)
    cfg = VortexConfig(**defaults)
    cls = StreamVortexModel if formulation == "stream" else VortexModel
    t0 = time.time()
    model = cls(cfg, log=False)
    A, b = jax.jit(lambda u, *pbs: model.assemble(u, *pbs))(
        model.params.u, *model._pbs())
    R = int(A.vals.shape[0])
    C = int(A.n_cols)
    t_asm = time.time() - t0
    log(f"{name}: system {R} x {C} (ratio {R / C:.2f}), "
        f"assemble {t_asm:.1f}s")

    out = []

    def finish(tag, x, t_solve, extra=None):
        model.params = model.params._replace(
            u=jax.numpy.asarray(np.asarray(x, np.float32)).reshape(
                model.params.u.shape))
        inlet, rel_div, per_slice = measure(model, resolution)
        blocks = {k: v["rms"] for k, v in model.block_residuals().items()}
        rec = {"name": name, "solver": tag, "formulation": formulation,
               "rows": R, "cols": C, "ratio": round(R / C, 3),
               "inlet": inlet, "rel_div": rel_div,
               "inlet_per_slice": [round(float(x), 4) for x in per_slice],
               "solve_sec": round(t_solve, 1), "blocks": blocks}
        if extra:
            rec.update(extra)
        out.append(rec)
        log(f"{name}/{tag}: inlet {inlet:.3e}  rel_div {rel_div:.3e}  "
            f"({t_solve:.0f}s)")

    if solver in ("lsqr", "both"):
        csr, b_np = to_csr(A, b)
        t0 = time.time()
        r = spl.lsqr(csr, b_np, damp=cfg.cgls_damp, iter_lim=lsqr_iters,
                     atol=1e-10, btol=1e-10)
        finish("lsqr64", r[0], time.time() - t0,
               {"lsqr_itn": int(r[2]), "lsqr_r1norm": float(r[3])})

    if solver in ("cgls", "both"):
        t0 = time.time()
        model.params = model.params._replace(
            u=jax.numpy.zeros_like(model.params.u))
        res = model.matrix_solver()
        finish("cgls32", np.asarray(model.params.u).reshape(-1),
               time.time() - t0, {"cgls_residual": float(res)})

    if keep_fields:
        out[-1]["model"] = model
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="")
    ap.add_argument("--inline", type=str, default="")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    if args.inline:
        specs = json.loads(args.inline)
    else:
        with open(args.configs) as f:
            specs = json.load(f)

    rows = []
    for spec in specs:
        try:
            rows.extend(run_config(spec))
        except Exception as e:  # keep sweeping past a failed config
            log(f"{spec.get('name', '?')}: FAILED {type(e).__name__}: {e}")

    print("\n| name | solver | rows x cols (ratio) | inlet | rel_div | "
          "sec |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['solver']} | {r['rows']} x {r['cols']} "
              f"({r['ratio']}) | {r['inlet']:.3e} | {r['rel_div']:.3e} | "
              f"{r['solve_sec']} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
