"""Measure the hash-grid backbone on a real workload (VERDICT r4 missing #2).

Trains the paper-scale advect1D experiment (reference scripts/advect1D.sh:
sr=5000, dt=0.05) with `--network hashgrid` vs `--network siren` and reports
per-step relative L2 against the CLOSED-FORM solution (a constant-velocity
advection of the gaussian bump: u(x, t) = u0(x - vel*t)) plus wall-clock
per step. The advection residual is first-order only, so the hash grid's
piecewise-linear interpolation is a legitimate backbone here — unlike the
fluid pressure Poisson phase, which models/fluid.py:35-43 correctly refuses.

Reference counterparts: vortex/hash_encoding.py:129-184 (present but never
imported) and base/networks.py:12-17 ('grid' raises NotImplementedError) —
this probe turns our PARITY §2.3 "real hash-grid backbone" claim into a
measured row.

Usage: python tools/hashgrid_probe.py [--platform cpu] [-T 20]
       [--iters 10000] [--networks hashgrid siren]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run_one(network: str, T: int, iters: int) -> dict:
    import jax.numpy as jnp

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel
    from insr_pde_tpu.models.examples import gaussian_like

    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(
            pde="advection", proj_dir=tmp, tag=f"hg_{network}",
            init_cond="example1", network=network,
            num_hidden_layers=2, hidden_features=20,
            sample_resolution=5000, vis_resolution=2000,
            max_n_iters=iters, chunk_size=1000, early_stop=True,
            dt=0.05, length=4.0, vel=0.25,
            vis_frequency=10 ** 9, backup_sources=False)
        cfg.setup_dirs()
        model = Advection1DModel(cfg)
        model.initialize()

        rels, secs = [], []
        for step in range(1, T + 1):
            t0 = time.perf_counter()
            model.step()
            secs.append(time.perf_counter() - t0)
            vals, xs = model.sample_field(cfg.vis_resolution,
                                          return_samples=True)
            ref = gaussian_like(xs - cfg.vel * cfg.dt * step, mu=-1.5)
            rel = float(jnp.linalg.norm(vals - ref) / jnp.linalg.norm(ref))
            rels.append(rel)
        return {
            "network": network, "T": T, "iters_per_step": iters,
            "rel_l2_first": round(rels[0], 6),
            "rel_l2_last": round(rels[-1], 6),
            "rel_l2_max": round(max(rels), 6),
            "sec_per_step_median": round(float(np.median(secs)), 3),
            "sec_first_step": round(secs[0], 3),
            "rel_l2_per_step": [round(r, 5) for r in rels],
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("-T", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--networks", nargs="+",
                    default=["hashgrid", "siren"])
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    for net in args.networks:
        print(json.dumps(run_one(net, args.T, args.iters)), flush=True)


if __name__ == "__main__":
    main()
