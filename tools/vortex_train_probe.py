"""Vortex gradient-descent path at reference scale (VERDICT r4 missing #3).

The reference ships TWO vortex solve paths: the linear least-squares driver
(starterL.py, matrix path) and a plain Adam loop on the same residuals
(/root/reference/vortex/starterL.py:26-30 — `model.train()` per step).
Our train() parity (models/vortex.py train / residual_loss) was previously
measured only at toy scale (test_vortex.py). This probe runs it at the
matrix driver's reference scale (400 sites x 10 slices, 1000+400 pts/slice)
on the TPU and reports:

  - the loss trajectory (segment-logged, host-fetched)
  - wall-clock per iteration and total
  - final per-block residual RMS vs the matrix path's (same
    model.block_residuals() metric), run in the same process

Usage:
  python tools/vortex_train_probe.py [--train_iters 4000] [--lr 0.1]
      [--segment 250] [--compare_matrix] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from insr_pde_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser("vortex_train_probe")
    ap.add_argument("--train_iters", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--lr_min", type=float, default=None,
                    help="if set, cosine-decay the lr from --lr to this "
                         "over the iteration budget")
    ap.add_argument("--segment", type=int, default=250)
    ap.add_argument("--n_spatial_basis", type=int, default=400)
    ap.add_argument("--time_num", type=int, default=10)
    ap.add_argument("--collocation", type=int, default=1000)
    ap.add_argument("--boundary", type=int, default=400)
    ap.add_argument("--compare_matrix", action="store_true")
    ap.add_argument("--cgls_chunk", type=int, default=500)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import optax

    from insr_pde_tpu.models.vortex import VortexConfig, VortexModel

    cfg = VortexConfig(
        rho=1000.0, internal_v=8.0,
        n_spatial_basis=args.n_spatial_basis, time_num=args.time_num,
        collocation_pts_num=args.collocation, boundary_num=args.boundary,
        cgls_chunk=args.cgls_chunk, cgls_restart=bool(args.cgls_chunk),
        train_lr=args.lr, log_dir="/tmp/vortex_train_probe_log")
    model = VortexModel(cfg, log=False)
    if args.lr_min is not None:
        sched = optax.cosine_decay_schedule(
            args.lr, args.train_iters, alpha=args.lr_min / args.lr)
        model.opt = optax.adam(sched)
        model.opt_state = model.opt.init(model.params.u)

    t_start = time.time()
    done = 0
    while done < args.train_iters:
        n = min(args.segment, args.train_iters - done)
        t0 = time.time()
        loss = model.train(n)  # returns float(loss): a real host fetch
        done += n
        print(json.dumps({
            "iters": done, "loss": round(loss, 6),
            "sec_per_iter": round((time.time() - t0) / n, 4),
        }), flush=True)
    train_wall = time.time() - t_start
    train_blocks = {k: round(d["rms"], 6)
                    for k, d in model.block_residuals().items()}
    print(json.dumps({"path": "train", "iters": args.train_iters,
                      "lr": args.lr, "lr_min": args.lr_min,
                      "wall_s": round(train_wall, 1),
                      "block_rms": train_blocks}), flush=True)

    if args.compare_matrix:
        m2 = VortexModel(cfg, log=False)
        t0 = time.time()
        for _ in range(3):
            res = m2.matrix_solver()
        matrix_wall = time.time() - t0
        matrix_blocks = {k: round(d["rms"], 6)
                         for k, d in m2.block_residuals().items()}
        print(json.dumps({"path": "matrix", "picard_iters": 3,
                          "lstsq_residual": round(float(res), 4),
                          "wall_s": round(matrix_wall, 1),
                          "block_rms": matrix_blocks}), flush=True)
        ratio = {k: (round(train_blocks[k] / matrix_blocks[k], 2)
                     if matrix_blocks[k] > 1e-9 else None)
                 for k in train_blocks}
        print(json.dumps({"train_over_matrix_rms": ratio}), flush=True)


if __name__ == "__main__":
    main()
