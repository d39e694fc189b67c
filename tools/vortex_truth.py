"""Ground-truth discriminator for the stream-form inlet miss.

Assembles the stream-function channel system at a given scale, converts the
PaddedSparse ELL operator to scipy CSR, and solves the SAME damped least
squares with scipy's LSQR at a large iteration budget (host float64) — the
true LS solution, independent of our CGLS implementation. Then evaluates the
inlet error of BOTH solutions. If scipy's solution satisfies the inlet and
CGLS's does not, the miss is solver convergence; if neither does, the miss
is in the model/weights (representation or block scaling).

Usage:
  python tools/vortex_truth.py --n_spatial_basis 100 --time_num 4 \
      --collocation 250 --boundary 120 --rho 1 --internal_v 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def inlet_error(model, resolution=64):
    vals, _ = model.sample_field(resolution)
    vals = np.asarray(vals)
    r = resolution
    g = vals.reshape(vals.shape[0], r, r, -1)
    ux = g[1:, 0, :, 0]
    v = model.cfg.internal_v
    return float(np.mean(np.abs(ux - v)) / max(abs(v), 1e-30))


def to_csr(A, b):
    """ELL/block-ELL operator -> scipy CSR (float64).

    Handles both PaddedSparse (vals (R, NNZ), scalar cols) and BlockSparse
    (vals (R, S, J), block cols: scalar column = block_id * J + j)."""
    import scipy.sparse as sp

    vals = np.asarray(A.vals, dtype=np.float64)
    b_np = np.asarray(b, dtype=np.float64)
    if vals.ndim == 3:                       # BlockSparse
        R, S, J = vals.shape
        cols = (np.asarray(A.cols)[:, :, None] * J
                + np.arange(J)[None, None, :])
        nnz = S * J
        vals = vals.reshape(R, nnz)
        cols = cols.reshape(R, nnz)
    else:
        R, nnz = vals.shape
        cols = np.asarray(A.cols)
    indptr = np.arange(R + 1) * nnz
    csr = sp.csr_matrix((vals.reshape(-1), cols.reshape(-1), indptr),
                        shape=(R, A.n_cols))
    return csr, b_np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_spatial_basis", type=int, default=100)
    ap.add_argument("--time_num", type=int, default=4)
    ap.add_argument("--collocation", type=int, default=250)
    ap.add_argument("--boundary", type=int, default=120)
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--internal_v", type=float, default=2.0)
    ap.add_argument("--damp", type=float, default=0.0)
    ap.add_argument("--w_bc", type=float, default=5.0)
    ap.add_argument("--band_width", type=float, default=1.0)
    ap.add_argument("--lsqr_iters", type=int, default=40000)
    ap.add_argument("--cgls_maxiter", type=int, default=2000)
    ap.add_argument("--stream_bc", choices=["value", "derivative", "both"],
                    default="value")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from insr_pde_tpu.models.vortex import StreamVortexModel, VortexConfig

    cfg = VortexConfig(
        rho=args.rho, internal_v=args.internal_v,
        n_spatial_basis=args.n_spatial_basis, time_num=args.time_num,
        collocation_pts_num=args.collocation, boundary_num=args.boundary,
        picard_iters=1, cgls_maxiter=args.cgls_maxiter,
        pou="smooth", cgls_damp=args.damp,
        cgls_precondition="on" if args.damp > 0 else "auto",
        band_width=args.band_width, w_bc=args.w_bc,
        stream_bc=args.stream_bc, log_dir="/tmp/vortex_truth_log")
    model = StreamVortexModel(cfg, log=False)

    log("assemble ...")
    A, b = jax.jit(lambda u, *pbs: model.assemble(u, *pbs))(
        model.params.u, *model._pbs())
    csr, b_np = to_csr(A, b)
    log(f"system: {csr.shape[0]} x {csr.shape[1]}, nnz "
        f"{csr.nnz}, |b| = {np.linalg.norm(b_np):.4e}")

    log(f"scipy LSQR (float64, damp={args.damp}, "
        f"iters<={args.lsqr_iters}) ...")
    t0 = time.time()
    out = spl.lsqr(csr, b_np, damp=args.damp, iter_lim=args.lsqr_iters,
                   atol=1e-10, btol=1e-10)
    x64, istop, itn, r1norm = out[0], out[1], out[2], out[3]
    log(f"LSQR done in {time.time() - t0:.1f}s: istop={istop}, itn={itn}, "
        f"|Ax-b| = {r1norm:.4e}")

    log(f"our CGLS (maxiter {args.cgls_maxiter}) ...")
    res = model.matrix_solver()
    log(f"CGLS |Ax-b| = {res:.4e}")
    err_cgls = inlet_error(model)
    blocks_cgls = {k: v["rms"] for k, v in model.block_residuals().items()}

    # swap in the scipy solution and re-measure
    import jax.numpy as jnp
    model.params = model.params._replace(
        u=jnp.asarray(x64, dtype=jnp.float32).reshape(model.params.u.shape))
    err_lsqr = inlet_error(model)
    blocks_lsqr = {k: v["rms"] for k, v in model.block_residuals().items()}

    log(f"inlet rel err: CGLS {err_cgls:.3e}  vs  true-LS {err_lsqr:.3e}")
    log("per-block rms (cgls / true-LS):")
    for k in blocks_cgls:
        log(f"  {k:12s} {blocks_cgls[k]:.3e} / {blocks_lsqr[k]:.3e}")


if __name__ == "__main__":
    main()
