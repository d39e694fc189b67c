"""Staged vortex-solve probe for bisecting the tunneled-TPU crash envelope.

Round 1 found the reference-scale vortex solve (assemble 35600x384 ELL +
2000-iteration CGLS) reproducibly kills the tunneled TPU worker while every
component program runs there individually and the whole pipeline runs on CPU
(CLAUDE.md). This probe runs the pipeline stage by stage with flushed
progress markers so a crash pinpoints its stage, and exposes the two
workarounds as knobs:

  --cgls_chunk N   cap each CGLS program at N iterations (host sync between)
  --host_sync      round-trip the assembled system through host numpy

Usage (scale sweep):
  python tools/vortex_probe.py --n_spatial_basis 100 --time_num 4 \
      --collocation 250 --boundary 120
  python tools/vortex_probe.py            # full reference scale (400x10)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--formulation", choices=["velocity", "stream"],
                    default="velocity")
    ap.add_argument("--n_spatial_basis", type=int, default=400)
    ap.add_argument("--time_num", type=int, default=10)
    ap.add_argument("--collocation", type=int, default=1000)
    ap.add_argument("--boundary", type=int, default=400)
    ap.add_argument("--picard_iters", type=int, default=3)
    ap.add_argument("--cgls_maxiter", type=int, default=2000)
    ap.add_argument("--cgls_chunk", type=int, default=0)
    ap.add_argument("--cgls_restart", action="store_true")
    ap.add_argument("--host_sync", action="store_true")
    ap.add_argument("--pou", default=None,
                    help="default: simple (velocity) / smooth (stream)")
    ap.add_argument("--rho", type=float, default=1000.0,
                    help="reference default 1000; its impulsive-start "
                         "channel at rho=1000 is ill-conditioned (the "
                         "reference notebook concedes the scene fails)")
    ap.add_argument("--internal_v", type=float, default=8.0)
    ap.add_argument("--damp", type=float, default=None,
                    help="override cgls_damp (default: formulation preset)")
    ap.add_argument("--precondition", choices=["auto", "on", "off", "block"],
                    default="auto")
    ap.add_argument("--w_bc", type=float, default=None)
    ap.add_argument("--w_init", type=float, default=1.0)
    ap.add_argument("--w_momentum", type=float, default=1.0)
    ap.add_argument("--w_continuity", type=float, default=1.0)
    ap.add_argument("--cgls_tol", type=float, default=1e-10)
    ap.add_argument("--band_width", type=float, default=None)
    ap.add_argument("--pou_time", default="",
                    help="time-axis PoU override ('' = same as --pou); "
                         "'simple' permits discontinuous-in-time slices "
                         "(impulsive starts)")
    ap.add_argument("--time_window", type=int, default=None,
                    help="slices coupled per query (1 = per-slice "
                         "decoupling)")
    ap.add_argument("--poly", type=int, default=0,
                    help="per-site polynomial tail degree (RBF-FD "
                         "augmentation; 0 = reference parity)")
    ap.add_argument("--outlet_v", action="store_true",
                    help="stream form: fully-developed-outflow rows "
                         "(u_y = 0 at the outlet)")
    ap.add_argument("--pou_normalize", action="store_true",
                    help="Shepard-normalize PoU weights (exact partition "
                         "of unity in the boundary strips)")
    ap.add_argument("--stream_bc", choices=["value", "derivative", "both"],
                    default="value")
    ap.add_argument("--reuse_whitener", action="store_true",
                    help="cache the block eigen-whitener across Picard "
                         "iterations (VortexConfig.reuse_whitener)")
    ap.add_argument("--warm_start", type=float, default=0.0,
                    help="scale of the previous Picard iterate used as "
                         "each solve's x0 (reference cold-starts: 0.0)")
    ap.add_argument("--packed_vals", action="store_true",
                    help="repack the assembled blocks to the (R, S*16) "
                         "layout before the solve (required at 16x "
                         "density; ops/linalg.BlockSparseP)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip_health", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="skip the 256-res divergence refinement and the "
                         "per-block residual report (sweep mode)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from insr_pde_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if not args.skip_health:
        log("health probe: tiny matmul ...")
        t0 = time.time()
        x = jnp.ones((128, 128))
        r = float(jnp.sum(x @ x))
        log(f"health OK ({r:.0f}) in {time.time() - t0:.1f}s on "
            f"{jax.devices()[0].platform}")

    from insr_pde_tpu.models.vortex import (StreamVortexModel, VortexConfig,
                                            VortexModel, relative_divergence)

    if args.formulation == "stream":
        pou = args.pou or "smooth"
        damp, bw, w_bc = 0.0, 1.0, 5.0
    else:
        pou = args.pou or "simple"
        damp = 0.01 if pou in ("hat", "smooth", "smooth2") else 0.0
        bw, w_bc = 10.0, 1.0

    if args.damp is not None:
        damp = args.damp
    if args.w_bc is not None:
        w_bc = args.w_bc
    if args.band_width is not None:
        bw = args.band_width
    cfg = VortexConfig(
        rho=args.rho, internal_v=args.internal_v,
        n_spatial_basis=args.n_spatial_basis, time_num=args.time_num,
        collocation_pts_num=args.collocation, boundary_num=args.boundary,
        picard_iters=1, cgls_maxiter=args.cgls_maxiter,
        cgls_chunk=args.cgls_chunk, cgls_restart=args.cgls_restart,
        host_sync=args.host_sync,
        pou=pou, cgls_damp=damp, band_width=bw, w_bc=w_bc,
        pou_time=args.pou_time, poly=args.poly,
        pou_normalize=args.pou_normalize, outlet_v=args.outlet_v,
        **({"time_window": args.time_window}
           if args.time_window is not None else {}),
        cgls_precondition=args.precondition, stream_bc=args.stream_bc,
        reuse_whitener=args.reuse_whitener, warm_start=args.warm_start,
        packed_vals=args.packed_vals,
        w_init=args.w_init, w_momentum=args.w_momentum,
        w_continuity=args.w_continuity, cgls_tol=args.cgls_tol,
        log_dir="/tmp/vortex_probe_log")
    cls = StreamVortexModel if args.formulation == "stream" else VortexModel

    log(f"stage 1: model init (basis + point gather) "
        f"{args.n_spatial_basis}x{args.time_num}, "
        f"{args.collocation}+{args.boundary} pts/slice ...")
    t0 = time.time()
    model = cls(cfg, log=False)
    jax.block_until_ready(model.pb.vals if hasattr(model.pb, "vals")
                          else jax.tree_util.tree_leaves(model.pb)[0])
    log(f"stage 1 OK in {time.time() - t0:.1f}s")

    for it in range(args.picard_iters):
        log(f"stage 2.{it}: assemble + solve (picard iter {it}, "
            f"chunk={args.cgls_chunk}, host_sync={args.host_sync}) ...")
        t0 = time.time()
        res = model.matrix_solver()
        log(f"stage 2.{it} OK in {time.time() - t0:.1f}s, |Ax-b| = {res:.4e}")
        for rec in getattr(model, "picard_timings", []):
            log(f"  breakdown: assemble {rec['assemble_s']}s, "
                f"whiten {rec['whiten_s']}s, solve {rec['solve_s']}s, "
                f"operand {rec['operand_mb']} MB"
                + (" (host-shipped)" if rec["host_shipped"] else ""))

    log("stage 3: sample_field + divergence + inlet metrics ...")
    t0 = time.time()
    vals, _ = model.sample_field(64)
    vals = np.asarray(vals)
    rdiv = relative_divergence(model, 64)
    umax = float(np.max(np.abs(vals[..., :2])))

    # inlet BC: u = (internal_v, 0) on the left wall for all t>0 slices
    # (vortex.py block 5); mean relative error of u_x at wall-adjacent
    # sample columns
    r = 64
    grid_vals = vals.reshape(vals.shape[0], r, r, -1)
    inlet_ux = grid_vals[:, 0, :, 0]         # x-index 0 = left wall column
    per_slice = (np.mean(np.abs(inlet_ux - args.internal_v), axis=1)
                 / max(abs(args.internal_v), 1e-30))
    inlet_err = float(np.mean(per_slice[1:]))

    # divergence h-refinement: the FD metric carries O(h^2) truncation at
    # the feature scale; a field with EXACT continuity (stream form) shows
    # rel_div -> 0 as resolution grows, while a genuinely divergent field
    # (velocity form round 1: 0.73) converges to its true value.
    rdiv_refine = {res: relative_divergence(model, res)
                   for res in ((64, 128) if args.quick else (64, 128, 256))}

    # stream formulation: continuity is analytic — measure it directly at
    # random interior space-time points (mixed-Hessian antisymmetry)
    adiv = None
    if args.formulation == "stream":
        import insr_pde_tpu.models.vortex as V
        from insr_pde_tpu.models.rbf import field_hess
        key = jax.random.PRNGKey(7)
        xq = jax.random.uniform(key, (512, 2), minval=-0.95, maxval=0.95)
        tq = jax.random.uniform(jax.random.PRNGKey(8), (512,),
                                minval=0.0, maxval=model.cfg.time_length)
        pb2 = model._point_basis(model.params, xq, tq, second=True)
        H = field_hess(pb2, model.params.u)[:, V.PSI]
        adiv = (float(jnp.max(jnp.abs(H[:, 1, 0] - H[:, 0, 1])))
                / (float(jnp.max(jnp.abs(H))) + 1e-30))

    log(f"stage 3 OK in {time.time() - t0:.1f}s; rel divergence (FD) "
        f"{rdiv:.3e}"
        + (f", analytic {adiv:.3e}" if adiv is not None else "")
        + f", inlet rel err {inlet_err:.3e}, max |u| {umax:.3f}")
    log(f"  inlet per slice: "
        + " ".join(f"{e:.3f}" for e in per_slice))
    # spike localisation: where does max |u| live? (slice, x, y indices of
    # the sampled grid) — distinguishes a corner-singularity artifact
    # (inlet/wall BC discontinuity) from a bulk representation failure
    speed = np.abs(grid_vals[..., :2]).max(axis=-1)
    s, ix, iy = np.unravel_index(int(np.argmax(speed)), speed.shape)
    log(f"  max |u| per slice: "
        + " ".join(f"{v:.1f}" for v in speed.reshape(speed.shape[0], -1)
                   .max(axis=1))
        + f"  (argmax slice {s}, grid ({ix},{iy}) of {r})")
    # interior max (3-cell margin off every wall): spikes pinned to the
    # boundary ring are the corner discontinuity, not the bulk field
    log(f"  interior max |u|: {float(speed[:, 3:-3, 3:-3].max()):.3f}")
    log(f"  rel_div vs eval resolution: "
        + " ".join(f"{res}:{v:.3e}" for res, v in rdiv_refine.items()))
    if not args.quick:
        for name, d in model.block_residuals().items():
            log(f"  block {name:12s} rms {d['rms']:.3e}  "
                f"(rhs {d['rhs_rms']:.3e})")
    log("ALL STAGES OK")


if __name__ == "__main__":
    main()
