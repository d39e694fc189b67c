"""Vortex space-time RBF solver driver.

Reference parity: starterL.py:1-36 — same hyperparameters (rho=1000,
inlet velocity 8, 10 time slices, 1000 collocation + 400 boundary points,
400 spatial basis x 16 features, K=6 KNN, seed 213421), driving the
linear least-squares path and writing per-slice visualizations.
"""

import argparse

from insr_pde_tpu.models.vortex import (StreamVortexModel, VortexConfig,
                                        VortexModel)
from insr_pde_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


PRESETS = {
    # The round-3 channel-scene configuration: the measured fix for the
    # scene the reference's own notebook concedes fails (vortex.ipynb "can
    # not process the nonlinear scene"). Stream formulation (continuity
    # exact by construction), Shepard-normalized C1 space PoU + indicator
    # time PoU with per-slice windows, Hermite (value+derivative) BC rows,
    # 8x the reference collocation density (the 1x system is ~4:1
    # underdetermined; 8x makes it overdetermined), block-whitened chunked
    # CGLS. Measured at full reference scale on the TPU (COMPARISON.md
    # round 3): inlet rel err 2.9e-3, analytic divergence 2.2e-7.
    # Round 4: reuse_whitener caches the block eigen-whitener across
    # Picard iterations (3.3 s -> 0.11 s/iter) and warm_start=1.0 re-enters
    # CGLS from the previous Picard iterate — quality is unchanged down to
    # a 1000-iteration budget (67.8 s/Picard vs 143 s, inlet 3.1e-3 vs
    # 3.0e-3, analytic div 9.7e-7; COMPARISON.md "Picard cost halved").
    # cgls_maxiter stays 2000 (the measured-quality default); pass
    # --cgls_maxiter 1000 for the halved-cost configuration.
    "channel": dict(formulation="stream", pou="smooth", pou_time="simple",
                    time_window=1, band_width=1.0, stream_bc="both",
                    w_bc=5.0, pou_normalize=True, precondition="block",
                    cgls_chunk=200, cgls_restart=True, cgls_maxiter=2000,
                    collocation=8000, boundary=3200,
                    reuse_whitener=True, warm_start=1.0),
}


def main(argv=None):
    ap = argparse.ArgumentParser("starterL")
    ap.add_argument("--preset", choices=[""] + sorted(PRESETS),
                    default="",
                    help="named configuration bundle; explicit flags "
                         "override preset values. 'channel': the round-3 "
                         "reference-scale channel-scene solve (stream + "
                         "normalized PoU + 8x density; COMPARISON.md)")
    ap.add_argument("--output_path", type=str, default="./results/vortex")
    ap.add_argument("--log_dir", type=str, default="./log/vortex")
    ap.add_argument("--n_rounds", type=int, default=1,
                    help="outer rounds of matrix_solver + vis (the reference "
                         "loops forever, starterL.py:31-36)")
    ap.add_argument("--mode", choices=["matrix", "train"], default="matrix")
    ap.add_argument("--solver", choices=["cgls", "cg"], default="cgls",
                    help="matrix mode: factored normal equations (cgls) or "
                         "explicit normal-equations cg_batch (the reference "
                         "dense Vortex path)")
    ap.add_argument("--pou", choices=["simple", "hat", "smooth", "smooth2"],
                    default=None,
                    help="default: 'simple' (reference parity) for the "
                         "velocity formulation, 'smooth' for stream. "
                         "'hat' = continuous PoUs; 'smooth' = C1 PoUs "
                         "(see insr_pde_tpu/models/rbf.py). An explicit "
                         "--pou always wins (incl. 'simple' with stream — "
                         "a deliberate A/B that warns).")
    ap.add_argument("--formulation", choices=["velocity", "stream"],
                    default="velocity",
                    help="'stream': u = curl(psi) — continuity exact by "
                         "construction (insr_pde_tpu/models/vortex.py "
                         "StreamVortexModel; no reference counterpart)")
    ap.add_argument("--train_iters", type=int, default=200)
    ap.add_argument("--collocation", type=int, default=1000)
    ap.add_argument("--boundary", type=int, default=400)
    ap.add_argument("--time_num", type=int, default=10)
    ap.add_argument("--n_spatial_basis", type=int, default=400)
    ap.add_argument("--picard_iters", type=int, default=3)
    ap.add_argument("--cgls_maxiter", type=int, default=2000)
    ap.add_argument("--cgls_chunk", type=int, default=0,
                    help=">0: cap each CGLS program at this many iterations "
                         "(host sync between chunks; tunneled-TPU crash "
                         "workaround)")
    ap.add_argument("--cgls_restart", action="store_true",
                    help="with --cgls_chunk: periodic CGLS restart from the "
                         "best iterate (robust mode for ill-conditioned "
                         "stream systems)")
    ap.add_argument("--host_sync", action="store_true",
                    help="round-trip the assembled system through host "
                         "numpy between assemble and solve programs")
    ap.add_argument("--rho", type=float, default=1000.0,
                    help="reference default 1000 — note the reference's "
                         "rho=1000 impulsive-start channel is ill-conditioned "
                         "for any least-squares solver (its own notebook "
                         "concedes the scene fails); rho~1 converges")
    ap.add_argument("--internal_v", type=float, default=8.0)
    ap.add_argument("--stream_bc", choices=["value", "derivative", "both"],
                    default="value",
                    help="stream formulation wall/inlet treatment: explicit "
                         "psi Dirichlet data (default; see VortexConfig) or "
                         "u = curl(psi) derivative rows")
    ap.add_argument("--pou_time", type=str, default="",
                    help="time-axis PoU family override (''=same as --pou); "
                         "'simple' + --time_window 1 = per-slice indicator "
                         "windows (the channel preset)")
    ap.add_argument("--time_window", type=int, default=2)
    ap.add_argument("--pou_normalize", action="store_true",
                    help="Shepard-normalize the PoU weights (exact partition "
                         "of unity on the boundary strips — the round-3 "
                         "channel-scene fix)")
    ap.add_argument("--precondition", choices=["auto", "on", "off", "block"],
                    default="auto",
                    help="CGLS column scaling; 'block' = per-site eigen "
                         "whitener (ops/linalg.block_whitener)")
    ap.add_argument("--band_width", type=float, default=None,
                    help="RBF feature bandwidth (default: 10 velocity form, "
                         "1 stream form)")
    ap.add_argument("--w_bc", type=float, default=None,
                    help="BC row weight (default: 1 velocity form, 5 stream)")
    ap.add_argument("--cgls_damp", type=float, default=None,
                    help="Tikhonov damp (default: 0.01 for continuous-PoU "
                         "velocity form, else 0)")
    ap.add_argument("--outlet_v", action="store_true",
                    help="stream form: add fully-developed-outflow rows "
                         "(u_y = 0) along the outlet")
    ap.add_argument("--reuse_whitener", action="store_true",
                    help="compute the block eigen-whitener once (first "
                         "Picard iteration) and reuse it: any full-rank W "
                         "is a valid right preconditioner, and only the "
                         "momentum rows change across Picard iterations "
                         "(VortexConfig.reuse_whitener)")
    ap.add_argument("--warm_start", type=float, default=None,
                    help="scale the previous Picard iterate into each "
                         "solve's x0 (1.0 = cumulative refinement; default "
                         "0.0 = the reference's cold start per lsqr pass)")
    ap.add_argument("--rmv_gather", action="store_true",
                    help="chunked CGLS: run A^T r as a pull-style gather "
                         "over a precomputed transpose index instead of "
                         "XLA's scatter-add (same math up to f32 summation "
                         "order; ops/linalg.rmv_gather). EXPERIMENT: "
                         "measured 2.7x slower than the scatter on TPU at "
                         "reference scale (COMPARISON.md)")
    ap.add_argument("--packed_vals", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="repack the assembled coefficient blocks to the "
                         "(R, S*16) layout before the solve "
                         "(ops/linalg.BlockSparseP; identical operator "
                         "algebra). MEASURED null result for speed — the "
                         "CGLS pair is gather-index-bound, not "
                         "padded-byte-bound (COMPARISON.md spmv r5) — but "
                         "required at 16x density, where the unpacked "
                         "chain exceeds the remote compiler. Incompatible "
                         "with --rmv_gather. Default: off.")
    ap.add_argument("--ckpt_path", type=str, default="",
                    help="save the solved coefficients (+ config snapshot) "
                         "here after each round; default "
                         "<output_path>/vortex_ckpt.npz (NOT log_dir, which "
                         "is rm-overwritten on model construction). 'none' "
                         "disables.")
    ap.add_argument("--resume", type=str, default="",
                    help="load a vortex_ckpt.npz before solving (warm "
                         "resume; recap.py vortex re-renders without "
                         "solving)")
    # preset values become parser defaults so explicit flags override them
    pre, _ = ap.parse_known_args(argv)
    if pre.preset:
        ap.set_defaults(**PRESETS[pre.preset])
    args = ap.parse_args(argv)

    if args.formulation == "stream":
        # the stream function's velocity is a derivative: it needs the C1
        # PoU (hat kinks would make u jump across cells), sharper features
        # (second-derivative columns scale 1/bw^2), and the preconditioned
        # undamped CGLS. An explicitly passed --pou is honored (it used to
        # be silently coerced): 'simple' with stream is a legitimate A/B
        # of the continuity upgrade, but warn that the velocity field will
        # jump across cell boundaries.
        pou = args.pou if args.pou is not None else "smooth"
        if pou == "simple":
            print("warning: --pou simple with --formulation stream gives a "
                  "discontinuous velocity (u = grad psi across indicator-"
                  "PoU cell edges); 'smooth' is the supported default.")
        damp = args.cgls_damp if args.cgls_damp is not None else 0.0
        bw = args.band_width if args.band_width is not None else 1.0
        w_bc = args.w_bc if args.w_bc is not None else 5.0
    else:
        pou = args.pou if args.pou is not None else "simple"
        damp = (args.cgls_damp if args.cgls_damp is not None
                else 0.01 if pou in ("hat", "smooth", "smooth2") else 0.0)
        bw = args.band_width if args.band_width is not None else 10.0
        w_bc = args.w_bc if args.w_bc is not None else 1.0
    cfg = VortexConfig(
        rho=args.rho, internal_v=args.internal_v,
        collocation_pts_num=args.collocation, boundary_num=args.boundary,
        time_num=args.time_num, n_spatial_basis=args.n_spatial_basis,
        picard_iters=args.picard_iters, cgls_maxiter=args.cgls_maxiter,
        cgls_chunk=args.cgls_chunk, cgls_restart=args.cgls_restart,
        host_sync=args.host_sync,
        pou=pou, cgls_damp=damp, band_width=bw, w_bc=w_bc,
        pou_time=args.pou_time, time_window=args.time_window,
        pou_normalize=args.pou_normalize,
        cgls_precondition=args.precondition, outlet_v=args.outlet_v,
        rmv_gather=args.rmv_gather, reuse_whitener=args.reuse_whitener,
        packed_vals=bool(args.packed_vals),
        warm_start=(args.warm_start if args.warm_start is not None else 0.0),
        stream_bc=args.stream_bc, log_dir=args.log_dir)
    cls = StreamVortexModel if args.formulation == "stream" else VortexModel
    model = cls(cfg)
    if args.resume:
        model.load_ckpt(args.resume)
        print(f"resumed coefficients from {args.resume}")
    ckpt_path = (args.ckpt_path
                 or f"{args.output_path}/vortex_ckpt.npz")

    for r in range(args.n_rounds):
        print(f"round: {r}")
        if args.mode == "matrix":
            res = model.matrix_solver(solver=args.solver)
            print(f"  lstsq residual: {res:.4e}")
        else:
            loss = model.train(args.train_iters)
            print(f"  train loss: {loss:.4e}")
        if ckpt_path != "none":
            model.save_ckpt(ckpt_path)
        model.write_output(args.output_path)

    if args.formulation == "velocity":
        # The reference-parity default produces a visibly non-incompressible
        # flow on the channel scene (the reference's own notebook concedes
        # it fails); point users at the measured fix instead of leaving the
        # number buried in COMPARISON.md.
        from insr_pde_tpu.models.vortex import relative_divergence
        rdiv = relative_divergence(model)
        if rdiv > 0.1:
            print(f"note: relative divergence {rdiv:.2f} — the velocity "
                  "formulation (reference parity) cannot represent an "
                  "incompressible field on this scene. "
                  "`--preset channel` is the measured fix: stream function "
                  "+ normalized C1 PoU + 8x density, inlet rel err 2.9e-3 "
                  "and analytic divergence ~2e-7 at reference scale "
                  "(COMPARISON.md).")


if __name__ == "__main__":
    main()
