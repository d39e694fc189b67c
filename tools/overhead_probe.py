"""Decompose the fluid solve-chunk iteration cost (VERDICT r2 weak #2/#3).

The paper-scale fluid iteration measured 0.92 ms while the standalone grad
program measures ~0.1 ms — this probe bisects where the other ~85% goes by
timing lax.scan chunks of increasing body complexity, all at the reference
paper scale (sr=128 -> 16384 pts, SIREN 3x32; scripts/fluid2Dtlgn.sh):

  loss      forward-only loss evaluation
  grad      value_and_grad (the compute the MFU metric counts)
  grad_rng  + fresh collocation sample per iteration (key split + uniform)
  adam      + optax.adam update on the raveled param vector
  full      + plateau scheduler, freeze latch, per-iter scalar outputs
            (exactly Solver._step)

Each variant is ONE compiled scan program of `--iters` iterations (tunnel
dispatch latency ~20-30 ms amortizes away); timings are min-of-3 steady
state after a warmup run. Per-iteration cost differences between adjacent
rows attribute the overhead.

Usage: python tools/overhead_probe.py [--phase pressure|advect] [--iters 1000]
"""

from __future__ import annotations

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["pressure", "advect"],
                    default="pressure")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--sr", type=int, default=128)
    ap.add_argument("--platform", type=str, default="")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel
    from insr_pde_tpu.models.solver import (SolveState, plateau_init)

    tmp = tempfile.mkdtemp()
    cfg = Config(
        pde="fluid", proj_dir=tmp, tag="ovh", init_cond="taylorgreen",
        num_hidden_layers=3, hidden_features=32, sample_resolution=args.sr,
        vis_resolution=16, max_n_iters=args.iters, chunk_size=args.iters,
        early_stop=False, backup_sources=False)
    cfg.setup_dirs()
    model = Fluid2DModel(cfg)

    if args.phase == "pressure":
        loss_fn = model._pressure_loss
        params = model.fields["pressure"]
        aux = {"vel": model.fields["velocity"]}
    else:
        loss_fn = model._advect_loss
        params = model.fields["velocity"]
        aux = {"prev": model.fields["velocity"]}

    flat0, unravel = ravel_pytree(params)
    opt = optax.adam(cfg.lr)
    key0 = jax.random.PRNGKey(0)
    fixed_key = jax.random.PRNGKey(1)
    level = cfg.matmul_precision

    def total(flat, k, a):
        return sum(loss_fn(unravel(flat), k, a).values())

    n = args.iters

    def run_variant(name, body, carry0):
        @jax.jit
        def prog(carry, aux):
            with jax.default_matmul_precision(level):
                return jax.lax.scan(lambda c, _: body(c, aux), carry, None,
                                    length=n)
        out = prog(carry0, aux)          # compile + warmup
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(carry0, aux)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = min(times) / n * 1e3
        print(json.dumps({"variant": name, "ms_per_iter": round(ms, 4),
                          "sec_total": round(min(times), 3)}), flush=True)
        return ms

    # 1. loss only (fixed key)
    run_variant("loss", lambda c, a: (c, total(c, fixed_key, a)), flat0)

    # 2. grad (fixed key)
    def body_grad(c, a):
        l, g = jax.value_and_grad(total)(c, fixed_key, a)
        return c + 0.0 * g, l
    run_variant("grad", body_grad, flat0)

    # 3. grad + per-iteration RNG
    def body_gradrng(carry, a):
        c, k = carry
        k, sub = jax.random.split(k)
        l, g = jax.value_and_grad(total)(c, sub, a)
        return (c + 0.0 * g, k), l
    run_variant("grad_rng", body_gradrng, (flat0, key0))

    # 4. + adam
    def body_adam(carry, a):
        c, os_, k = carry
        k, sub = jax.random.split(k)
        l, g = jax.value_and_grad(total)(c, sub, a)
        upd, os_ = opt.update(g, os_, c)
        return (optax.apply_updates(c, upd), os_, k), l
    run_variant("adam", body_adam, (flat0, opt.init(flat0), key0))

    # 5. full Solver._step body
    from insr_pde_tpu.models.solver import Solver
    solver = Solver(loss_fn, lr=cfg.lr, max_n_iters=n, chunk_size=n,
                    early_stop=False, precision=level)
    # fresh PRNGKey per init_state: the chunk runner donates its whole input
    # state (including the key buffer), so reusing key0 would hand it a
    # deleted buffer
    state = solver.init_state(params, jax.random.PRNGKey(0))
    chunk = solver._get_chunk_fn(n)
    state2, _ = chunk(state, aux)       # compile; donates state
    jax.block_until_ready(state2)
    times = []
    for _ in range(3):
        st = solver.init_state(params, jax.random.PRNGKey(0))
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st, outs = chunk(st, aux)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    ms = min(times) / n * 1e3
    print(json.dumps({"variant": "full_solver_chunk",
                      "ms_per_iter": round(ms, 4),
                      "sec_total": round(min(times), 3)}), flush=True)


if __name__ == "__main__":
    main()
