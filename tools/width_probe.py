"""Grad-step throughput vs network width (VERDICT r2 weak #2: "MFU 0.55%").

The paper workload (scripts/fluid2Dtlgn.sh) trains a 3x32 SIREN — a 32-wide
matvec chain leaves the 128x128 MXU systolic array almost entirely idle by
construction, and the per-iteration decomposition (tools/overhead_probe.py,
COMPARISON.md) already showed the compiled body is ~96% value_and_grad.
This probe isolates whether low MFU is a FRAMEWORK property or a WORKLOAD
property: the same pressure-phase scan body at widths 32..256, one compiled
1000-iteration scan program per width, FLOPs from XLA's own cost model
(compiled.cost_analysis()['flops']), min-of-3 steady state.

If throughput (GFLOP/s) grows ~quadratically toward the MXU roofline while
ms/iter grows slowly, the 3x32 number is the workload's arithmetic
intensity, not a scheduling defect.

Usage: python tools/width_probe.py [--widths 32,64,128,256] [--iters 1000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=str, default="32,64,128,256")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--sr", type=int, default=128)
    ap.add_argument("--platform", type=str, default="")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    from jax.flatten_util import ravel_pytree

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel

    n = args.iters
    for width in (int(w) for w in args.widths.split(",")):
        tmp = tempfile.mkdtemp()
        cfg = Config(
            pde="fluid", proj_dir=tmp, tag=f"w{width}",
            init_cond="taylorgreen", num_hidden_layers=3,
            hidden_features=width, sample_resolution=args.sr,
            vis_resolution=16, max_n_iters=n, chunk_size=n,
            early_stop=False, backup_sources=False)
        cfg.setup_dirs()
        model = Fluid2DModel(cfg)
        loss_fn = model._pressure_loss
        params = model.fields["pressure"]
        aux = {"vel": model.fields["velocity"]}
        flat0, unravel = ravel_pytree(params)
        fixed_key = jax.random.PRNGKey(1)
        level = cfg.matmul_precision

        def total(flat):
            return sum(loss_fn(unravel(flat), fixed_key, aux).values())

        def body(c, _):
            l, g = jax.value_and_grad(total)(c)
            # keep the grad live without changing the iterate (pure
            # compute measurement; adam adds ~1% — overhead_probe)
            return c + 0.0 * g, l

        @jax.jit
        def prog(carry):
            with jax.default_matmul_precision(level):
                return jax.lax.scan(body, carry, None, length=n)

        # FLOPs per iteration from XLA's cost model on the single-step
        # program (the scan program reports the whole loop; divide once
        # compiled — some backends report -1/None: fall back to scan/iters)
        flops = None
        try:
            single = jax.jit(
                lambda c: jax.value_and_grad(total)(c)).lower(flat0)
            ca = single.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", -1.0))
            flops = f if f > 0 else None
        except Exception:
            pass
        if flops is None:
            try:
                ca = prog.lower(flat0).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                f = float(ca.get("flops", -1.0))
                flops = f / n if f > 0 else None
            except Exception:
                pass

        out = prog(flat0)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(flat0)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = min(times) / n * 1e3
        rec = {"probe": "width", "hidden": width, "pts": args.sr ** 2,
               "ms_per_iter": round(ms, 4)}
        if flops is not None:
            rec["gflop_per_iter"] = round(flops / 1e9, 3)
            rec["achieved_tflops"] = round(flops / (ms / 1e3) / 1e12, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
