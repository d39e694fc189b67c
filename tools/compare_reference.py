"""Golden comparison harness: run the PyTorch reference (CPU) and this
framework on the same workload, report per-timestep relative L2 field error.

This is the BASELINE.json acceptance metric ("relative L2 field error vs the
PyTorch reference"). The reference hard-codes cuda:0 (base/baseModel.py:25);
a cuda->cpu shim makes its advection/fluid paths run on the CPU torch build
(elasticity/vortex need pytorch3d/meshio, absent here). RNG streams differ
between torch and JAX, so acceptance is distributional: both solvers converge
to the same PDE solution, compared after per-step optimization
(SURVEY.md §7 "optimization-equivalence, not op-equivalence").

Usage:
  python tools/compare_reference.py --pde advection -T 5 --max_n_iters 5000
Writes a markdown table to stdout and JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

import numpy as np

REF_PATH = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _patch_torch_cpu():
    # stub pytorch3d: imported at module scope by base/networks.py:4 but
    # only used by the RBF classes, which this harness never instantiates
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        ops = types.ModuleType("pytorch3d.ops")

        def _unavailable(*a, **k):
            raise RuntimeError("pytorch3d stub: KNN not available")

        ops.knn_points = _unavailable
        ops.knn_gather = _unavailable
        p3d.ops = ops
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.ops"] = ops

    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # the reference targets an older torch whose ReduceLROnPlateau still had
    # `verbose` (base/baseModel.py:61); accept and drop it
    import torch.optim.lr_scheduler as lrs
    orig_rop = lrs.ReduceLROnPlateau
    if "verbose" not in orig_rop.__init__.__code__.co_varnames:
        class _RoP(orig_rop):
            def __init__(self, *a, verbose=False, **k):
                super().__init__(*a, **k)

        lrs.ReduceLROnPlateau = _RoP


def _patch_base_model_cpu():
    """Force the reference BaseModel's hard-coded cuda:0
    (base/baseModel.py:25) to cpu, after import, before any subclass
    instantiates networks."""
    import torch
    from base.baseModel import BaseModel

    orig_init = BaseModel.__init__

    def patched(self, cfg):
        orig_init(self, cfg)
        self.device = torch.device("cpu")

    BaseModel.__init__ = patched


def _ref_cfg(tmp, args):
    cfg = types.SimpleNamespace(
        dt=args.dt, max_n_iters=args.max_n_iters,
        sample_resolution=args.sample_resolution,
        vis_resolution=args.vis_resolution,
        network="siren", num_hidden_layers=args.num_hidden_layers,
        hidden_features=args.hidden_features, nonlinearity="sine",
        lr=args.lr, early_stop=args.early_stop, vis_frequency=10 ** 9,
        init_cond=args.init_cond, length=args.length, vel=args.vel,
        exp_dir=os.path.join(tmp, "ref"),
        log_dir=os.path.join(tmp, "ref_log"),
        model_dir=os.path.join(tmp, "ref_model"),
    )
    os.makedirs(cfg.log_dir, exist_ok=True)
    os.makedirs(cfg.model_dir, exist_ok=True)
    return cfg


def run_reference(args, tmp):
    sys.path.insert(0, REF_PATH)
    _patch_torch_cpu()
    import torch
    torch.manual_seed(args.seed)
    cwd = os.getcwd()
    os.chdir(REF_PATH)
    try:
        if args.pde == "advection":
            from advection import Advection1DModel as RefModel
        else:
            from fluid import Fluid2DModel as RefModel
        _patch_base_model_cpu()
        cfg = _ref_cfg(tmp, args)
        model = RefModel(cfg)
        fields = []
        for t in range(args.n_timesteps + 1):
            if t == 0:
                model.initialize()
            else:
                model.step()
            out = model.sample_field(args.vis_resolution)
            fields.append(np.asarray(out.detach().cpu().numpy()))
        return fields
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_PATH)


def run_ours(args, tmp):
    from insr_pde_tpu.config import Config

    cfg = Config(
        pde=args.pde, proj_dir=os.path.join(tmp, "ours"), tag="cmp",
        init_cond=args.init_cond, num_hidden_layers=args.num_hidden_layers,
        hidden_features=args.hidden_features,
        sample_resolution=args.sample_resolution,
        vis_resolution=args.vis_resolution, max_n_iters=args.max_n_iters,
        chunk_size=min(1000, args.max_n_iters), lr=args.lr,
        early_stop=args.early_stop, dt=args.dt, length=args.length,
        vel=args.vel, vis_frequency=10 ** 9, backup_sources=False,
        seed=args.seed,
    )
    cfg.setup_dirs()
    if args.pde == "advection":
        from insr_pde_tpu.models.advection import Advection1DModel
        model = Advection1DModel(cfg)
    else:
        from insr_pde_tpu.models.fluid import Fluid2DModel
        model = Fluid2DModel(cfg)
    fields = []
    for t in range(args.n_timesteps + 1):
        if t == 0:
            model.initialize()
        else:
            model.step()
        fields.append(np.asarray(model.sample_field(args.vis_resolution)))
    return fields


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pde", choices=["advection", "fluid"],
                    default="advection")
    ap.add_argument("-T", "--n_timesteps", type=int, default=5)
    ap.add_argument("--max_n_iters", type=int, default=5000)
    ap.add_argument("--sample_resolution", type=int, default=1000)
    ap.add_argument("--vis_resolution", type=int, default=200)
    ap.add_argument("--num_hidden_layers", type=int, default=2)
    ap.add_argument("--hidden_features", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--length", type=float, default=4.0)
    ap.add_argument("--vel", type=float, default=0.25)
    ap.add_argument("--init_cond", type=str, default=None)
    ap.add_argument("--early_stop", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    if args.init_cond is None:
        args.init_cond = ("example1" if args.pde == "advection"
                          else "taylorgreen")
    if args.pde == "fluid":
        args.num_hidden_layers = 3
        args.hidden_features = 32
        args.sample_resolution = min(args.sample_resolution, 64)
        args.length, args.vel = 2.0, 0.0

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    with tempfile.TemporaryDirectory() as tmp:
        print(f"running reference ({args.pde}, torch CPU)...",
              file=sys.stderr)
        ref = run_reference(args, tmp)
        print("running insr_pde_tpu...", file=sys.stderr)
        ours = run_ours(args, tmp)

    rows = []
    for t, (a, b) in enumerate(zip(ref, ours)):
        a, b = a.reshape(-1), np.asarray(b).reshape(-1)
        rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30))
        rows.append({"timestep": t, "rel_l2": rel})

    print(f"\n| timestep | relative L2 ({args.pde}) |")
    print("|---|---|")
    for r in rows:
        print(f"| {r['timestep']} | {r['rel_l2']:.4e} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"pde": args.pde, "config": vars(args), "rows": rows},
                      f, indent=2, default=str)


if __name__ == "__main__":
    main()
