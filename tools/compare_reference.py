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


def _stub_module(name, attrs=()):
    if name in sys.modules:
        return
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__path__ = []
    for a in attrs:
        setattr(mod, a, lambda *x, **k: (_ for _ in ()).throw(
            RuntimeError(f"stubbed {name} called")))
    sys.modules[name] = mod
    return mod


def _shim_meshio():
    """A real meshio.read shim for the reference's mesh mode
    (elasticity/model.py:77, torchgp/boundary_faces.py:27), backed by this
    framework's own MEDIT parser — the image has no meshio."""
    if "meshio" in sys.modules:
        return
    import importlib.machinery
    mod = types.ModuleType("meshio")
    mod.__spec__ = importlib.machinery.ModuleSpec("meshio", loader=None)

    def read(path):
        from insr_pde_tpu.geometry import read_mesh
        return read_mesh(path)

    mod.read = read
    sys.modules["meshio"] = mod


def _patch_torch_cpu():
    # shims/stubs for module-scope imports of the elasticity path
    # (open3d/sklearn: only PLY/figure output, never called here)
    _shim_meshio()
    o3d = _stub_module("open3d")
    if o3d is not None:
        o3d.geometry = types.SimpleNamespace(PointCloud=object)
        o3d.utility = types.SimpleNamespace(Vector3dVector=object)
        o3d.io = types.SimpleNamespace(write_point_cloud=lambda *a, **k: None)
    _stub_module("sklearn")
    import importlib.machinery
    skm = types.ModuleType("sklearn.metrics")
    skm.__spec__ = importlib.machinery.ModuleSpec("sklearn.metrics",
                                                  loader=None)
    skm.zero_one_loss = lambda *a, **k: None
    sys.modules.setdefault("sklearn.metrics", skm)
    if "sklearn" in sys.modules:
        sys.modules["sklearn"].metrics = skm

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


ELA_ENERGY = ["arap", "constraint", "constraint_right", "volume"]
# the reference's headline mesh scene (scripts/elasticity3Dbunny.sh):
# tet mesh falling onto a plane under gravity-like external force
ELA3D_ENERGY = ["arap", "kinematics", "collision", "external", "volume"]
ELA3D_KW = dict(ratio_arap=1e2, ratio_volume=1e3, ratio_collide=1e6,
                ratio_kinematics=1.0, external_force_timesteps=5,
                external_force_x=0.0, external_force_y=0.0,
                external_force_z=-100.0, plane_height=-2.0)
ELA_KW = dict(dim=2, use_mesh=False, mesh_path="",
              sample_pattern=["random", "uniform"],
              ratio_arap=1.0, ratio_volume=1e3, ratio_constraint=1e4,
              ratio_collide=1.0, ratio_kinematics=1.0,
              external_force_timesteps=0, external_force_x=0.0,
              external_force_y=0.0, external_force_z=0.0,
              constraint_right_offset_x=1.0, constraint_right_offset_y=0.0,
              constraint_right_offset_z=0.0, plane_height=-2.0,
              collide_circle_x=0.0, collide_circle_y=-2.0,
              collide_circle_z=0.0, collide_circle_radius=1.0)


def _ref_cfg(tmp, args):
    cfg = types.SimpleNamespace(
        dt=args.dt, max_n_iters=args.max_n_iters,
        sample_resolution=args.sample_resolution,
        vis_resolution=args.vis_resolution,
        network="siren", num_hidden_layers=args.num_hidden_layers,
        hidden_features=args.hidden_features, nonlinearity="sine",
        lr=args.lr, early_stop=args.early_stop, vis_frequency=10 ** 9,
        init_cond=args.init_cond, length=args.length, vel=args.vel,
        energy=list(ELA_ENERGY),
        exp_dir=os.path.join(tmp, "ref"),
        log_dir=os.path.join(tmp, "ref_log"),
        model_dir=os.path.join(tmp, "ref_model"),
        **ELA_KW,
    )
    if args.pde == "elasticity3d":
        cfg.dim = 3
        cfg.use_mesh = True
        cfg.mesh_path = args.mesh_path
        cfg.energy = list(ELA3D_ENERGY)
        for k, v in ELA3D_KW.items():
            setattr(cfg, k, v)
    os.makedirs(cfg.log_dir, exist_ok=True)
    os.makedirs(cfg.model_dir, exist_ok=True)
    return cfg


def _ela_grid(n=40):
    xs = np.linspace(-0.95, 0.95, n, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel()], axis=1)


def run_reference(args, tmp):
    sys.path.insert(0, REF_PATH)
    _patch_torch_cpu()
    import torch  # noqa: F811 (used for grids below)
    torch.manual_seed(args.seed)
    cwd = os.getcwd()
    os.chdir(REF_PATH)
    try:
        if args.pde == "advection":
            from advection import Advection1DModel as RefModel
        elif args.pde == "fluid":
            from fluid import Fluid2DModel as RefModel
        else:
            from elasticity import ElasticityModel as RefModel
        _patch_base_model_cpu()
        cfg = _ref_cfg(tmp, args)
        model = RefModel(cfg)
        if args.pde.startswith("elasticity"):
            # the reference hard-codes 500^2-point init sampling
            # (elasticity/model.py:62-70) — impractical on CPU torch
            model.sample_resolution_init = args.sample_resolution
        fields = []
        for t in range(args.n_timesteps + 1):
            if t == 0:
                model.initialize()
            else:
                model.step()
            if args.pde == "elasticity3d":
                # deformation at the normalized mesh vertices
                with torch.no_grad():
                    out = model.deformation_field(model.mesh_V[:, :3])
                fields.append(out.cpu().numpy())
            elif args.pde == "elasticity":
                grid = torch.from_numpy(_ela_grid())
                with torch.no_grad():
                    out = model.deformation_field(grid)
                fields.append(out.cpu().numpy())
            else:
                out = model.sample_field(args.vis_resolution)
                fields.append(np.asarray(out.detach().cpu().numpy()))
        if args.pde == "elasticity3d":
            fields.append(model.mesh_V.cpu().numpy())  # normalization check
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
    if args.pde == "elasticity":
        cfg.energy = list(ELA_ENERGY)
        for k, v in ELA_KW.items():
            setattr(cfg, k, v)
        cfg.sample_resolution_init = args.sample_resolution
    if args.pde == "elasticity3d":
        cfg.dim = 3
        cfg.use_mesh = True
        cfg.mesh_path = args.mesh_path
        cfg.energy = list(ELA3D_ENERGY)
        for k, v in ELA3D_KW.items():
            setattr(cfg, k, v)
        cfg.sample_resolution_init = args.sample_resolution
    if args.pde == "advection":
        from insr_pde_tpu.models.advection import Advection1DModel
        model = Advection1DModel(cfg)
    elif args.pde == "fluid":
        from insr_pde_tpu.models.fluid import Fluid2DModel
        model = Fluid2DModel(cfg)
    else:
        from insr_pde_tpu.models.elasticity import ElasticityModel
        model = ElasticityModel(cfg)
    fields = []
    for t in range(args.n_timesteps + 1):
        if t == 0:
            model.initialize()
        else:
            model.step()
        if args.pde == "elasticity3d":
            out = model.net.apply(model.fields["deformation"], model.mesh_V)
            fields.append(np.asarray(out))
        elif args.pde == "elasticity":
            import jax.numpy as jnp
            out = model.net.apply(model.fields["deformation"],
                                  jnp.asarray(_ela_grid()))
            fields.append(np.asarray(out))
        else:
            fields.append(np.asarray(model.sample_field(
                args.vis_resolution)))
    if args.pde == "elasticity3d":
        fields.append(np.asarray(model.mesh_V))  # normalization check
    return fields


def _rel(a, b):
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    den = max(0.5 * (np.linalg.norm(a) + np.linalg.norm(b)), 1e-30)
    return float(np.linalg.norm(a - b) / den)


def seed_study(args):
    """Run BOTH solvers once per seed; per timestep report the pairwise
    rel-L2 spread of each framework against itself (the RNG-basin floor —
    same code, different init/sampling streams) next to the mean
    cross-framework rel L2. If cross ~ within-framework spread, the
    remaining disagreement is basin noise, not model mismatch
    (round-1 VERDICT #7; reference RNG: base/baseModel.py torch.manual_seed
    has no analogue — each side uses its own stream per seed)."""
    seeds = [int(s) for s in args.seeds.split(",")]
    runs = {"ref": {}, "ours": {}}
    for seed in seeds:
        args.seed = seed
        with tempfile.TemporaryDirectory() as tmp:
            print(f"seed {seed}: reference (torch CPU)...", file=sys.stderr)
            r = run_reference(args, tmp)
            print(f"seed {seed}: insr_pde_tpu...", file=sys.stderr)
            o = run_ours(args, tmp)
        if args.pde == "elasticity3d":
            r.pop(), o.pop()
        runs["ref"][seed], runs["ours"][seed] = r, o

    n_steps = len(runs["ref"][seeds[0]])
    pairs = [(a, b) for i, a in enumerate(seeds) for b in seeds[i + 1:]]
    rows = []
    for t in range(n_steps):
        rr = [_rel(runs["ref"][a][t], runs["ref"][b][t]) for a, b in pairs]
        oo = [_rel(runs["ours"][a][t], runs["ours"][b][t]) for a, b in pairs]
        xx = [_rel(runs["ref"][a][t], runs["ours"][b][t])
              for a in seeds for b in seeds]
        rows.append({"timestep": t,
                     "ref_vs_ref_mean": float(np.mean(rr)),
                     "ref_vs_ref_max": float(np.max(rr)),
                     "ours_vs_ours_mean": float(np.mean(oo)),
                     "cross_mean": float(np.mean(xx)),
                     "cross_min": float(np.min(xx))})

    print(f"\n| t | ref-vs-ref (mean/max) | ours-vs-ours | "
          f"cross (mean/min) |  ({args.pde}, seeds {seeds})")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['timestep']} | {r['ref_vs_ref_mean']:.3e} / "
              f"{r['ref_vs_ref_max']:.3e} | {r['ours_vs_ours_mean']:.3e} | "
              f"{r['cross_mean']:.3e} / {r['cross_min']:.3e} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"pde": args.pde, "config": vars(args), "rows": rows},
                      f, indent=2, default=str)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pde", choices=["advection", "fluid", "elasticity",
                                      "elasticity3d"],
                    default="advection")
    ap.add_argument("--mesh_path", type=str,
                    default=os.path.join(REF_PATH,
                                         "elasticity/data/spot.mesh"),
                    help="elasticity3d: the reference's own MEDIT tet mesh")
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
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma list, e.g. 0,1,2: run BOTH sides once per "
                         "seed and report the cross-seed spread of each "
                         "framework against itself next to the "
                         "cross-framework error — separates framework "
                         "mismatch from RNG-basin noise (VERDICT r1 #7)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--cache_dir", type=str, default=None,
                    help="cache each side's field outputs to npz keyed by "
                         "(pde, side, T, iters, sr, seed) so a killed run "
                         "resumes without repeating the finished side (the "
                         "torch elasticity3d side alone is ~4 h on this "
                         "host's single core)")
    args = ap.parse_args()

    if args.init_cond is None:
        args.init_cond = ("example1" if args.pde == "advection"
                          else "taylorgreen")
    if args.pde == "elasticity":
        args.num_hidden_layers = 3
        args.hidden_features = 68
        args.sample_resolution = min(args.sample_resolution, 30)
    if args.pde == "elasticity3d":
        # scripts/elasticity3Dbunny.sh network + dt; reduced sr/iters are
        # the caller's budget choice (CPU torch runs the reference side)
        args.num_hidden_layers = 3
        args.hidden_features = 66
        args.sample_resolution = min(args.sample_resolution, 20)
        args.dt = 0.1
    if args.pde == "fluid":
        args.num_hidden_layers = 3
        args.hidden_features = 32
        args.sample_resolution = min(args.sample_resolution, 64)
        args.length, args.vel = 2.0, 0.0

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.seeds is not None:
        return seed_study(args)

    def cached(side, fn, tmp):
        if not args.cache_dir:
            return fn(args, tmp)
        os.makedirs(args.cache_dir, exist_ok=True)
        key = (f"{args.pde}_{side}_T{args.n_timesteps}"
               f"_it{args.max_n_iters}_sr{args.sample_resolution}"
               f"_seed{args.seed}")
        path = os.path.join(args.cache_dir, key + ".npz")
        if os.path.exists(path):
            print(f"  ({side}: cached, {path})", file=sys.stderr)
            d = np.load(path)
            return [d[f"a{i}"] for i in range(len(d.files))]
        out = fn(args, tmp)
        np.savez(path, **{f"a{i}": np.asarray(a) for i, a in enumerate(out)})
        return out

    with tempfile.TemporaryDirectory() as tmp:
        print(f"running reference ({args.pde}, torch CPU)...",
              file=sys.stderr)
        ref = cached("ref", run_reference, tmp)
        print("running insr_pde_tpu...", file=sys.stderr)
        ours = cached("ours", run_ours, tmp)

    if args.pde == "elasticity3d":
        # the trailing element is the normalized vertex array from each side
        vref, vours = ref.pop(), ours.pop()
        vdiff = float(np.max(np.abs(vref - vours)))
        print(f"mesh normalization max |dV|: {vdiff:.2e}", file=sys.stderr)

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
