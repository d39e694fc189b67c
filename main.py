"""Training entry point.

Reference parity: main.py:5-29 — `python main.py {advection,fluid,elasticity}
<flags>`; t=0 fits the initial condition, t>=1 steps the PDE; outputs are
written per timestep.
"""

import json
import os
import sys
import time

from insr_pde_tpu.config import parse_args
from insr_pde_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
from insr_pde_tpu.parallel import make_mesh


def build_model(cfg, mesh=None):
    if cfg.pde == "advection":
        from insr_pde_tpu.models.advection import Advection1DModel
        return Advection1DModel(cfg, mesh)
    elif cfg.pde == "fluid":
        from insr_pde_tpu.models.fluid import Fluid2DModel
        return Fluid2DModel(cfg, mesh)
    elif cfg.pde == "elasticity":
        from insr_pde_tpu.models.elasticity import ElasticityModel
        return ElasticityModel(cfg, mesh)
    raise NotImplementedError(f"pde={cfg.pde}")


def main(argv=None):
    cfg = parse_args(argv, phase="train")
    print(cfg)
    cfg.setup_dirs()

    mesh = make_mesh(cfg.n_devices, cfg.mesh_axis)
    model = build_model(cfg, mesh)

    if cfg.pde == "fluid" and cfg.fluid_step == "split" and cfg.n_timesteps > 1:
        # Reference-parity default; the measured upgrade is one flag pair
        # away — surface it like starterL.py does for --preset channel.
        print("note: --fluid_step split is reference parity (first-order "
              "splitting bias ~6e-4/step on Taylor-Green). `--fluid_step "
              "merged2 --advect_trace rk2` measured 3x lower horizon error "
              "at 2.2x less cost/step at this budget (COMPARISON.md).")

    output_folder = os.path.join(cfg.exp_dir, "results")
    os.makedirs(output_folder, exist_ok=True)

    # resume: the reference reserves --ckpt but never wires it
    # (config.py:105); here it restores the named/latest/int checkpoint and
    # continues the timestep loop after it.
    start_t = 0
    if cfg.ckpt is not None:
        name = int(cfg.ckpt) if cfg.ckpt.lstrip("-").isdigit() else cfg.ckpt
        model.load_ckpt(name)
        start_t = model.timestep + 1
        print(f"resumed from checkpoint at timestep {model.timestep}")

    profile_ctx = None
    if cfg.profile_dir:
        import jax
        profile_ctx = jax.profiler.trace(cfg.profile_dir)
        profile_ctx.__enter__()

    timings_path = os.path.join(cfg.exp_dir, "timings.jsonl")
    try:
        for t in range(start_t, cfg.n_timesteps + 1):
            tic = time.perf_counter()
            if t == 0:
                model.initialize()
            else:
                model.step()
            dt_wall = time.perf_counter() - tic
            print(f"timestep: {t}  ({dt_wall:.2f}s)")
            with open(timings_path, "a") as f:
                f.write(json.dumps({"timestep": t, "sec": dt_wall}) + "\n")
            model.write_output(output_folder)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main(sys.argv[1:])
