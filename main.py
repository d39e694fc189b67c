"""Training entry point.

Reference parity: main.py:5-29 — `python main.py {advection,fluid,elasticity}
<flags>`; t=0 fits the initial condition, t>=1 steps the PDE; outputs are
written per timestep.
"""

import os
import sys
import time

from insr_pde_tpu.config import parse_args
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

    output_folder = os.path.join(cfg.exp_dir, "results")
    os.makedirs(output_folder, exist_ok=True)

    for t in range(cfg.n_timesteps + 1):
        tic = time.perf_counter()
        if t == 0:
            model.initialize()
        else:
            model.step()
        dt_wall = time.perf_counter() - tic
        print(f"timestep: {t}  ({dt_wall:.2f}s)")
        model.write_output(output_folder)


if __name__ == "__main__":
    main(sys.argv[1:])
