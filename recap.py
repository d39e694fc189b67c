"""Recap entry point: re-render per-timestep outputs from saved checkpoints.

Reference parity: recap.py:5-25 — restores the training-time config from the
experiment dir's config.json, reloads each per-timestep checkpoint, and calls
`write_output` (no re-training). Works for all PDE models (the reference
covers advection/fluid only).
"""

import os
import sys

from insr_pde_tpu.config import parse_args
from insr_pde_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
from main import build_model


def main(argv=None):
    cfg = parse_args(argv, phase="recap")
    print(cfg)

    model = build_model(cfg)

    output_folder = os.path.join(cfg.exp_dir, cfg.output)
    os.makedirs(output_folder, exist_ok=True)

    for t in range(cfg.n_timesteps + 1):
        try:
            model.load_ckpt(t)
        except FileNotFoundError:
            print(f"checkpoint for timestep {t} not found; stopping.")
            break
        print(f"timestep: {t}")
        model.write_output(output_folder)


if __name__ == "__main__":
    main(sys.argv[1:])
