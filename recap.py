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


def recap_vortex(argv):
    """Re-render vortex slices from a starterL coefficient checkpoint
    (the basis is deterministic from the saved config snapshot, so no
    re-solve is needed)."""
    import argparse

    ap = argparse.ArgumentParser("recap vortex")
    ap.add_argument("--ckpt", type=str, required=True,
                    help="vortex_ckpt.npz written by starterL --ckpt_path")
    ap.add_argument("-o", "--output", type=str, default="recap")
    ap.add_argument("-vr", "--vis_resolution", type=int, default=0)
    args = ap.parse_args(argv)

    from insr_pde_tpu.models.vortex import load_vortex_ckpt
    model = load_vortex_ckpt(args.ckpt)
    out = (args.output if os.path.isabs(args.output)
           else os.path.join(os.path.dirname(os.path.abspath(args.ckpt)),
                             args.output))
    model.write_output(out, resolution=args.vis_resolution)
    print(f"re-rendered {model.cfg.time_num} slices to {out}")


def main(argv=None):
    if argv and argv[0] == "vortex":
        return recap_vortex(argv[1:])
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
