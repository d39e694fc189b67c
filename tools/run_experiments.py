"""Run all 9 experiment configurations end-to-end (smoke or full): the
8 reference paper experiments plus the vortex channel scene (starterL).

SURVEY.md §7 item 7: the regression harness over the reference's scripts/
matrix. `--smoke` shrinks iteration counts/resolutions so the whole matrix
finishes in minutes (structure + numerics-finite checks); `--full` uses the
reference hyperparameters verbatim (hours; run per-experiment instead via
scripts/*.sh).

3D mesh experiments use the procedural box tet mesh unless MESH_PATH points
at a real MEDIT asset (the reference's bunny/spot meshes load unmodified).
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


def _write_box_mesh(path):
    import numpy as np

    from insr_pde_tpu.geometry import box_tet_mesh

    V, T = box_tet_mesh(3)
    with open(path, "w") as f:
        f.write(f"MeshVersionFormatted 1\nDimension 3\nVertices\n{len(V)}\n")
        for v in V:
            f.write(f"{v[0]} {v[1]} {v[2]} 1\n")
        f.write(f"Tetrahedra\n{len(T)}\n")
        for t in T:
            f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} {t[3]+1} 1\n")
        f.write("End\n")


def experiment_args(tmp, smoke: bool):
    """The 8 reference experiments (scripts/*.sh) + vortex_channel."""
    mesh = os.environ.get("MESH_PATH")
    if not mesh:
        mesh = os.path.join(tmp, "box.mesh")
        _write_box_mesh(mesh)

    def shrink(args, iters, sr=None, T=None):
        if not smoke:
            return args
        out = list(args)
        def set_flag(flag, val):
            i = out.index(flag)
            out[i + 1] = str(val)
        set_flag("--max_n_iters", iters)
        if sr is not None:
            set_flag("-sr", sr)
        if T is not None:
            set_flag("-T", T)
        return out

    ela3d_common = [
        "-sr", "20", "-vr", "2000", "-T", "20", "--dt", "0.1",
        "--max_n_iters", "20000", "--lr", "1e-4", "--dim", "3",
        "--energy", "arap", "kinematics", "collision", "external", "volume",
        "--ratio_volume", "1e3", "--ratio_collide", "1e6",
        "--ratio_kinematics", "1e0", "-f_ext_x", "0", "-f_ext_y", "0",
        "--plane_height", "-2", "--use_mesh", "1", "--mesh_path", mesh,
        "--sample_resolution_init", "8",
    ]
    return {
        "advect1D": shrink(
            ["advection", "--init_cond", "example1",
             "--num_hidden_layers", "2", "--hidden_features", "20",
             "-sr", "5000", "--dt", "0.05", "-T", "240",
             "--max_n_iters", "20000"], 300, sr=1000, T=2),
        "fluid2Dtlgn": shrink(
            ["fluid", "--init_cond", "taylorgreen",
             "--num_hidden_layers", "3", "--hidden_features", "32",
             "-sr", "128", "-vr", "32", "--dt", "0.05", "-T", "100",
             "--max_n_iters", "20000"], 200, sr=24, T=1),
        "fluid2DtlgnM": shrink(
            ["fluid", "--init_cond", "taylorgreen_multi",
             "--num_hidden_layers", "3", "--hidden_features", "32",
             "-sr", "128", "-vr", "32", "--dt", "0.05", "-T", "100",
             "--max_n_iters", "20000"], 200, sr=24, T=1),
        "elasticity2Dstretch": shrink(
            ["elasticity", "--num_hidden_layers", "3",
             "--hidden_features", "68", "-sr", "100", "-vr", "100",
             "-T", "1", "--max_n_iters", "100000", "--lr", "1e-4",
             "--dim", "2", "--energy", "arap", "constraint",
             "constraint_right", "volume", "--ratio_volume", "1e3",
             "--ratio_arap", "1e0", "--ratio_constraint", "1e4",
             "--constraint_right_offset_x", "2.0",
             "--sample_resolution_init", "20"], 300, sr=8, T=1),
        "elasticity2Dcollide": shrink(
            ["elasticity", "--num_hidden_layers", "3",
             "--hidden_features", "68", "-sr", "100", "-vr", "100",
             "-T", "20", "--dt", "0.1", "--max_n_iters", "20000",
             "--lr", "1e-5", "--dim", "2", "--energy", "arap", "kinematics",
             "collision_sphere", "external", "volume",
             "--ratio_volume", "1e3", "--ratio_arap", "2e1",
             "--ratio_collide", "1e4", "--ratio_kinematics", "1e1",
             "-f_ext_x", "0", "-f_ext_y=-2e2", "-T_ext", "2",
             "--sample_resolution_init", "20"], 300, sr=8, T=2),
        "elasticity3Dbunny": shrink(
            ["elasticity", "--num_hidden_layers", "3",
             "--hidden_features", "66", "--ratio_arap", "1e2",
             "-f_ext_z=-1e2", "-T_ext", "5"] + ela3d_common,
            200, sr=4, T=2),
        "elasticity3Dspot": shrink(
            ["elasticity", "--num_hidden_layers", "3",
             "--hidden_features", "66", "--ratio_arap", "1e2",
             "-f_ext_z=-1e2", "-T_ext", "5"] + ela3d_common,
            200, sr=4, T=2),
        "elasticity3Dlucy": shrink(
            ["elasticity", "--num_hidden_layers", "3",
             "--hidden_features", "128", "--ratio_arap", "1e3",
             "-f_ext_z=-2e1", "-T_ext", "10"] + ela3d_common,
            200, sr=4, T=2),
        # 9th: the vortex channel scene via starterL (the reference's
        # starterL.py workload, solved by the round-3 preset — its own
        # notebook concedes the scene fails; COMPARISON.md). Dispatched to
        # starterL.main, not main.main.
        "vortex_channel": (
            ["--preset", "channel", "--picard_iters", "1",
             "--n_spatial_basis", "36", "--time_num", "3",
             "--collocation", "300", "--boundary", "120",
             "--cgls_maxiter", "300", "--cgls_chunk", "150",
             "--rho", "1.0", "--internal_v", "1.0"] if smoke else
            ["--preset", "channel", "--picard_iters", "3"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", default=True)
    ap.add_argument("--full", dest="smoke", action="store_false")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated experiment names")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--proj_dir", type=str, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    import main as main_mod

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        proj = args.proj_dir or os.path.join(tmp, "exp")
        experiments = experiment_args(tmp, args.smoke)
        names = (args.only.split(",") if args.only else list(experiments))
        for name in names:
            if name == "vortex_channel":
                import starterL as starter_mod
                out_dir = os.path.join(proj, name)
                argv = experiments[name] + [
                    "--output_path", out_dir,
                    "--log_dir", os.path.join(tmp, "vortex_log")]
                t0 = time.perf_counter()
                try:
                    starter_mod.main(argv)
                    wall = time.perf_counter() - t0
                    field = np.load(os.path.join(out_dir, "field.npy"))
                    results[name] = {
                        "ok": bool(np.isfinite(field).all()),
                        "outputs": len(os.listdir(out_dir)),
                        "wall_s": round(wall, 1)}
                except (Exception, SystemExit) as e:
                    results[name] = {"ok": False, "error": repr(e)[:200]}
                print(json.dumps({name: results[name]}), flush=True)
                continue
            argv = experiments[name] + [
                "--tag", name, "--proj_dir", proj, "--no_backup",
                "--vis_frequency", "1000000000"]
            t0 = time.perf_counter()
            try:
                main_mod.main(argv)
                wall = time.perf_counter() - t0
                # sanity: outputs exist and last checkpoint is finite
                res_dir = os.path.join(proj, name, "results")
                n_out = len(os.listdir(res_dir))
                model_dir = os.path.join(proj, name, "model")
                last = sorted(os.listdir(model_dir))[-1]
                ck = np.load(os.path.join(model_dir, last))
                finite = all(np.isfinite(ck[k]).all() for k in ck.files
                             if not k.startswith("__meta__"))
                results[name] = {"ok": bool(finite), "outputs": n_out,
                                 "wall_s": round(wall, 1)}
            except (Exception, SystemExit) as e:  # keep going
                results[name] = {"ok": False, "error": repr(e)[:200]}
            print(json.dumps({name: results[name]}), flush=True)

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(json.dumps({"summary": f"{n_ok}/{len(results)} experiments ok"}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
