"""End-to-end CLI tests (train / resume / recap) on the CPU platform."""

import json
import os

import numpy as np

import main as main_mod
import recap as recap_mod


def _adv_args(tmp, extra=()):
    return ["advection", "--tag", "cli_adv", "--proj_dir", str(tmp),
            "--init_cond", "example1", "--num_hidden_layers", "2",
            "--hidden_features", "16", "-sr", "200", "--dt", "0.05",
            "--max_n_iters", "60", "--chunk_size", "30",
            "--no-early_stop", "--no_backup"] + list(extra)


def test_train_resume_recap_roundtrip(tmp_path):
    exp = tmp_path / "cli_adv"

    # train t=0..1
    main_mod.main(_adv_args(tmp_path, ["-T", "1"]))
    assert (exp / "model" / "ckpt_step_t001.npz").exists()
    assert (exp / "results" / "t001.npz").exists()
    with open(exp / "timings.jsonl") as f:
        assert len(f.readlines()) == 2

    # resume from latest and continue to t=3 (exp dir must not be wiped)
    main_mod.main(_adv_args(tmp_path, ["-T", "3", "--ckpt", "latest"]))
    assert (exp / "model" / "ckpt_step_t003.npz").exists()
    assert (exp / "results" / "t001.npz").exists()  # not wiped

    # recap re-renders outputs from checkpoints
    recap_mod.main(["advection", "--tag", "cli_adv",
                    "--proj_dir", str(tmp_path)])
    for t in range(4):
        assert (exp / "recap" / f"t{t:03d}.npz").exists()
    a = np.load(exp / "results" / "t003.npz")["arr_0"]
    b = np.load(exp / "recap" / "t003.npz")["arr_0"]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_config_json_snapshot(tmp_path):
    main_mod.main(_adv_args(tmp_path, ["-T", "0"]))
    with open(tmp_path / "cli_adv" / "config.json") as f:
        snap = json.load(f)
    assert snap["pde"] == "advection"
    assert snap["hidden_features"] == 16


def test_plateau_knobs_thread_to_solver(tmp_path):
    """--plateau_patience/threshold/factor reach the phase Solver (defaults
    are the reference's hard-coded torch scheduler constants)."""
    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel

    cfg = Config(pde="advection", proj_dir=str(tmp_path), tag="pl",
                 init_cond="example1", num_hidden_layers=2,
                 hidden_features=16, sample_resolution=64, max_n_iters=20,
                 chunk_size=10, overwrite=True, backup_sources=False,
                 plateau_patience=777, plateau_threshold=3e-5,
                 plateau_factor=0.5)
    cfg.setup_dirs()
    model = Advection1DModel(cfg)
    model.initialize()
    (solver,) = model._solvers.values()
    assert solver._plateau_kw["patience"] == 777
    assert solver._plateau_kw["threshold"] == 3e-5
    assert solver._plateau_kw["factor"] == 0.5


def test_train_cli_multidevice_mesh(tmp_path):
    """--n_devices 8 on the virtual CPU mesh: collocation-sharded training
    through the real CLI path."""
    main_mod.main(["advection", "--tag", "cli_mesh", "--proj_dir",
                   str(tmp_path), "--init_cond", "example1",
                   "--num_hidden_layers", "2", "--hidden_features", "16",
                   "-sr", "256", "-T", "1", "--max_n_iters", "40",
                   "--chunk_size", "20", "--n_devices", "8",
                   "--no-early_stop", "--no_backup"])
    assert (tmp_path / "cli_mesh" / "results" / "t001.npz").exists()


def test_fluid_train_and_recap(tmp_path):
    argv = ["fluid", "--tag", "cli_fluid", "--proj_dir", str(tmp_path),
            "--init_cond", "taylorgreen", "--num_hidden_layers", "2",
            "--hidden_features", "16", "-sr", "8", "-vr", "16", "-T", "1",
            "--max_n_iters", "40", "--chunk_size", "20", "--no-early_stop",
            "--no_backup"]
    main_mod.main(argv)
    exp = tmp_path / "cli_fluid"
    assert (exp / "results" / "t001.npy").exists()
    assert (exp / "results" / "t001_curl.png").exists()
    recap_mod.main(["fluid", "--tag", "cli_fluid", "--proj_dir",
                    str(tmp_path), "-vr", "16"])
    a = np.load(exp / "results" / "t001.npy")
    b = np.load(exp / "recap" / "t001.npy")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_vortex_ckpt_recap_roundtrip(tmp_path):
    """starterL saves the coefficient tensor + config snapshot; recap.py
    vortex rebuilds the model from the snapshot and re-renders identical
    fields (VERDICT r2 #9: the flagship solver is checkpointable too)."""
    import starterL as starter_mod
    from insr_pde_tpu.models.vortex import load_vortex_ckpt

    out = tmp_path / "vortex_out"
    log = tmp_path / "vortex_log"
    starter_mod.main([
        "--output_path", str(out), "--log_dir", str(log),
        "--collocation", "60", "--boundary", "40", "--time_num", "3",
        "--n_spatial_basis", "36", "--picard_iters", "1",
        "--cgls_maxiter", "60", "--rho", "1.0", "--internal_v", "1.0"])
    ckpt = out / "vortex_ckpt.npz"
    assert ckpt.exists()
    field_solved = np.load(out / "field.npy")

    # restore into a fresh process-state model and re-render
    model = load_vortex_ckpt(str(ckpt))
    assert model.cfg.n_spatial_basis == 36 and model.cfg.time_num == 3
    recap_mod.main(["vortex", "--ckpt", str(ckpt), "-o", "recap"])
    field_recap = np.load(out / "recap" / "field.npy")
    np.testing.assert_allclose(field_solved, field_recap, atol=1e-5)

    # resume path: warm-start from the checkpoint without error
    starter_mod.main([
        "--output_path", str(out), "--log_dir", str(log),
        "--collocation", "60", "--boundary", "40", "--time_num", "3",
        "--n_spatial_basis", "36", "--picard_iters", "1",
        "--cgls_maxiter", "10", "--rho", "1.0", "--internal_v", "1.0",
        "--resume", str(ckpt)])


def test_starterL_channel_preset_solves_tiny(tmp_path):
    """--preset channel wires the round-3 channel-scene bundle (stream +
    Shepard-normalized smooth PoU + per-slice windows + Hermite BCs +
    block whitener + chunked restarted CGLS) while explicit flags
    override the preset's scale (COMPARISON.md round 3)."""
    import starterL as starter_mod

    # preset values land in the parsed config; explicit flags override
    cfg_holder = {}
    orig_cls = starter_mod.StreamVortexModel

    class Spy(orig_cls):
        def __init__(self, cfg, **kw):
            cfg_holder["cfg"] = cfg
            super().__init__(cfg, **kw)

    starter_mod.StreamVortexModel = Spy
    try:
        starter_mod.main([
            "--preset", "channel",
            "--output_path", str(tmp_path / "out"),
            "--log_dir", str(tmp_path / "log"), "--ckpt_path", "none",
            "--collocation", "200", "--boundary", "80", "--time_num", "3",
            "--n_spatial_basis", "25", "--picard_iters", "1",
            "--cgls_maxiter", "120", "--cgls_chunk", "60",
            "--rho", "1.0", "--internal_v", "1.0"])
    finally:
        starter_mod.StreamVortexModel = orig_cls
    cfg = cfg_holder["cfg"]
    assert cfg.pou == "smooth" and cfg.pou_time == "simple"
    assert cfg.pou_normalize and cfg.cgls_precondition == "block"
    assert cfg.stream_bc == "both" and cfg.time_window == 1
    assert cfg.cgls_restart and cfg.cgls_chunk == 60     # flag overrode
    assert cfg.collocation_pts_num == 200                # flag overrode
    assert (tmp_path / "out" / "field.npy").exists()
