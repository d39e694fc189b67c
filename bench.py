"""Benchmark: the reference's two headline workloads, one JSON line.

PRIMARY metric — the paper-scale 2D fluid timestep (reference
`scripts/fluid2Dtlgn.sh`: SIREN 3x32, sr=128 => 16384 collocation points per
iteration, three solve phases per timestep — advect, pressure Poisson,
projection; the pressure phase is the reference's hottest region,
fluid/model.py:103-125 / SURVEY.md §3.1). Iteration count fixed (no early
stop) so the number is deterministic and comparable.

SECONDARY (extra fields) — the round-1 advect1D workload (reference
`scripts/advect1D.sh`), kept for cross-round comparability.

Drift-proofing (VERDICT r2 weak #3): each metric is min-of-N over N=5
measured repetitions, with mean and spread reported alongside — the tunneled
TPU's per-step variance was measured at ~10% round-to-round, which a single
mean-of-3 cannot distinguish from a real 10% regression. The measured torch
baseline seconds are included verbatim so a vs_baseline shift is attributable
to whichever side moved.

Baseline = from-scratch PyTorch eager implementations of the identical
per-iteration computation, timed on this host and scaled to the same
iteration count. The reference repo publishes no numbers (BASELINE.md), so
the measured same-machine PyTorch equivalent is the honest baseline;
`vs_baseline` is the speedup factor (baseline_sec / ours).

Also reports achieved FLOP/s for the fluid timestep, from XLA's own cost
analysis of the per-iteration grad programs (not a hand count), and MFU
against the v5e bf16 MXU peak (197 TFLOP/s; the compute runs f32, so this
is a deliberately conservative denominator).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "sec/timestep", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from insr_pde_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

# fluid paper scale (reference scripts/fluid2Dtlgn.sh)
FLUID_SR = 128
FLUID_LAYERS, FLUID_HIDDEN = 3, 32
FLUID_ITERS = 3000          # per phase, fixed (reference max_n_iters default
                            # is 20k with early stop; fixed count => stable)
# advect1D (reference scripts/advect1D.sh)
ADV_ITERS_PER_STEP = 2000
ADV_N_SAMPLES = 5000
# the advect1d step is ~0.3 s and tunnel-latency-dominated: a single-step
# rep carries ~25 ms of dispatch jitter => the 8.6% spread of BENCH_r04.
# Timing ADV_STEPS_PER_REP steps per rep and dividing amortizes the
# jitter ~4x while keeping the per-step metric comparable across rounds.
ADV_STEPS_PER_REP = 4
TORCH_MEASURE_ITERS = 20
REPS = 5                     # min-of-N repetitions per metric

V5E_BF16_PEAK_FLOPS = 197e12


def _fluid_model(tmp):
    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel

    cfg = Config(
        pde="fluid", proj_dir=tmp, tag="bench", init_cond="taylorgreen",
        num_hidden_layers=FLUID_LAYERS, hidden_features=FLUID_HIDDEN,
        sample_resolution=FLUID_SR, vis_resolution=32,
        max_n_iters=FLUID_ITERS, chunk_size=1000, early_stop=False,
        dt=0.05, vis_frequency=10 ** 9, backup_sources=False,
    )
    cfg.setup_dirs()
    return Fluid2DModel(cfg)


def bench_fluid() -> tuple[list, float]:
    """Returns (per-rep seconds list, flops/timestep from XLA cost analysis)."""
    import jax

    with tempfile.TemporaryDirectory() as tmp:
        model = _fluid_model(tmp)
        model.initialize()
        model.step()                # compiles all three phase programs
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            model.step()
            times.append(time.perf_counter() - t0)

        # FLOPs per iteration of each phase: XLA cost analysis of the
        # value_and_grad program (the scan body's dominant cost; Adam and
        # the scheduler add a few % on top — excluded, so MFU is a floor).
        key = jax.random.PRNGKey(0)
        v = model.fields["velocity"]
        p = model.fields["pressure"]
        phases = [
            (model._advect_loss, v, {"prev": v}),
            (model._pressure_loss, p, {"vel": v}),
            (model._projection_loss, v, {"prev": v, "pressure": p}),
        ]
        flops_per_iter = 0.0
        for loss_fn, params, aux in phases:
            def one_iter(params, key, aux, loss_fn=loss_fn):
                return jax.grad(
                    lambda q: sum(loss_fn(q, key, aux).values()))(params)
            c = jax.jit(one_iter).lower(params, key, aux).compile()
            cost = c.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops_per_iter += float((cost or {}).get("flops", 0.0))
    return times, flops_per_iter * FLUID_ITERS


def bench_fluid_torch_baseline() -> float:
    """The three-phase timestep in eager PyTorch (the reference's runtime):
    same nets (3x32 SIREN), same point counts (sr^2 = 16384 + 1% boundary),
    same per-iteration math incl. the nested-autograd pressure Laplacian
    (reference fluid/model.py:103-125)."""
    import torch

    torch.manual_seed(0)
    omega = 30.0
    n = FLUID_SR ** 2
    nb = n // 100

    def make_siren(fi, fo):
        dims = [(fi, FLUID_HIDDEN)] + \
            [(FLUID_HIDDEN, FLUID_HIDDEN)] * FLUID_LAYERS + \
            [(FLUID_HIDDEN, fo)]
        layers = []
        for i, (a, b) in enumerate(dims):
            lin = torch.nn.Linear(a, b)
            bound = (1.0 / a) if i == 0 else (6.0 / a) ** 0.5 / omega
            torch.nn.init.uniform_(lin.weight, -bound, bound)
            layers.append(lin)
        return torch.nn.ModuleList(layers)

    class Siren(torch.nn.Module):
        def __init__(self, fi, fo):
            super().__init__()
            self.layers = make_siren(fi, fo)

        def forward(self, x):
            h = x
            for i, lin in enumerate(self.layers):
                h = lin(h)
                if i < len(self.layers) - 1:
                    h = torch.sin(omega * h)
            return h

    vel, vel_prev = Siren(2, 2), Siren(2, 2)
    vel_prev.load_state_dict(vel.state_dict())
    pnet = Siren(2, 1)
    opt_v = torch.optim.Adam(vel.parameters(), lr=1e-4)
    opt_p = torch.optim.Adam(pnet.parameters(), lr=1e-4)
    dt = 0.05

    def bnd():
        return torch.rand(nb, 2) * 2.0 - 1.0

    def advect_iter():
        x = torch.rand(n, 2) * 2.0 - 1.0
        with torch.no_grad():
            back = (x - vel_prev(x) * dt).clamp(-1, 1)
            target = vel_prev(back)
        loss = ((vel(x) - target) ** 2).mean() \
            + (vel(bnd())[:, 0] ** 2).mean() + (vel(bnd())[:, 1] ** 2).mean()
        opt_v.zero_grad(); loss.backward(); opt_v.step()

    def pressure_iter():
        x = (torch.rand(n, 2) * 2.0 - 1.0).requires_grad_(True)
        with torch.no_grad():
            pass
        u = vel(x)
        div = sum(torch.autograd.grad(u[:, i].sum(), x, create_graph=False,
                                      retain_graph=True)[0][:, i]
                  for i in range(2)).detach()
        x2 = (torch.rand(n, 2) * 2.0 - 1.0).requires_grad_(True)
        pv = pnet(x2)
        gp = torch.autograd.grad(pv.sum(), x2, create_graph=True)[0]
        lap = sum(torch.autograd.grad(gp[:, i].sum(), x2, create_graph=True)[0][:, i]
                  for i in range(2))
        loss = ((div - lap) ** 2).mean()
        xb = bnd().requires_grad_(True)
        gb = torch.autograd.grad(pnet(xb).sum(), xb, create_graph=True)[0]
        loss = loss + (gb[:, 0] ** 2).mean() + (gb[:, 1] ** 2).mean()
        opt_p.zero_grad(); loss.backward(); opt_p.step()

    def project_iter():
        x = (torch.rand(n, 2) * 2.0 - 1.0).requires_grad_(True)
        pv = pnet(x)
        gp = torch.autograd.grad(pv.sum(), x, create_graph=False)[0]
        with torch.no_grad():
            target = vel_prev(x) - gp
        loss = ((vel(x) - target.detach()) ** 2).mean() \
            + (vel(bnd())[:, 0] ** 2).mean() + (vel(bnd())[:, 1] ** 2).mean()
        opt_v.zero_grad(); loss.backward(); opt_v.step()

    for it in (advect_iter, pressure_iter, project_iter):  # warmup
        it(); it()
    total = 0.0
    for it in (advect_iter, pressure_iter, project_iter):
        t0 = time.perf_counter()
        for _ in range(TORCH_MEASURE_ITERS):
            it()
        total += (time.perf_counter() - t0) / TORCH_MEASURE_ITERS
    return total * FLUID_ITERS


def bench_advect() -> list:
    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel

    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(
            pde="advection", proj_dir=tmp, tag="bench", init_cond="example1",
            num_hidden_layers=2, hidden_features=20,
            sample_resolution=ADV_N_SAMPLES, vis_resolution=200,
            max_n_iters=ADV_ITERS_PER_STEP, chunk_size=ADV_ITERS_PER_STEP,
            early_stop=False, dt=0.05, length=4.0, vel=0.25,
            vis_frequency=10 ** 9, backup_sources=False,
        )
        cfg.setup_dirs()
        model = Advection1DModel(cfg)
        model.initialize()
        model.step()
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(ADV_STEPS_PER_REP):
                model.step()
            times.append((time.perf_counter() - t0) / ADV_STEPS_PER_REP)
    return times


def bench_advect_torch_baseline() -> float:
    """Same math in eager PyTorch (the reference's runtime), same sizes."""
    import torch

    torch.manual_seed(0)
    omega = 30.0

    def make_net():
        layers = []
        dims = [(1, 20), (20, 20), (20, 20), (20, 1)]
        for i, (fi, fo) in enumerate(dims):
            lin = torch.nn.Linear(fi, fo)
            bound = (1.0 / fi) if i == 0 else (6.0 / fi) ** 0.5 / omega
            torch.nn.init.uniform_(lin.weight, -bound, bound)
            layers.append(lin)
        return layers

    class Siren(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.ModuleList(make_net())

        def forward(self, x):
            h = x
            for i, lin in enumerate(self.layers):
                h = lin(h)
                if i < len(self.layers) - 1:
                    h = torch.sin(omega * h)
            return h

    net, net_prev = Siren(), Siren()
    net_prev.load_state_dict(net.state_dict())
    for p in net_prev.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    dt, vel = 0.05, 0.25

    def one_iter():
        x = (torch.rand(ADV_N_SAMPLES, 1) * 2.0 - 1.0) * 2.0
        x.requires_grad_(True)
        u = net(x)
        gu = torch.autograd.grad(u.sum(), x, create_graph=True)[0]
        x0 = x.detach().requires_grad_(True)
        u0 = net_prev(x0)
        gu0 = torch.autograd.grad(u0.sum(), x0, create_graph=False)[0]
        loss = (((u - u0.detach()) / dt
                 + vel * (gu + gu0.detach()) / 2.0) ** 2).mean()
        xb = torch.cat([torch.rand(25, 1) * 1e-4 - 2.0,
                        torch.rand(25, 1) * 1e-4 + 2.0])
        loss = loss + (net(xb) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    for _ in range(5):  # warmup
        one_iter()
    t0 = time.perf_counter()
    for _ in range(100):
        one_iter()
    per_iter = (time.perf_counter() - t0) / 100
    return per_iter * ADV_ITERS_PER_STEP


VORTEX_CGLS_ITERS = 400
VORTEX_REPS = 3


def bench_vortex() -> tuple[list, dict]:
    """Channel-preset vortex Picard iteration (the headline TPU-native
    capability: reference-scale stream-formulation channel scene at 8x
    collocation density — starterL.py --preset channel / COMPARISON.md
    "channel scene solved"; reference workload: starterL.py:9-28 +
    vortex/model.py:445-478, which needs CUDA+scipy and fails this scene).

    One matrix_solver() call = assemble (BlockSparse block-ELL) + host-f64
    block eigen-whitener + chunked restarted CGLS at a FIXED iteration
    budget (VORTEX_CGLS_ITERS, no early exit) — deterministic work, so the
    min-of-N is regression-comparable across rounds. The whitener is
    recomputed every rep (reuse off) to keep the whole stack on the
    measured path."""
    from insr_pde_tpu.models.vortex import StreamVortexModel, VortexConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = VortexConfig(
            rho=1000.0, internal_v=8.0, n_spatial_basis=400, time_num=10,
            collocation_pts_num=8000, boundary_num=3200,
            picard_iters=1, cgls_maxiter=VORTEX_CGLS_ITERS, cgls_tol=0.0,
            cgls_chunk=200, cgls_restart=True, pou="smooth",
            pou_time="simple", time_window=1, band_width=1.0,
            stream_bc="both", w_bc=5.0, pou_normalize=True,
            cgls_precondition="block", log_dir=tmp)
        model = StreamVortexModel(cfg, log=False)
        model.matrix_solver()       # compiles assemble + chunk programs
        times, breakdown = [], {}
        for _ in range(VORTEX_REPS):
            t0 = time.perf_counter()
            model.matrix_solver()
            times.append(time.perf_counter() - t0)
            breakdown = dict(model.picard_timings[-1])
    return times, breakdown


def _stats(times):
    mn = min(times)
    mean = sum(times) / len(times)
    spread = (max(times) - mn) / mn * 100.0
    return mn, mean, spread


def main():
    fluid_times, fluid_flops = bench_fluid()
    adv_times = bench_advect()
    try:
        vortex_times, vortex_breakdown = bench_vortex()
        vortex_sec, vortex_mean, vortex_spread = _stats(vortex_times)
    except Exception:
        vortex_times, vortex_breakdown = [], {}
        vortex_sec, vortex_mean, vortex_spread = (float("nan"),) * 3
    fluid_sec, fluid_mean, fluid_spread = _stats(fluid_times)
    adv_sec, adv_mean, adv_spread = _stats(adv_times)
    try:
        fluid_base = bench_fluid_torch_baseline()
        fluid_vs = fluid_base / fluid_sec
    except Exception:
        fluid_base, fluid_vs = float("nan"), float("nan")
    try:
        adv_base = bench_advect_torch_baseline()
        adv_vs = adv_base / adv_sec
    except Exception:
        adv_base, adv_vs = float("nan"), float("nan")
    achieved = fluid_flops / fluid_sec if fluid_sec > 0 else 0.0
    print(json.dumps({
        "metric": f"fluid2d_paper_sec_per_timestep_{FLUID_ITERS}x3iters",
        "value": round(fluid_sec, 4),
        "unit": "sec/timestep",
        "vs_baseline": round(fluid_vs, 2),
        "fluid_mean_of_5": round(fluid_mean, 4),
        "fluid_spread_pct": round(fluid_spread, 1),
        "fluid_torch_baseline_sec": round(fluid_base, 2),
        "fluid_ms_per_iter": round(fluid_sec / (3 * FLUID_ITERS) * 1e3, 4),
        "fluid_achieved_gflops": round(achieved / 1e9, 1),
        "fluid_mfu_vs_v5e_bf16_peak": round(achieved / V5E_BF16_PEAK_FLOPS, 5),
        "advect1d_sec_per_timestep": round(adv_sec, 4),
        "advect1d_vs_baseline": round(adv_vs, 2),
        "advect1d_mean_of_5": round(adv_mean, 4),
        "advect1d_spread_pct": round(adv_spread, 1),
        "advect1d_torch_baseline_sec": round(adv_base, 2),
        "vortex_channel_sec_per_picard": round(vortex_sec, 3),
        "vortex_channel_cgls_iters": VORTEX_CGLS_ITERS,
        "vortex_channel_mean_of_3": round(vortex_mean, 3),
        "vortex_channel_spread_pct": round(vortex_spread, 1),
        "vortex_assemble_s": vortex_breakdown.get("assemble_s"),
        "vortex_whiten_s": vortex_breakdown.get("whiten_s"),
        "vortex_solve_s": vortex_breakdown.get("solve_s"),
        "vortex_operand_mb": vortex_breakdown.get("operand_mb"),
    }))


if __name__ == "__main__":
    sys.exit(main())
