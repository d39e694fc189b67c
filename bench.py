"""Benchmark: sec/timestep on the advect1D workload (BASELINE.json metric).

Workload = the reference's `scripts/advect1D.sh` hyperparameters (SIREN
2 layers x 20 hidden, 5000 collocation points per Adam iteration, implicit
midpoint residual + boundary penalty, dt=0.05), with a *fixed* iteration count
per timestep (no early stop) so the number is deterministic and comparable.

Baseline = a from-scratch PyTorch eager implementation of the identical
per-iteration computation (same net size, same residual, same point count),
timed on this host and scaled to the same iteration count. The reference repo
publishes no numbers (BASELINE.md), so the measured same-machine PyTorch
equivalent is the honest baseline; `vs_baseline` is the speedup factor
(baseline_sec_per_timestep / ours).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "sec/timestep", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from insr_pde_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

ITERS_PER_STEP = 2000
N_SAMPLES = 5000
TORCH_MEASURE_ITERS = 100


def bench_jax() -> float:
    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel

    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(
            pde="advection", proj_dir=tmp, tag="bench", init_cond="example1",
            num_hidden_layers=2, hidden_features=20,
            sample_resolution=N_SAMPLES, vis_resolution=200,
            max_n_iters=ITERS_PER_STEP, chunk_size=ITERS_PER_STEP,
            early_stop=False, dt=0.05, length=4.0, vel=0.25,
            vis_frequency=10 ** 9, backup_sources=False,
        )
        cfg.setup_dirs()
        model = Advection1DModel(cfg)
        model.initialize()          # compiles the init program
        model.step()                # compiles the advect program (warmup)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model.step()
            times.append(time.perf_counter() - t0)
    return min(times)


def bench_torch_baseline() -> float:
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
        x = (torch.rand(N_SAMPLES, 1) * 2.0 - 1.0) * 2.0
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
    for _ in range(TORCH_MEASURE_ITERS):
        one_iter()
    per_iter = (time.perf_counter() - t0) / TORCH_MEASURE_ITERS
    return per_iter * ITERS_PER_STEP


def main():
    jax_sec = bench_jax()
    try:
        base_sec = bench_torch_baseline()
        vs = base_sec / jax_sec
    except Exception:
        vs = float("nan")
    print(json.dumps({
        "metric": f"advect1D_sec_per_timestep_{ITERS_PER_STEP}iters",
        "value": round(jax_sec, 4),
        "unit": "sec/timestep",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
