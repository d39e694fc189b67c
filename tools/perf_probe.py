"""TPU performance probes (run one at a time on the chip; prints JSON lines).

Usage: python tools/perf_probe.py {prng|pallas|fluid}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from insr_pde_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _fetch(y):
    """Real completion barrier: force a host fetch of a value that depends
    on the whole computation. On the tunneled axon backend,
    jax.block_until_ready can return WITHOUT waiting (observed 2026-08-20:
    repeat calls of an 8x-scale 146 ms pair program "completed" in 0.1 ms
    under block_until_ready; float() of the same result took the full
    146 ms/iter) — only a host transfer is a trustworthy sync point."""
    if y is None:
        return None
    try:
        # .ravel()[0] is a device-side gather program that depends on the
        # producing program — transfers ONE scalar, waits for all of y
        return float(y) if getattr(y, "ndim", 1) == 0 else float(
            y.ravel()[0])
    except TypeError:  # pytrees: fetch the first leaf
        import jax
        return _fetch(jax.tree_util.tree_leaves(y)[0])


def _time_steps(fn, n=3):
    _fetch(fn())  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_prng():
    """advect1D solve-chunk time under threefry vs rbg PRNG."""
    import jax

    results = {}
    for impl in ("threefry2x32", "rbg"):
        jax.config.update("jax_default_prng_impl", impl)
        import importlib

        import tempfile

        from insr_pde_tpu.config import Config
        from insr_pde_tpu.models.advection import Advection1DModel

        with tempfile.TemporaryDirectory() as tmp:
            cfg = Config(pde="advection", proj_dir=tmp, tag=f"p_{impl}",
                         init_cond="example1", num_hidden_layers=2,
                         hidden_features=20, sample_resolution=5000,
                         vis_resolution=100, max_n_iters=2000,
                         chunk_size=2000, early_stop=False,
                         vis_frequency=10 ** 9, backup_sources=False)
            cfg.setup_dirs()
            model = Advection1DModel(cfg)
            model.initialize()
            model.step()  # compile advect
            results[impl] = _time_steps(model.step)
        print(json.dumps({"probe": "prng", "impl": impl,
                          "sec_per_2000it_step": round(results[impl], 4)}))
    return results


def probe_pallas():
    """Fused Pallas SIREN forward vs plain XLA on inference batches."""
    import jax
    import jax.numpy as jnp

    from insr_pde_tpu.models.networks import MLP
    from insr_pde_tpu.ops.pallas_siren import siren_forward

    for width, n in ((64, 1 << 17), (128, 1 << 17)):
        net = MLP(2, 2, num_hidden_layers=3, hidden_features=width)
        params = net.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))

        xla = jax.jit(lambda p, c: net.apply(p, c))
        pal = jax.jit(siren_forward)

        def run_xla():
            xla(params, x).block_until_ready()

        def run_pal():
            pal(params, x).block_until_ready()

        t_x = _time_steps(run_xla, n=10)
        t_p = _time_steps(run_pal, n=10)
        print(json.dumps({"probe": "pallas", "width": width, "batch": n,
                          "xla_ms": round(t_x * 1e3, 3),
                          "pallas_ms": round(t_p * 1e3, 3),
                          "speedup": round(t_x / t_p, 2)}))


def probe_fluid():
    """Per-timestep wall-clock of the 3-phase fluid step (sr=64, 1000 it)."""
    import tempfile

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel

    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(pde="fluid", proj_dir=tmp, tag="perf",
                     init_cond="taylorgreen", num_hidden_layers=3,
                     hidden_features=32, sample_resolution=64,
                     vis_resolution=32, max_n_iters=1000, chunk_size=1000,
                     early_stop=False, vis_frequency=10 ** 9,
                     backup_sources=False)
        cfg.setup_dirs()
        model = Fluid2DModel(cfg)
        model.initialize()
        model.step()  # compile all three phases
        t = _time_steps(model.step, n=2)
        print(json.dumps({"probe": "fluid", "sr": 64, "iters": 1000,
                          "sec_per_timestep": round(t, 3)}))


def probe_advect_scaling():
    """Step time vs collocation count and width: flat => launch-bound,
    linear => bandwidth/compute-bound."""
    import tempfile

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.advection import Advection1DModel

    for sr, hf in ((5000, 20), (50000, 20), (5000, 64), (50000, 64)):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = Config(pde="advection", proj_dir=tmp, tag=f"s{sr}_{hf}",
                         init_cond="example1", num_hidden_layers=2,
                         hidden_features=hf, sample_resolution=sr,
                         vis_resolution=100, max_n_iters=2000,
                         chunk_size=2000, early_stop=False,
                         vis_frequency=10 ** 9, backup_sources=False)
            cfg.setup_dirs()
            model = Advection1DModel(cfg)
            model.initialize()
            model.step()
            t = _time_steps(model.step, n=2)
            print(json.dumps({"probe": "advect_scaling", "sr": sr,
                              "hidden": hf,
                              "sec_per_2000it_step": round(t, 3)}),
                  flush=True)


def probe_elasticity3d():
    """3D mesh elasticity step time (SVD energies + on-device tet sampling)."""
    import tempfile

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.elasticity import ElasticityModel
    from insr_pde_tpu.geometry import box_tet_mesh

    with tempfile.TemporaryDirectory() as tmp:
        mesh_path = f"{tmp}/box.mesh"
        V, T = box_tet_mesh(6)
        with open(mesh_path, "w") as f:
            f.write(f"MeshVersionFormatted 1\nDimension 3\nVertices\n{len(V)}\n")
            for v in V:
                f.write(f"{v[0]} {v[1]} {v[2]} 1\n")
            f.write(f"Tetrahedra\n{len(T)}\n")
            for t in T:
                f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} {t[3]+1} 1\n")
            f.write("End\n")
        cfg = Config(pde="elasticity", proj_dir=tmp, tag="e3d", dim=3,
                     num_hidden_layers=3, hidden_features=66,
                     sample_resolution=20, sample_resolution_init=8,
                     vis_resolution=500, max_n_iters=1000, chunk_size=1000,
                     early_stop=False, dt=0.1, use_mesh=True,
                     mesh_path=mesh_path,
                     energy=["arap", "kinematics", "collision", "external",
                             "volume"],
                     external_force_z=-100.0, plane_height=-2.0,
                     vis_frequency=10 ** 9, backup_sources=False)
        cfg.setup_dirs()
        model = ElasticityModel(cfg)
        model.initialize()
        model.step()
        t = _time_steps(model.step, n=2)
        print(json.dumps({"probe": "elasticity3d", "samples": 20 ** 3,
                          "mesh_verts": len(V), "iters": 1000,
                          "sec_per_timestep": round(t, 3)}), flush=True)


def probe_vgl():
    """DEMOTED-EXPERIMENT probe: the fused Pallas value+grad+Laplacian
    kernel pair (tools/experiments/pallas_vgl.py) vs the XLA
    forward-Laplacian chain + autodiff, on the pressure-net grad program at
    paper scale (16384 pts, 3x32 SIREN; reference fluid/model.py:103-125).
    Measured 235x SLOWER — the analysis of why lives in the experiment's
    module docstring; the XLA chain is the production path."""
    import jax
    import jax.numpy as jnp

    from insr_pde_tpu.models.networks import MLP
    from insr_pde_tpu.ops.forward_laplacian import value_grad_laplacian
    from tools.experiments.pallas_vgl import siren_vgl

    net = MLP(2, 1, num_hidden_layers=3, hidden_features=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16384, 2),
                           minval=-1.0, maxval=1.0)

    def loss_of(chain_fn):
        def loss(p):
            u, J, L = chain_fn(p, x)
            return jnp.mean(L ** 2) + jnp.mean(u ** 2) + jnp.mean(J ** 2)
        return jax.jit(jax.grad(loss))

    results = {}
    for name, fn in (("xla", lambda p, c: value_grad_laplacian(p, c)),
                     ("pallas", lambda p, c: siren_vgl(p, c))):
        g = loss_of(fn)
        jax.block_until_ready(g(params))
        t = _time_steps(lambda: jax.block_until_ready(g(params)), n=20)
        results[name] = t
        print(json.dumps({"probe": "vgl", "impl": name,
                          "grad_program_ms": round(t * 1e3, 4)}), flush=True)
    print(json.dumps({
        "probe": "vgl_summary",
        "pallas_over_xla": round(results["pallas"] / results["xla"], 2),
    }), flush=True)


def probe_spmv():
    """ELL spmv (PaddedSparse.mv/rmv) at the reference vortex scale —
    the per-iteration cost of CGLS, measured to be the TPU bottleneck
    (~100 ms/CGLS iteration at 400x10 scale, i.e. no faster than 1-core
    CPU: XLA's gather/segment-sum lowering. HBM floor for the operands is
    ~0.3 ms/matvec). Also times candidate alternatives."""
    import jax
    import jax.numpy as jnp

    from insr_pde_tpu.ops.linalg import PaddedSparse

    R, NNZ, NCOLS = 35600, 768, 192000
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    vals = jax.random.normal(k1, (R, NNZ))
    cols = jax.random.randint(k2, (R, NNZ), 0, NCOLS)
    x = jax.random.normal(k3, (NCOLS,))
    r = jax.random.normal(k4, (R,))
    A = PaddedSparse(vals=vals, cols=cols, n_cols=NCOLS)

    # operands as jit arguments (closure constants ship through the tunnel
    # per compile — see the block-ELL section below)
    mv = jax.jit(lambda v, c, x: PaddedSparse(v, c, NCOLS).mv(x))
    rmv = jax.jit(lambda v, c, r: PaddedSparse(v, c, NCOLS).rmv(r))
    t_mv = _time_steps(
        lambda: jax.block_until_ready(mv(vals, cols, x)), n=10)
    t_rmv = _time_steps(
        lambda: jax.block_until_ready(rmv(vals, cols, r)), n=10)

    # gather-only (isolate the x[cols] share of mv)
    gat = jax.jit(lambda c, x: jnp.sum(x[c]))
    t_gather = _time_steps(lambda: jax.block_until_ready(gat(cols, x)), n=10)

    # one CGLS iteration equivalent: mv + rmv + axpys
    bytes_mv = (R * NNZ * 8 + NCOLS * 4 + R * 4)  # vals+cols + x + out
    print(json.dumps({
        "probe": "spmv", "layout": "scalar_ell", "rows": R,
        "nnz_per_row": NNZ, "n_cols": NCOLS,
        "mv_ms": round(t_mv * 1e3, 3), "rmv_ms": round(t_rmv * 1e3, 3),
        "gather_only_ms": round(t_gather * 1e3, 3),
        "hbm_floor_ms": round(bytes_mv / 800e9 * 1e3, 3),
        "mv_gbps": round(bytes_mv / t_mv / 1e9, 1),
    }), flush=True)

    # block-ELL: same operator grouped into dense J-feature blocks
    # (ops/linalg.BlockSparse — J x fewer gather/scatter indices)
    from insr_pde_tpu.ops.linalg import BlockSparse
    J = 16
    S = NNZ // J
    bvals = vals.reshape(R, S, J)
    bcols = jax.random.randint(k2, (R, S), 0, NCOLS // J)
    bmv = jax.jit(lambda v, c, x: BlockSparse(v, c, NCOLS // J).mv(x))
    brmv = jax.jit(lambda v, c, r: BlockSparse(v, c, NCOLS // J).rmv(r))
    tb_mv = _time_steps(
        lambda: jax.block_until_ready(bmv(bvals, bcols, x)), n=10)
    tb_rmv = _time_steps(
        lambda: jax.block_until_ready(brmv(bvals, bcols, r)), n=10)
    print(json.dumps({
        "probe": "spmv", "layout": "block_ell", "block_dim": J,
        "slots": S,
        "mv_ms": round(tb_mv * 1e3, 3), "rmv_ms": round(tb_rmv * 1e3, 3),
        "mv_speedup_vs_scalar": round(t_mv / tb_mv, 2),
        "rmv_speedup_vs_scalar": round(t_rmv / tb_rmv, 2),
        "mv_gbps": round(bytes_mv / tb_mv / 1e9, 1),
    }), flush=True)

    # block-ELL transpose via precomputed gather index (rmv_gather):
    # pull-formulation Aᵀr vs the segment-sum scatter, at the reference
    # scale AND the channel-preset 8x/16x-density scales.
    #
    # Operands are passed as jit ARGUMENTS, never closed over: a closure
    # constant is baked into the HLO and shipped through the tunnel per
    # compile — the round-3 8x leg did exactly that (875 MB of captured
    # vals per program) and killed remote_compile with a broken pipe
    # (COMPARISON.md). Argument buffers stay device-resident.
    from insr_pde_tpu.ops.linalg import build_rmv_gather
    nb = NCOLS // J
    g_scatter = jax.jit(lambda v, c, r: BlockSparse(v, c, nb).rmv(r))
    g_gather = jax.jit(
        lambda v, c, r, t: BlockSparse(v, c, nb).rmv_gather(r, t))
    gmv = jax.jit(lambda v, c, x: BlockSparse(v, c, nb).mv(x))
    # Tunnel dispatch latency is ~20-30 ms and block_until_ready on the
    # axon backend is unreliable below that (sub-ms "timings" observed,
    # faster than the HBM floor — physically impossible). Per the verify
    # skill: anything that could be sub-50 ms must be measured INSIDE one
    # program — scan the op k times with a data dependence (eps is a
    # RUNTIME arg so XLA can't fold the chain) and difference two k's to
    # cancel per-program dispatch/fixed cost.
    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def _chain(v, c, xc, eps, *, k):
        # pair: the CGLS-iteration kernel, Aᵀ(A x), chained so no
        # iteration can be CSE'd or hoisted (eps is a runtime value)
        A = BlockSparse(v, c, nb)

        def body(s, _):
            return s + eps * A.rmv(A.mv(s)), None

        out, _ = jax.lax.scan(body, xc, None, length=k)
        return jnp.sum(out)

    def _scanned_pair_ms(gvals, gcols, gx, k_lo, k_hi):
        eps = jnp.float32(0.0)
        t_lo = _time_steps(lambda: jax.block_until_ready(
            _chain(gvals, gcols, gx, eps, k=k_lo)), n=3)
        t_hi = _time_steps(lambda: jax.block_until_ready(
            _chain(gvals, gcols, gx, eps, k=k_hi)), n=3)
        return max(t_hi - t_lo, 0.0) / (k_hi - k_lo) * 1e3

    for label, Rg in (("block_ell_ref", R), ("block_ell_8x", 8 * R),
                      ("block_ell_16x", 16 * R)):
        kv, kc, kr = jax.random.split(jax.random.PRNGKey(Rg), 3)
        gvals = jax.random.normal(kv, (Rg, S, J))
        gcols = jax.random.randint(kc, (Rg, S), 0, nb)
        gr = jax.random.normal(kr, (Rg,))
        op_mb = (gvals.size * 4 + gcols.size * 4) / 1e6
        ts = _time_steps(
            lambda: jax.block_until_ready(g_scatter(gvals, gcols, gr)), n=10)
        tm = _time_steps(
            lambda: jax.block_until_ready(gmv(gvals, gcols, x)), n=10)
        rec = {
            "probe": "spmv", "layout": label, "rows": Rg,
            "operator_mb": round(op_mb, 1),
            "mv_ms": round(tm * 1e3, 3),
            "rmv_scatter_ms": round(ts * 1e3, 3),
        }
        print(json.dumps(rec), flush=True)  # single-dispatch numbers first
        # per-iter cost at ref scale is ~10 ms: a long chain (k=51) is
        # needed for the delta to clear dispatch jitter. At 16x the k>1
        # chain over the 7-way unrolled chunked matvec exceeds the remote
        # compiler (HTTP 500 observed at k=9) — try a short chain, and on
        # failure the single-dispatch numbers above (>100 ms each at 16x,
        # well above the ~25 ms tunnel latency) remain the datum.
        k_hi = 51 if Rg == R else (9 if Rg <= 8 * R else 3)
        try:
            rec["pair_scanned_ms"] = round(
                _scanned_pair_ms(gvals, gcols, x, 1, k_hi), 3)
        except Exception as e:  # remote compile OOM at extreme scales
            rec["pair_scanned_error"] = type(e).__name__
        # the pull-transpose (rmv_gather) is a documented negative result
        # (2.7x slower at reference scale, 3.9x at 8x) whose transpose
        # index grows with the reverse degree D ~ rows/n_block_cols — at
        # 16x its contribution buffer alone OOMs 16 GB HBM. Measure it
        # only at the scales it can exist at; the production scatter path
        # is the 16x datum.
        if Rg <= 8 * R:
            t_idx = build_rmv_gather(gcols, nb)
            tg = _time_steps(
                lambda: jax.block_until_ready(
                    g_gather(gvals, gcols, gr, t_idx)), n=10)
            rec.update({
                "reverse_degree_D": int(t_idx.shape[1]),
                "rmv_gather_ms": round(tg * 1e3, 3),
                "rmv_gather_speedup": round(ts / tg, 2),
            })
        print(json.dumps(rec), flush=True)

    # packed layout (ops/linalg.BlockSparseP, VERDICT r4 #1): the SAME
    # operator with vals stored (R, S*J) — the minor dim is S*J=768 (a
    # lane multiple) instead of J=16, so the T(8,128) tiling pads ~1x
    # instead of 8x, and every CGLS matvec streams ~1/8 the HBM bytes.
    # Optional bf16 leg: opt-in storage narrowing (f32 accumulate).
    from insr_pde_tpu.ops.linalg import BlockSparseP

    p_mv = jax.jit(lambda v, c, x: BlockSparseP(v, c, nb).mv(x))
    p_rmv = jax.jit(lambda v, c, r: BlockSparseP(v, c, nb).rmv(r))

    @partial(jax.jit, static_argnames=("k",))
    def _chain_p(v, c, xc, eps, *, k):
        A = BlockSparseP(v, c, nb)

        def body(s, _):
            return s + eps * A.rmv(A.mv(s)), None

        out, _ = jax.lax.scan(body, xc, None, length=k)
        return jnp.sum(out)

    def _scanned_pair_p_ms(pvals, pcols, gx, k_lo, k_hi):
        eps = jnp.float32(0.0)
        t_lo = _time_steps(lambda: jax.block_until_ready(
            _chain_p(pvals, pcols, gx, eps, k=k_lo)), n=3)
        t_hi = _time_steps(lambda: jax.block_until_ready(
            _chain_p(pvals, pcols, gx, eps, k=k_hi)), n=3)
        return max(t_hi - t_lo, 0.0) / (k_hi - k_lo) * 1e3

    for label, Rg, dt in (("packed_ref", R, None),
                          ("packed_8x", 8 * R, None),
                          ("packed_8x_bf16", 8 * R, "bfloat16"),
                          ("packed_16x", 16 * R, None)):
        kv, kc, kr = jax.random.split(jax.random.PRNGKey(Rg), 3)
        pvals = jax.random.normal(kv, (Rg, S * J))
        if dt is not None:
            pvals = pvals.astype(jnp.bfloat16)
        pcols = jax.random.randint(kc, (Rg, S), 0, nb)
        pr = jax.random.normal(kr, (Rg,))
        op_mb = (pvals.size * pvals.dtype.itemsize + pcols.size * 4) / 1e6
        tm = _time_steps(
            lambda: jax.block_until_ready(p_mv(pvals, pcols, x)), n=10)
        ts = _time_steps(
            lambda: jax.block_until_ready(p_rmv(pvals, pcols, pr)), n=10)
        rec = {
            "probe": "spmv", "layout": label, "rows": Rg,
            "operator_mb": round(op_mb, 1),
            "mv_ms": round(tm * 1e3, 3),
            "rmv_scatter_ms": round(ts * 1e3, 3),
        }
        # per-program HBM floor for one AᵀA pair: stream vals twice +
        # cols twice + vectors (800 GB/s nominal)
        pair_bytes = 2 * (pvals.size * pvals.dtype.itemsize
                          + pcols.size * 4) + 2 * (x.size + Rg) * 4
        rec["pair_hbm_floor_ms"] = round(pair_bytes / 800e9 * 1e3, 3)
        k_hi = 51 if Rg == R else (9 if Rg <= 8 * R else 3)
        try:
            rec["pair_scanned_ms"] = round(
                _scanned_pair_p_ms(pvals, pcols, x, 1, k_hi), 3)
        except Exception as e:
            rec["pair_scanned_error"] = type(e).__name__
        print(json.dumps(rec), flush=True)


def probe_precision():
    """MXU pass count (default=1, high=3, highest=6 bf16 passes) on the
    paper-scale pressure phase: wall-clock per 1000-iteration chunk AND
    value/grad/Laplacian deviation vs the 6-pass chain on identical inputs.
    The solve chunks are MXU-bound, so pass count ~ step time."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from insr_pde_tpu.config import Config
    from insr_pde_tpu.models.fluid import Fluid2DModel
    from insr_pde_tpu.models.networks import MLP
    from insr_pde_tpu.ops import precision as prec
    from insr_pde_tpu.ops.forward_laplacian import value_grad_laplacian

    # -- accuracy: chain outputs vs highest, fixed params/coords
    net = MLP(2, 1, num_hidden_layers=3, hidden_features=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16384, 2),
                           minval=-1.0, maxval=1.0)
    outs = {}
    for level in ("highest", "high", "default"):
        prec.set_matmul_precision(level)
        # fresh lambda per level: the precision knob is read at TRACE time
        # and jax caches traces by function identity — re-jitting the same
        # function object would silently reuse the first level's trace
        fn = jax.jit(lambda p, c: value_grad_laplacian(p, c))
        outs[level] = fn(params, x)
        jax.block_until_ready(outs[level])
    prec.set_matmul_precision("highest")

    def rel(a, b):
        num = float(jnp.linalg.norm(a - b))
        den = float(jnp.linalg.norm(b)) or 1.0
        return num / den

    for level in ("high", "default"):
        print(json.dumps({
            "probe": "precision_accuracy", "level": level,
            "rel_u_vs_highest": rel(outs[level][0], outs["highest"][0]),
            "rel_J_vs_highest": rel(outs[level][1], outs["highest"][1]),
            "rel_L_vs_highest": rel(outs[level][2], outs["highest"][2]),
        }), flush=True)

    # -- timing: the real pressure-phase chunk per level
    for level in ("highest", "high", "default"):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = Config(pde="fluid", proj_dir=tmp, tag=f"prec_{level}",
                         init_cond="taylorgreen", num_hidden_layers=3,
                         hidden_features=32, sample_resolution=128,
                         vis_resolution=32, max_n_iters=1000,
                         chunk_size=1000, early_stop=False,
                         vis_frequency=10 ** 9, backup_sources=False,
                         matmul_precision=level)
            cfg.setup_dirs()
            model = Fluid2DModel(cfg)
            aux = {"vel": model.fields["velocity"]}
            p = model.fields["pressure"]
            model._run_phase("solve_pressure", model._pressure_loss, p,
                             aux=aux)
            t = _time_steps(lambda: model._run_phase(
                "solve_pressure", model._pressure_loss, p, aux=aux), n=3)
            print(json.dumps({"probe": "precision_timing", "level": level,
                              "pressure_sec_1000it": round(t, 4)}),
                  flush=True)


if __name__ == "__main__":
    {"prng": probe_prng, "pallas": probe_pallas,
     "fluid": probe_fluid,
     "advect_scaling": probe_advect_scaling,
     "elasticity3d": probe_elasticity3d,
     "vgl": probe_vgl, "spmv": probe_spmv,
     "precision": probe_precision}[sys.argv[1]]()
