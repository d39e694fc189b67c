"""The per-timestep optimization engine.

TPU-native redesign of the reference's `@_training_loop` decorator (reference:
base/baseModel.py:96-135), which runs up to 20k Adam iterations in a Python
loop. Here the loop body (sample -> loss -> grad -> Adam -> plateau-LR
scheduler) compiles to a single XLA program via `lax.scan` over fixed-size
chunks; the host only logs between chunks and decides when to stop. Early
stopping keeps exact reference semantics (ReduceLROnPlateau factor 0.1,
patience 500, rel-threshold 1e-4, min_lr 1e-8; stop when lr <= 1.1e-8 —
base/baseModel.py:55-62,126-134) by freezing updates in-device once the LR
floor is reached, so chunk overshoot is a no-op.

Multi-chip: pass a `jax.sharding.Mesh`; the loss/grad computation runs under
`shard_map` with params replicated and the collocation batch sharded by
folding the mesh axis index into the per-iteration RNG key. Gradients and
losses are `pmean`ed over ICI. This is the idiomatic TPU analogue of data/
space parallelism for collocation-point workloads (SURVEY.md §2.13, §5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

LossFn = Callable[[Any, jax.Array, Any], Dict[str, jax.Array]]
# loss_fn(params, key, aux) -> {"main": scalar, ...}; total loss = sum of
# values (reference base/baseModel.py:75); the scheduler keys on "main" only
# (base/baseModel.py:81). `aux` carries frozen state (e.g. previous-timestep
# field params, timestep index) as *traced* arguments so the compiled chunk
# program is reused across all timesteps.


class PlateauState(NamedTuple):
    """State of the ReduceLROnPlateau-equivalent scheduler."""
    best: jax.Array      # best 'main' loss seen (f32)
    bad: jax.Array       # consecutive non-improving steps (i32)
    scale: jax.Array     # multiplicative LR scale (f32), lr_now = lr * scale
    stopped: jax.Array   # early-stop latch (bool)


def plateau_init() -> PlateauState:
    return PlateauState(
        best=jnp.asarray(jnp.inf, jnp.float32),
        bad=jnp.asarray(0, jnp.int32),
        scale=jnp.asarray(1.0, jnp.float32),
        stopped=jnp.asarray(False),
    )


def plateau_update(state: PlateauState, loss: jax.Array, *,
                   factor: float, patience: int, threshold: float,
                   min_scale: float, stop_scale: float,
                   early_stop: bool) -> PlateauState:
    """One scheduler step on the 'main' loss (torch ReduceLROnPlateau
    semantics: mode=min, threshold_mode=rel, cooldown=0)."""
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    bad = jnp.where(improved, 0, state.bad + 1)
    trigger = bad > patience
    scale = jnp.where(trigger, jnp.maximum(state.scale * factor, min_scale),
                      state.scale)
    bad = jnp.where(trigger, 0, bad)
    stopped = state.stopped
    if early_stop:
        stopped = stopped | (scale <= stop_scale)
    return PlateauState(best, bad, scale, stopped)


class SolveState(NamedTuple):
    params: Any
    opt_state: Any
    plateau: PlateauState
    key: jax.Array


@dataclasses.dataclass
class FitResult:
    params: Any
    history: Dict[str, Any]       # per-iteration loss values (host numpy)
    n_iters: int                  # iterations actually run (before stop latch)
    final_loss: float


def _tree_scale(tree, s):
    return jax.tree_util.tree_map(lambda x: x * s, tree)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


class Solver:
    """Compiled per-phase optimizer.

    One Solver per (model, phase): build it once, then `fit()` per timestep —
    the chunk program is compiled on first use and reused every step, which is
    where the reference pays Python-loop overhead 20k times per step.
    """

    def __init__(self, loss_fn: LossFn, *, lr: float,
                 max_n_iters: int, chunk_size: int = 250,
                 early_stop: bool = True,
                 plateau_factor: float = 0.1, plateau_patience: int = 500,
                 plateau_threshold: float = 1e-4, plateau_min_lr: float = 1e-8,
                 early_stop_min_lr: float = 1.1e-8,
                 mesh: Optional[Mesh] = None, mesh_axis: str = "data",
                 debug_nan: bool = False, flatten: bool = True,
                 precision: Optional[str] = None, pipeline: bool = True):
        # flatten=True runs Adam/plateau/freeze on ONE raveled param vector
        # instead of the per-layer pytree: fewer HLO ops per scan body and
        # identical math (Adam is elementwise). Round-3 decomposition
        # (tools/overhead_probe.py, paper-scale pressure phase on the TPU):
        # grad program 0.340 ms, +rng 0.342, +adam 0.346, full chunk body
        # 0.354 ms/iter — in-device overhead beyond the grad is ~4%. The
        # rest of the wall-clock gap in end-to-end runs is host-side
        # (between-chunk transfers + metrics IO), not the compiled body.
        self.flatten = flatten
        self.debug_nan = debug_nan
        # pipeline=True dispatches chunk k+1 before fetching chunk k's
        # scalars, overlapping the blocking host<->device round trip (a
        # ~20-30 ms tunnel latency per fetch) with device compute. Safe by
        # construction: if early stop latches inside chunk k, every step of
        # the speculatively dispatched chunk k+1 sees stopped=True and
        # freezes params/opt/plateau — the final state is bit-identical to
        # the unpipelined one (only the RNG key advances, and the frozen
        # steps never consume it for updates). Cost: at most one chunk of
        # wasted device time per early-stopped fit.
        self.pipeline = pipeline
        # per-Solver precision snapshot (None -> process default at trace
        # time). Snapshotting at construction prevents a later model with a
        # different cfg.matmul_precision from changing this solver's
        # not-yet-traced chunk programs (ADVICE r2).
        self.precision = precision
        self._param_struct = None  # (treedef, shapes) pinned at first fit
        self.loss_fn = loss_fn
        self.lr = lr
        self.max_n_iters = max_n_iters
        self.chunk_size = min(chunk_size, max_n_iters)
        self.early_stop = early_stop
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._plateau_kw = dict(
            factor=plateau_factor, patience=plateau_patience,
            threshold=plateau_threshold,
            min_scale=plateau_min_lr / lr,
            stop_scale=early_stop_min_lr / lr,
            early_stop=early_stop,
        )
        self.opt = optax.adam(lr)
        self._chunk_fns: Dict[int, Callable] = {}
        self._unravel = None
        self._unravel_jit = None   # jitted: ONE dispatch instead of one
        #                            eager slice/reshape per param leaf
        #                            (~16 tunnel dispatches for a 3x32 SIREN)
        self._init_fn = None

    # ---- loss/grad with optional collocation sharding ----
    def _value_and_grad(self, params, key, aux):
        def total(p, k, a):
            if self.flatten:
                p = self._unravel(p)
            ld = self.loss_fn(p, k, a)
            return sum(ld.values()), ld

        if self.mesh is None or self.mesh.size == 1:
            (tot, ld), grads = jax.value_and_grad(total, has_aux=True)(
                params, key, aux)
            return ld, grads

        axis = self.mesh_axis

        def local(p, k, a):
            # per-device collocation batch: fold the mesh coordinate into the
            # RNG key; grads/losses are pmean'ed over ICI.
            lk = jax.random.fold_in(k, jax.lax.axis_index(axis))
            (tot, ld), grads = jax.value_and_grad(total, has_aux=True)(p, lk, a)
            ld = jax.lax.pmean(ld, axis)
            grads = jax.lax.pmean(grads, axis)
            return ld, grads

        return jax.shard_map(local, mesh=self.mesh,
                             in_specs=(P(), P(), P()),
                             out_specs=(P(), P()))(params, key, aux)

    # ---- one Adam + scheduler step ----
    def _step(self, aux, carry: SolveState, _):
        key, sub = jax.random.split(carry.key)
        ld, grads = self._value_and_grad(carry.params, sub, aux)

        updates, opt_state = self.opt.update(grads, carry.opt_state, carry.params)
        updates = _tree_scale(updates, carry.plateau.scale)
        new_params = optax.apply_updates(carry.params, updates)

        # a non-finite loss/grad iteration (e.g. a collapsed deformation
        # gradient under hard contact) must not be WRITTEN: once params go
        # NaN every later iteration is lost. Skip the update and keep
        # optimizing — strictly better than the reference, which trains
        # straight into NaN (its diff ops only *report* a status flag,
        # base/diff_ops.py:27-29).
        finite = jnp.isfinite(ld["main"])
        for leaf in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(leaf))

        # freeze everything once early-stopped (in-device 'break')
        active = ~carry.plateau.stopped
        write = active & finite
        params = _tree_where(write, new_params, carry.params)
        opt_state = _tree_where(write, opt_state, carry.opt_state)
        plateau = plateau_update(carry.plateau, ld["main"], **self._plateau_kw)
        plateau = jax.tree_util.tree_map(
            lambda n, o: jnp.where(write, n, o), plateau, carry.plateau)

        out = dict(ld)
        out["_lr"] = self.lr * carry.plateau.scale
        out["_active"] = active
        if self.debug_nan:
            # per-iteration grad NaN flag (the reference carries NaN status
            # out of its diff ops, base/diff_ops.py:27-29,78-80)
            leaves = jax.tree_util.tree_leaves(grads)
            out["_nan"] = jnp.any(
                jnp.stack([jnp.any(jnp.isnan(l)) for l in leaves]))
        return SolveState(params, opt_state, plateau, key), out

    def _get_chunk_fn(self, length: int):
        if length not in self._chunk_fns:
            from ..ops.precision import matmul_precision_name
            level = self.precision or matmul_precision_name()

            @partial(jax.jit, donate_argnums=0)
            def run_chunk(state: SolveState, aux):
                # context default for ops without an explicit precision
                # (einsums in diff/elasticity paths); the SIREN chains pass
                # the per-model knob explicitly (ops/precision.py)
                with jax.default_matmul_precision(level):
                    state, outs = jax.lax.scan(partial(self._step, aux),
                                               state, None, length=length)
                # stack the per-iteration scalars into ONE (length, K)
                # array: device_get of a dict is one host transfer per
                # leaf, and on the tunneled TPU each transfer is a
                # ~20-30 ms round trip — measured as the dominant
                # per-chunk overhead (tools/overhead_probe.py: the full
                # compiled iteration is 0.354 ms; the old per-leaf
                # fetches added ~0.5 ms/iter of host time at chunk=1000)
                keys = sorted(outs)
                self._out_keys = keys          # trace-time constant
                stacked = jnp.stack(
                    [outs[k].astype(jnp.float32) for k in keys], axis=1)
                return state, stacked
            self._chunk_fns[length] = run_chunk
        return self._chunk_fns[length]

    # ---- public API ----
    def init_state(self, params, key) -> SolveState:
        if self.flatten:
            # the unravel closure is structural (treedef + shapes); it is
            # identical across fits of the same phase, so reusing the cached
            # compiled chunk (which baked it in at trace time) stays valid.
            # Guard that invariant: a different treedef/shape layout of equal
            # flat size would silently unravel into the wrong layout
            # (ADVICE r2) — refuse instead.
            struct = (jax.tree_util.tree_structure(params),
                      tuple(l.shape for l in jax.tree_util.tree_leaves(params)))
            if self._param_struct is None:
                self._param_struct = struct
            elif struct != self._param_struct:
                raise ValueError(
                    "Solver.fit called with a param pytree whose "
                    f"treedef/shapes {struct} differ from the layout this "
                    f"solver first compiled for {self._param_struct}; build "
                    "a fresh Solver per param layout.")
            if self._unravel is None:
                from jax.flatten_util import ravel_pytree
                # one-time eager ravel just to capture the (structural)
                # unravel closure; every subsequent fit ravels inside the
                # jitted init program below.
                _, self._unravel = ravel_pytree(params)
                self._unravel_jit = jax.jit(self._unravel)
        if self._init_fn is None:
            @jax.jit
            def init_fn(params, key):
                if self.flatten:
                    from jax.flatten_util import ravel_pytree
                    p, _ = ravel_pytree(params)
                else:
                    # copy: the chunk runner donates its input state, and
                    # the caller's params buffers may be aliased elsewhere
                    # (e.g. as next step's frozen `prev` field);
                    # ravel_pytree above already copies
                    p = jax.tree_util.tree_map(jnp.copy, params)
                return SolveState(p, self.opt.init(p), plateau_init(), key)
            self._init_fn = init_fn
        # one compiled program builds the whole SolveState: the eager path
        # was ~8 separate tiny array creations per fit, each a dispatch to
        # the (tunneled) device
        return self._init_fn(params, key)

    def fit(self, params, key, aux=None, *, callback=None) -> FitResult:
        """Run the solve loop. callback(it, params, chunk_losses) is invoked
        after each chunk (host-side; analogue of the reference's per-
        vis_frequency hooks, base/baseModel.py:122-124)."""
        state = self.init_state(params, key)
        history: Dict[str, list] = {}
        it = 0            # iterations fetched & processed
        dispatched = 0    # iterations enqueued on the device
        inflight = []     # [(n, stacked)] dispatched, not yet fetched
        depth = 2 if self.pipeline else 1
        stopped = False
        while it < self.max_n_iters and not stopped:
            # keep `depth` chunks enqueued: the device runs chunk k+1 while
            # the host blocks on chunk k's scalar fetch (one tunnel round
            # trip per chunk otherwise spent idle)
            while dispatched < self.max_n_iters and len(inflight) < depth:
                n = min(self.chunk_size, self.max_n_iters - dispatched)
                state, stacked = self._get_chunk_fn(n)(state, aux)
                inflight.append((n, stacked))
                dispatched += n
            n, stacked = inflight.pop(0)
            host = np.asarray(jax.device_get(stacked))   # one transfer
            outs = {k: host[:, i] for i, k in enumerate(self._out_keys)}
            active = outs.pop("_active") > 0.5
            if self.debug_nan and (outs.get("_nan", np.zeros(1)) > 0.5).any():
                import warnings
                warnings.warn(f"NaN gradients detected in chunk ending at "
                              f"iteration {it + n}")
            n_active = int(active.sum())
            for k, v in outs.items():
                history.setdefault(k, []).append(v[:n_active] if n_active < n else v)
            it += n
            if callback is not None:
                # report the last *active* loss, not the value logged after
                # the freeze latch (it is stale once early-stop triggers).
                # With pipelining, the params handed to the callback reflect
                # the most recently *dispatched* chunk — up to one chunk
                # ahead of `it` (vis hooks see a slightly fresher field;
                # scalar reporting is exact).
                last = max(n_active - 1, 0) if n_active < n else n - 1
                cb_params = (self._unravel_jit(state.params) if self.flatten
                             else state.params)
                callback(it, cb_params,
                         {k: v[last] for k, v in outs.items()})
            if n_active < n:  # early-stopped inside this chunk
                it = it - n + n_active
                stopped = True
        # any still-inflight chunk was speculative: every one of its steps
        # ran with the freeze latch set, so `state` is bit-identical to the
        # unpipelined result; its scalar outputs are simply discarded.
        hist = {k: np.concatenate([np.atleast_1d(np.asarray(x)) for x in v])
                for k, v in history.items()}
        final = float(hist["main"][-1]) if "main" in hist and hist["main"].size else 0.0
        out_params = (self._unravel_jit(state.params) if self.flatten
                      else state.params)
        return FitResult(params=out_params, history=hist, n_iters=it,
                         final_loss=final)
