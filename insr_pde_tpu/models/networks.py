"""Coordinate networks as pure functions over param pytrees.

TPU-native redesign of the reference network zoo (reference: base/networks.py).
The SIREN MLP keeps the exact reference architecture and init distributions
(ω0=30, U[±1/n] first layer, U[±√(6/n)/30] elsewhere — base/networks.py:21-93)
so that converged fields are distributionally comparable, but is a pure
`apply(params, x)` function: weights are a pytree that the per-timestep solver
re-optimizes functionally (state -> state), and XLA fuses the whole sine-MLP
chain into one program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

Params = List[Tuple[jax.Array, jax.Array]]  # [(W (in,out), b (out,)), ...]

OMEGA_0 = 30.0  # SIREN frequency factor (reference base/networks.py:27)

def _linear_bias_init(key, fan_in, fan_out, dtype):
    # torch.nn.Linear default bias init: U[-1/sqrt(fan_in), 1/sqrt(fan_in)]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (fan_out,), dtype, -bound, bound)


@dataclass(frozen=True)
class MLP:
    """SIREN-style MLP: Linear+nl, num_hidden_layers x (Linear+nl), Linear.

    Architecture parity with reference base/networks.py:30-71.
    """
    in_features: int
    out_features: int
    num_hidden_layers: int = 3
    hidden_features: int = 64
    nonlinearity: str = "sine"
    outermost_linear: bool = True
    # per-model matmul precision snapshot (None -> process default). Stored
    # on the module so two models with different cfg.matmul_precision can't
    # cross-contaminate each other's traces (ADVICE r2).
    precision: str | None = None

    @property
    def layer_dims(self) -> List[Tuple[int, int]]:
        dims = [(self.in_features, self.hidden_features)]
        dims += [(self.hidden_features, self.hidden_features)] * self.num_hidden_layers
        dims += [(self.hidden_features, self.out_features)]
        return dims

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = []
        for i, (fan_in, fan_out) in enumerate(self.layer_dims):
            key, kw, kb = jax.random.split(key, 3)
            if self.nonlinearity == "sine":
                if i == 0:
                    # first_layer_sine_init (reference base/networks.py:88-93)
                    bound = 1.0 / fan_in
                else:
                    # sine_init (reference base/networks.py:80-85)
                    bound = math.sqrt(6.0 / fan_in) / OMEGA_0
                w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
            elif self.nonlinearity == "relu":
                # kaiming normal, fan_in, relu gain (base/networks.py:74-77)
                std = math.sqrt(2.0 / fan_in)
                w = std * jax.random.normal(kw, (fan_in, fan_out), dtype)
            elif self.nonlinearity == "elu":
                # init_weights_elu (base/networks.py:96-100)
                std = math.sqrt(1.5505188080679277) / math.sqrt(fan_in)
                w = std * jax.random.normal(kw, (fan_in, fan_out), dtype)
            else:
                raise NotImplementedError(self.nonlinearity)
            b = _linear_bias_init(kb, fan_in, fan_out, dtype)
            params.append((w, b))
        return params

    def apply(self, params: Params, coords: jax.Array,
              weights: jax.Array | None = None) -> jax.Array:
        """Forward pass on (..., in_features) coords.

        Matmul precision is the per-model snapshot (self.precision, set from
        cfg at construction; ops/precision.py global is only the fallback):
        second-order derivatives of sin(30x) amplify rounding by ~30 per
        derivative order, so the MXU's 1-pass bf16 DEFAULT is not acceptable
        here; HIGH (3-pass, ~f32-equivalent) vs HIGHEST (6-pass) is a
        measured speed/accuracy trade (COMPARISON.md).
        """
        from ..ops.precision import precision_of
        prec = precision_of(self.precision)
        h = coords
        n_layers = len(params)
        for i, (w, b) in enumerate(params):
            h = jnp.dot(h, w, precision=prec) + b
            is_last = i == n_layers - 1
            if not is_last or not self.outermost_linear:
                h = self._nl(h)
        if weights is not None:
            h = h * weights
        return h

    def _nl(self, x):
        if self.nonlinearity == "sine":
            return jnp.sin(OMEGA_0 * x)
        if self.nonlinearity == "relu":
            return jax.nn.relu(x)
        if self.nonlinearity == "elu":
            return jax.nn.elu(x)
        raise NotImplementedError(self.nonlinearity)

    def point_fn(self, params: Params):
        """Return fn mapping one point (in_features,) -> (out_features,),
        for use with ops.diff transforms."""
        return lambda x: self.apply(params, x)

    @property
    def _is_siren(self) -> bool:
        return self.nonlinearity == "sine" and self.outermost_linear

    @property
    def second_order_ok(self) -> bool:
        """Whether the field has meaningful second derivatives. relu MLPs
        are piecewise-linear: lap(u) = 0 almost everywhere, so any
        Poisson-type loss through them silently degenerates (consumers
        like the fluid pressure solve must refuse; VERDICT r2 weak #5)."""
        return self.nonlinearity in ("sine", "elu")

    def value_grad(self, params: Params, coords: jax.Array):
        """(u (N, m), J (N, d, m)): batched forward-Laplacian chain for the
        sine MLP, vmapped-jacfwd autodiff otherwise — the fast path is only
        valid for the exact sin(ω0·) layer chain (ADVICE r1: relu/elu nets
        must not get sine derivatives)."""
        if self._is_siren:
            from ..ops.forward_laplacian import value_grad as _vg
            return _vg(params, coords, precision=self.precision)
        return _value_grad_autodiff(self.point_fn(params),
                                    lambda x: self.apply(params, x), coords)

    def value_grad_laplacian(self, params: Params, coords: jax.Array):
        """(u (N, m), J (N, d, m), L (N, m)); same dispatch as value_grad.

        The XLA forward-Laplacian chain is the production path on purpose:
        for these net widths XLA already runs the (N, 32)x(32, 32) dot
        chain at the width-limited MXU ceiling, and the fused Pallas
        value+grad+Laplacian kernel pair measured 235x SLOWER on the grad
        program (tools/experiments/pallas_vgl.py has the kernels, the
        measurement, and the analysis)."""
        if self._is_siren:
            from ..ops.forward_laplacian import value_grad_laplacian as _vgl
            return _vgl(params, coords, precision=self.precision)
        return _value_grad_laplacian_autodiff(
            self.point_fn(params), lambda x: self.apply(params, x), coords)

    def apply_fused(self, params: Params, coords: jax.Array) -> jax.Array:
        """Forward via the Pallas fused kernel (ops/pallas_siren.py): the
        whole layer chain stays in VMEM per batch tile. Sine nonlinearity
        and 2-D inputs only; gradients fall back to the XLA path through a
        custom VJP. Prefer for large inference batches (vis/output grids)."""
        if self.nonlinearity != "sine" or not self.outermost_linear:
            return self.apply(params, coords)
        # Mosaic kernels need TPU hardware ('axon' = tunneled TPU platform)
        if jax.default_backend() not in ("tpu", "axon"):
            return self.apply(params, coords)
        from ..ops.pallas_siren import siren_forward
        flat = coords.reshape(-1, coords.shape[-1])
        out = siren_forward(params, flat)
        return out.reshape(*coords.shape[:-1], self.out_features)


@dataclass(frozen=True)
class HashGridField:
    """Multires-hash-grid-encoded field: instant-NGP tables + a small relu
    MLP head. Makes the reference's never-wired encoder
    (vortex/hash_encoding.py — SURVEY §2.10) a usable `--network hashgrid`
    choice. Coordinates are mapped [-1,1]^d -> [0,1]^d.

    Caveat: multilinear interpolation is piecewise-linear, so second
    derivatives vanish a.e. — suited to value-fit / first-order losses
    (advection, projection), not the Poisson pressure solve.
    """
    in_features: int
    out_features: int
    num_hidden_layers: int = 2
    hidden_features: int = 64
    n_levels: int = 8
    n_features_per_level: int = 2
    log2_hashmap_size: int = 15
    base_resolution: int = 8
    finest_resolution: int = 256
    # per-model matmul precision snapshot for the MLP head (same contract
    # as MLP.precision; None -> process default)
    precision: str | None = None

    def _encoder(self):
        from .encodings import MultiResHashGrid
        return MultiResHashGrid(
            dim=self.in_features, n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            finest_resolution=self.finest_resolution)

    def _head(self):
        enc = self._encoder()
        return MLP(enc.output_dim, self.out_features,
                   self.num_hidden_layers, self.hidden_features,
                   nonlinearity="relu", precision=self.precision)

    def init(self, key: jax.Array, dtype=jnp.float32):
        k_enc, k_mlp = jax.random.split(key)
        return {"tables": self._encoder().init(k_enc, dtype),
                "head": self._head().init(k_mlp, dtype)}

    def apply(self, params, coords: jax.Array) -> jax.Array:
        x01 = (coords + 1.0) * 0.5
        feats = self._encoder().apply(params["tables"], x01)
        return self._head().apply(params["head"], feats)

    def apply_fused(self, params, coords: jax.Array) -> jax.Array:
        return self.apply(params, coords)

    def point_fn(self, params):
        return lambda x: self.apply(params, x)

    @property
    def second_order_ok(self) -> bool:
        # multilinear interpolation: zero 2nd derivatives a.e. (class
        # docstring caveat) — Poisson-path consumers must refuse
        return False

    def value_grad(self, params, coords: jax.Array):
        return _value_grad_autodiff(self.point_fn(params),
                                    lambda x: self.apply(params, x), coords)

    def value_grad_laplacian(self, params, coords: jax.Array):
        # NB: multilinear interpolation has zero 2nd derivatives a.e. — the
        # Poisson pressure loss degenerates; see the class docstring caveat.
        return _value_grad_laplacian_autodiff(
            self.point_fn(params), lambda x: self.apply(params, x), coords)


def _value_grad_autodiff(point_fn, batch_fn, coords: jax.Array):
    """Autodiff fallback matching ops/forward_laplacian conventions:
    returns (u (N, m), J (N, d, m))."""
    from ..ops.diff import jacobian
    u = batch_fn(coords)
    J = jacobian(point_fn, coords)          # (N, m, d)
    return u, jnp.swapaxes(J, 1, 2)


def _value_grad_laplacian_autodiff(point_fn, batch_fn, coords: jax.Array):
    """Autodiff fallback: (u (N, m), J (N, d, m), L (N, m))."""
    from ..ops.diff import hessian, jacobian
    u = batch_fn(coords)
    J = jacobian(point_fn, coords)          # (N, m, d)
    H = hessian(point_fn, coords)           # (N, m, d, d)
    L = jnp.trace(H, axis1=2, axis2=3)      # (N, m)
    return u, jnp.swapaxes(J, 1, 2), L


def get_network(cfg: Any, in_features: int, out_features: int):
    """Network factory (reference base/networks.py:12-17; the reference's
    'grid' choice raises NotImplementedError — here 'hashgrid' is real)."""
    if cfg.network == "siren":
        return MLP(in_features, out_features, cfg.num_hidden_layers,
                   cfg.hidden_features, nonlinearity=cfg.nonlinearity,
                   precision=getattr(cfg, "matmul_precision", None))
    if cfg.network in ("grid", "hashgrid"):
        return HashGridField(in_features, out_features,
                             num_hidden_layers=cfg.num_hidden_layers,
                             hidden_features=cfg.hidden_features,
                             precision=getattr(cfg, "matmul_precision", None))
    raise NotImplementedError(f"network={cfg.network}")
