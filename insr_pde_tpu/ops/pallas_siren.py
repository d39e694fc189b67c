"""Pallas TPU kernel: fused SIREN MLP forward.

The SIREN chains are narrow (hidden width 20-128) and deep-ish (3-5 layers);
XLA lowers each Linear+sin as its own HBM-roundtrip when fusion across dots
fails. This kernel keeps the ENTIRE chain's activations in VMEM per batch
tile — one HBM read of the coords tile, one HBM write of the output tile,
weights resident in VMEM (a few KB) — i.e. HBM traffic is input+output only.

Gradients: wrapped in `jax.custom_vjp`; the backward recomputes through the
pure-XLA `apply` path (exact same math, f32, HIGHEST matmul precision), so
the kernel is safe to use inside loss functions while the nested-derivative
paths (laplace etc.) keep their well-tested autodiff route.

The kernel pads the feature axis to the 128-lane width (SIREN widths are
below one MXU tile; padding columns are zero so the extra lanes compute
zeros and are sliced away).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OMEGA_0 = 30.0
_LANE = 128
_TILE_N = 512


def _pad_to(x: jax.Array, rows: int, cols: int) -> jax.Array:
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _siren_kernel(n_layers: int, *refs):
    """refs = [x_ref, W0, b0, W1, b1, ..., out_ref]. All feature dims are
    padded to the 128 lane width; weights' padding is zero."""
    x_ref = refs[0]
    out_ref = refs[-1]
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[1 + 2 * i][:]
        b = refs[2 + 2 * i][:]
        # explicit precision: Mosaic rejects the ambient HIGH level the
        # solver's default_matmul_precision context would otherwise inject
        h = jnp.dot(h, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b
        if i < n_layers - 1:
            h = jnp.sin(OMEGA_0 * h)
    out_ref[:] = h


def _forward_pallas(params: Sequence[Tuple[jax.Array, jax.Array]],
                    coords: jax.Array) -> jax.Array:
    n = coords.shape[0]
    in_dim = coords.shape[1]
    out_dim = params[-1][0].shape[1]
    n_layers = len(params)

    n_pad = ((n + _TILE_N - 1) // _TILE_N) * _TILE_N
    x = _pad_to(coords, n_pad, _LANE)

    flat_params: List[jax.Array] = []
    in_specs = [pl.BlockSpec((_TILE_N, _LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for (w, b) in params:
        wp = _pad_to(w, _LANE, _LANE)
        bp = jnp.pad(b, (0, _LANE - b.shape[0]))[None, :]
        flat_params += [wp, bp]
        in_specs += [pl.BlockSpec((_LANE, _LANE), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, _LANE), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        functools.partial(_siren_kernel, n_layers),
        grid=(n_pad // _TILE_N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE_N, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
    )(x, *flat_params)
    return out[:n, :out_dim]


def _forward_reference(params, coords):
    """Pure-XLA forward with identical math (networks.MLP.apply for the
    sine nonlinearity, omega_0 = 30, HIGHEST matmul precision)."""
    h = coords
    for i, (w, b) in enumerate(params):
        h = jnp.dot(h, w, precision=jax.lax.Precision.HIGHEST) + b
        if i < len(params) - 1:
            h = jnp.sin(OMEGA_0 * h)
    return h


@jax.custom_vjp
def siren_forward(params, coords):
    """Fused SIREN forward (sine hidden layers, linear output)."""
    return _forward_pallas(params, coords)


def _fwd(params, coords):
    return _forward_pallas(params, coords), (params, coords)


def _bwd(res, g):
    params, coords = res
    _, vjp = jax.vjp(_forward_reference, params, coords)
    return vjp(g)


siren_forward.defvjp(_fwd, _bwd)


def siren_forward_interpret(params, coords):
    """Interpreter-mode variant for CPU tests."""
    n = coords.shape[0]
    in_dim = coords.shape[1]
    out_dim = params[-1][0].shape[1]
    n_layers = len(params)
    n_pad = ((n + _TILE_N - 1) // _TILE_N) * _TILE_N
    x = _pad_to(coords, n_pad, _LANE)
    flat_params = []
    for (w, b) in params:
        flat_params += [_pad_to(w, _LANE, _LANE),
                        jnp.pad(b, (0, _LANE - b.shape[0]))[None, :]]
    out = pl.pallas_call(
        functools.partial(_siren_kernel, n_layers),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
        interpret=True,
    )(x, *flat_params)
    return out[:n, :out_dim]
