"""Pallas TPU kernels: fused SIREN value+gradient+Laplacian, forward AND
hand-scheduled backward. DEMOTED EXPERIMENT — measured negative result.

Measured on the TPU (tools/perf_probe.py vgl, paper-scale pressure phase,
16384 pts, 3x32 SIREN): grad program 28.3 ms with these kernels vs 0.12 ms
for the XLA forward-Laplacian chain + autodiff — 235x slower, even after
replacing all in-kernel transposes with row/lane-contracting dot_generals.
Why XLA wins here: its grad program keeps every dot at (16384, 32)x(32, 32)
— full batch rows amortize MXU latency, and 0.12 ms for ~1.6 GFLOP is
~13 TFLOP/s, i.e. the width-32 ceiling of the 128-lane MXU (32/128 of peak)
— XLA is already at the hardware limit set by the net width, with all
elementwise ops fused. These kernels instead tile the batch to 256-row
blocks (64 sequential grid steps) and pad width 32 -> 128 (16x redundant
FLOPs); each grid step runs ~50 small MXU ops serialized by the layer-chain
dependency, which is latency-bound. A Pallas kernel can only match, never
beat, XLA on this shape; custom kernels pay off where XLA leaves layout or
fusion on the table (see ops/pallas_siren.py forward at width 128: 1.21x),
not where the program is a dependent chain of MXU-resident dots.

Kept (with the equivalence tests, test_pallas_vgl.py) as the documented
second negative result alongside pallas_trainer.py.

The fluid pressure Poisson solve is the reference's hottest region
(reference fluid/model.py:103-125; SURVEY.md §3.1): every Adam iteration
needs lap(p) on 16k collocation points AND its gradient w.r.t. the network
params. The XLA path (ops/forward_laplacian.py + reverse-mode autodiff)
lowers to ~dozens of small ops per layer — each a round-trip through HBM at
(N, 32)-ish shapes that cannot amortize dispatch or feed the MXU.

These kernels run the ENTIRE forward-Laplacian chain — per layer
    z = h W + b,  Jz_a = J_a W,  Lz = L W
    h' = sin(wz), J'_a = w cos(wz) Jz_a,
    L' = w cos(wz) Lz - w^2 sin(wz) * sum_a Jz_a^2
— inside one kernel per batch tile (one HBM read of the coords tile, one
write of u/J/L), and the backward pass as a second kernel implementing the
hand-derived reverse sweep (recompute-forward-then-backprop; cotangents for
value, Jacobian and Laplacian simultaneously):

    gz    = gh'.wc - w^2 s (sum_a gJ'_a.Jz_a) - gL'.(w^2 s Lz + w^3 c Q)
    gJz_a = gJ'_a.wc - 2 w^2 s gL'.Jz_a
    gLz   = gL'.wc
    gW    = h^T gz + sum_a J_a^T gJz_a + L^T gLz ;  gb = sum_n gz
    gh    = gz W^T ; gJ_a = gJz_a W^T ; gL = gLz W^T

Weight gradients accumulate across batch tiles in a VMEM-resident output
block (constant index_map; TPU grid iterations are sequential). Exposed as a
`jax.custom_vjp` with exact cotangents for params AND coords, equivalence-
pinned against autodiff of the XLA chain in tests/test_pallas_vgl.py.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OMEGA_0 = 30.0
_LANE = 128
_TILE_N = 256

Params = List[Tuple[jax.Array, jax.Array]]


def _cdiv(a, b):
    return -(-a // b)


def _stack_params(params: Params):
    """Zero-pad every layer's (W, b) to (LANE, LANE)/(1, LANE) and stack:
    (n_layers, LANE, LANE), (n_layers, 1, LANE)."""
    ws, bs = [], []
    for w, b in params:
        ws.append(jnp.pad(w, ((0, _LANE - w.shape[0]),
                              (0, _LANE - w.shape[1]))))
        bs.append(jnp.pad(b, (0, _LANE - b.shape[0]))[None, :])
    return jnp.stack(ws), jnp.stack(bs)


# Explicit, Mosaic-supported precision on every kernel dot: the solver
# compiles phase programs under jax.default_matmul_precision(cfg knob), and
# Mosaic's dot lowering rejects the ambient HIGH (3-pass) level — only
# DEFAULT/HIGHEST lower. The chains carry second derivatives of sin(30x)
# (~30x rounding amplification per order), so pin HIGHEST, never DEFAULT.
_PREC = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_PREC)


def _dot_rows(a, b):
    """a^T @ b without materializing the transpose: contract the ROW axis
    directly (Mosaic lowers an explicit .T to a VPU relayout; dot_general
    with row-contracting dims feeds the MXU straight)."""
    return jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


def _forward_chain(x, w_ref, b_ref, n_layers, d, omega, keep=False):
    """Shared in-kernel forward sweep. Returns the (h, J, L) chain outputs;
    with keep=True also returns the per-layer intermediates the backward
    sweep needs."""
    h = x
    J = [(jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], _LANE), 1) == a)
         .astype(jnp.float32) for a in range(d)]
    L = jnp.zeros_like(x)
    saved = []
    for i in range(n_layers):
        w = w_ref[i]
        b = b_ref[i]
        z = _dot(h, w) + b
        Jz = [_dot(J[a], w) for a in range(d)]
        Lz = _dot(L, w)
        if keep:
            saved.append((h, J, L, z, Jz, Lz))
        if i < n_layers - 1:
            c = jnp.cos(omega * z)
            s = jnp.sin(omega * z)
            h = s
            J = [omega * c * Jz[a] for a in range(d)]
            Q = sum(Jz[a] * Jz[a] for a in range(d))
            L = omega * c * Lz - (omega * omega) * s * Q
        else:
            h, J, L = z, Jz, Lz
    return (h, J, L, saved) if keep else (h, J, L)


def _vgl_fwd_kernel(n_layers, d, omega, x_ref, w_ref, b_ref,
                    u_ref, j_ref, l_ref):
    h, J, L = _forward_chain(x_ref[:], w_ref, b_ref, n_layers, d, omega)
    u_ref[:] = h
    for a in range(d):
        j_ref[a] = J[a]
    l_ref[:] = L


def _vgl_bwd_kernel(n_layers, d, omega, x_ref, w_ref, b_ref,
                    gu_ref, gj_ref, gl_ref, gw_ref, gb_ref, gx_ref):
    # recompute the forward chain, keeping per-layer residuals in VMEM
    _, _, _, saved = _forward_chain(x_ref[:], w_ref, b_ref, n_layers, d,
                                    omega, keep=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        gw_ref[...] = jnp.zeros(gw_ref.shape, jnp.float32)
        gb_ref[...] = jnp.zeros(gb_ref.shape, jnp.float32)

    gh = gu_ref[:]
    gJ = [gj_ref[a] for a in range(d)]
    gL = gl_ref[:]
    w2 = omega * omega
    for i in reversed(range(n_layers)):
        h, J, L, z, Jz, Lz = saved[i]
        if i < n_layers - 1:
            c = jnp.cos(omega * z)
            s = jnp.sin(omega * z)
            Q = sum(Jz[a] * Jz[a] for a in range(d))
            wc = omega * c
            gz = (gh * wc
                  - w2 * s * sum(gJ[a] * Jz[a] for a in range(d))
                  - gL * (w2 * s * Lz + omega * w2 * c * Q))
            gJz = [gJ[a] * wc - 2.0 * w2 * s * gL * Jz[a] for a in range(d)]
            gLz = gL * wc
        else:
            gz, gJz, gLz = gh, gJ, gL
        w = w_ref[i]
        gw = _dot_rows(h, gz) + _dot_rows(L, gLz)
        for a in range(d):
            gw = gw + _dot_rows(J[a], gJz[a])
        gw_ref[i] += gw
        gb_ref[i] += jnp.sum(gz, axis=0, keepdims=True)
        # gh = gz W^T: contract the LANE axis of both (again no transpose)
        def _dot_cols(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC)
        gh = _dot_cols(gz, w)
        gJ = [_dot_cols(gJz[a], w) for a in range(d)]
        gL = _dot_cols(gLz, w)
    # d(chain)/d(coords): J/L inits are constants, so only gh survives
    gx_ref[:] = gh


def _pad_rows(x, n_pad):
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, _LANE - x.shape[1])))


def _fwd_impl(params: Params, coords: jax.Array, omega: float,
              interpret: bool = False):
    n, d = coords.shape
    m = params[-1][0].shape[1]
    n_layers = len(params)
    n_pad = _cdiv(n, _TILE_N) * _TILE_N
    x = _pad_rows(coords, n_pad)
    ws, bs = _stack_params(params)

    grid = (n_pad // _TILE_N,)
    row_spec = pl.BlockSpec((_TILE_N, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    j_spec = pl.BlockSpec((d, _TILE_N, _LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((n_layers, _LANE, _LANE), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((n_layers, 1, _LANE), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    u, J, L = pl.pallas_call(
        functools.partial(_vgl_fwd_kernel, n_layers, d, omega),
        grid=grid,
        in_specs=[row_spec, w_spec, b_spec],
        out_specs=(row_spec, j_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((d, n_pad, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32)),
        interpret=interpret,
    )(x, ws, bs)
    return (u[:n, :m], jnp.swapaxes(J[:, :n, :m], 0, 1), L[:n, :m])


def _bwd_impl(params: Params, coords: jax.Array, gu, gJ, gL, omega: float,
              interpret: bool = False):
    n, d = coords.shape
    m = params[-1][0].shape[1]
    n_layers = len(params)
    n_pad = _cdiv(n, _TILE_N) * _TILE_N
    x = _pad_rows(coords, n_pad)
    ws, bs = _stack_params(params)
    gu_p = _pad_rows(gu, n_pad)
    gl_p = _pad_rows(gL, n_pad)
    gj_p = jnp.pad(jnp.swapaxes(gJ, 0, 1),
                   ((0, 0), (0, n_pad - n), (0, _LANE - m)))

    grid = (n_pad // _TILE_N,)
    row_spec = pl.BlockSpec((_TILE_N, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    j_spec = pl.BlockSpec((d, _TILE_N, _LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((n_layers, _LANE, _LANE), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((n_layers, 1, _LANE), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    gw, gb, gx = pl.pallas_call(
        functools.partial(_vgl_bwd_kernel, n_layers, d, omega),
        grid=grid,
        in_specs=[row_spec, w_spec, b_spec, row_spec, j_spec, row_spec],
        out_specs=(w_spec, b_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((n_layers, _LANE, _LANE),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_layers, 1, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32)),
        interpret=interpret,
    )(x, ws, bs, gu_p, gj_p, gl_p)

    gparams = [(gw[i, :w.shape[0], :w.shape[1]], gb[i, 0, :b.shape[0]])
               for i, (w, b) in enumerate(params)]
    return gparams, gx[:n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def siren_vgl(params: Params, coords: jax.Array, omega: float = OMEGA_0):
    """(u (N, m), J (N, d, m), L (N, m)) of a sine-MLP, computed by the
    fused Pallas forward kernel; gradients (params AND coords) by the
    hand-scheduled Pallas backward kernel."""
    return _fwd_impl(params, coords, omega)


def _vgl_fwd(params, coords, omega):
    return _fwd_impl(params, coords, omega), (params, coords)


def _vgl_bwd(omega, res, g):
    params, coords = res
    gu, gJ, gL = g
    return _bwd_impl(params, coords, gu, gJ, gL, omega)


siren_vgl.defvjp(_vgl_fwd, _vgl_bwd)


def siren_vgl_interpret(params: Params, coords: jax.Array,
                        omega: float = OMEGA_0):
    """Interpreter-mode fwd (CPU tests)."""
    return _fwd_impl(params, coords, omega, interpret=True)


def siren_vgl_bwd_interpret(params, coords, gu, gJ, gL,
                            omega: float = OMEGA_0):
    """Interpreter-mode bwd (CPU tests)."""
    return _bwd_impl(params, coords, gu, gJ, gL, omega, interpret=True)
