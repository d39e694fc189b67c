"""Pallas TPU ELL spmv sketch — DEMOTED EXPERIMENT (Mosaic cannot lower it).

Outcome: Mosaic's gather lowering supports only the 2D take_along_axis
forms (jax/_src/pallas/mosaic/lowering.py _gather_lowering_rule:
`tpu.dynamic_gather` along sublanes or lanes with indices the same shape
as the operand) — the arbitrary flat gather x[cols] this kernel needs
raises "Only 2D gather is supported". The production fix went the other
way: restructure the OPERATOR so XLA's gather cost shrinks — see
ops/linalg.BlockSparse (dense J-feature blocks per slot, ~J x fewer gather
indices per matvec) and the spmv probe in tools/perf_probe.py.

The vortex space-time least-squares solve is dominated by the ELL
gather-matvec `sum(vals * x[cols], -1)` and its transpose (ops/linalg.py
PaddedSparse). XLA's TPU lowering of the (R, NNZ) gather from the
coefficient vector runs ~100 ms per CGLS iteration at the reference scale
(400x10 basis: R=35600, NNZ=768, n_cols=192000) — no faster than 1-core
CPU and ~300x above the HBM floor (~218 MB of operands per matvec).

This kernel streams (vals, cols) row tiles through VMEM and keeps the
ENTIRE x vector VMEM-resident (192k f32 = 768 KB << 16 MB), so the gather
is VMEM-local; the multiply + row-reduction fuse into the same pass.
In-kernel dynamic gather support in Mosaic is probed at import-use time —
`ell_mv_supported()` — and the caller falls back to the XLA path when the
TPU toolchain cannot lower it.

Reference context: the reference's scipy `lsqr` runs this product on host
CPU (vortex/model.py:445-478); there is no reference kernel to compare.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256


def _cdiv(a, b):
    return -(-a // b)


def _ell_mv_kernel(x_ref, vals_ref, cols_ref, out_ref):
    # x: (NCOLS,) resident in VMEM; vals/cols: (TILE_R, NNZ) tile.
    gathered = jnp.take(x_ref[:], cols_ref[:], axis=0)
    out_ref[:] = jnp.sum(vals_ref[:] * gathered, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ell_mv(vals: jax.Array, cols: jax.Array, x: jax.Array,
           interpret: bool = False) -> jax.Array:
    """A @ x for the ELL (vals, cols) layout: (R,)."""
    R, NNZ = vals.shape
    n_cols = x.shape[0]
    r_pad = _cdiv(R, _TILE_R) * _TILE_R
    vals_p = jnp.pad(vals, ((0, r_pad - R), (0, 0)))
    cols_p = jnp.pad(cols, ((0, r_pad - R), (0, 0)))

    grid = (r_pad // _TILE_R,)
    out = pl.pallas_call(
        _ell_mv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_cols,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_R, NNZ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_R, NNZ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_R,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad,), jnp.float32),
        interpret=interpret,
    )(x, vals_p, cols_p)
    return out[:R]


def ell_mv_supported() -> bool:
    """Probe whether the current backend can lower the in-kernel gather
    (Mosaic dynamic-gather support varies by toolchain). Cheap one-shot
    compile on tiny shapes."""
    try:
        vals = jnp.ones((8, 8), jnp.float32)
        cols = jnp.zeros((8, 8), jnp.int32)
        x = jnp.ones((256,), jnp.float32)
        jax.block_until_ready(ell_mv(vals, cols, x))
        return True
    except Exception:
        return False
