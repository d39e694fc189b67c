"""Global matmul-precision knob for the derivative-chain hot paths.

TPU MXU f32 matmuls are emulated by multiple bf16 passes: DEFAULT = 1 pass,
HIGH = 3 passes (~f32-equivalent error), HIGHEST = 6 passes. The SIREN
derivative chains were pinned at HIGHEST in round 1 out of caution (second
derivatives of sin(30x) amplify rounding ~30x per order, SURVEY §7); since
the compiled solve chunks are MXU-bound at paper scale, the pass count is
directly proportional to step time. This knob lets the precision be set
per-run (config `--matmul_precision`) and measured: see COMPARISON.md for
the speed/accuracy table that picked the default.

Read at TRACE time: set it before building models/solvers (recompilation is
not triggered by changing it afterwards).
"""

from __future__ import annotations

import jax

_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_MATMUL_PRECISION = "highest"


def set_matmul_precision(level: str) -> None:
    global _MATMUL_PRECISION
    if level not in _LEVELS:
        raise ValueError(f"matmul_precision must be one of {list(_LEVELS)}, "
                         f"got {level!r}")
    _MATMUL_PRECISION = level


def matmul_precision() -> jax.lax.Precision:
    """The jax.lax.Precision for explicit `jnp.dot(..., precision=...)`."""
    return _LEVELS[_MATMUL_PRECISION]


def precision_of(level) -> jax.lax.Precision:
    """Resolve a per-model precision name to jax.lax.Precision; None falls
    back to the process-level knob. Per-model threading (networks.MLP
    .precision, Solver(precision=...)) is the production path — the global
    is only the default for code that hasn't snapshotted one (ADVICE r2:
    a process-global read at trace time lets a second model's cfg silently
    change the first model's not-yet-traced programs)."""
    if level is None:
        return _LEVELS[_MATMUL_PRECISION]
    if isinstance(level, jax.lax.Precision):
        return level
    if level not in _LEVELS:
        raise ValueError(f"matmul_precision must be one of {list(_LEVELS)}, "
                         f"got {level!r}")
    return _LEVELS[level]


def matmul_precision_name() -> str:
    return _MATMUL_PRECISION
