"""Row-ordering coherence probe for the block-ELL CGLS matvec pair.

Round-5 follow-up to the packed/bf16 null results (tools/perf_probe.py
spmv): at the 8x scale the AᵀA pair costs ~146 ms/iter while halving the
streamed vals bytes (bf16) moves it ~1% — the floor is the gather/scatter
INDEX traffic, not bytes. A least-squares system is invariant under row
permutation (min ||PAx - Pb|| == min ||Ax - b||), so rows can be freely
sorted to make consecutive rows gather overlapping X blocks (coherent
reads) and make the scatter's segment ids sorted-ish (scatter combining).
This probe measures that headroom on synthetic operators with the same
shape as the 8x channel system:

  random    — iid random cols (what the probe always measured; real
              assembly row order is sampling order, i.e. ~random too)
  sorted0   — same cols, rows sorted by cols[:, 0]
  clustered — best case: consecutive rows share an identical column set
              (KNN patterns cluster; an upper bound on what sorting buys)

Reference being beaten: scipy.sparse.linalg.lsqr on CPU
(/root/reference/vortex/model.py:465).
"""

import json
import os
import sys
import time
from functools import partial

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp

from insr_pde_tpu.ops.linalg import BlockSparse


def _time(fn, n=3):
    """min-of-n wall clock of fn(r) -> scalar jax.Array.

    fn takes the rep index so each timed call has DISTINCT arguments, and
    the result is materialized with float(): on the tunneled axon backend
    block_until_ready can return without waiting (observed 2026-08-20 —
    repeat calls of an 8x-scale 146 ms program "completed" in 0.1 ms),
    so only a forced host fetch of a value that depends on the whole
    computation is a valid timing barrier."""
    float(fn(-1))  # compile + warm
    ts = []
    for r in range(n):
        t0 = time.perf_counter()
        float(fn(r))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    R0, S, J, NB = 35600, 48, 16, 12000
    scale = 8
    R = scale * R0
    key = jax.random.PRNGKey(7)
    kv, kc, kx = jax.random.split(key, 3)
    vals = jax.random.normal(kv, (R, S, J))
    x = jax.random.normal(kx, (NB * J,))

    cols_random = jax.random.randint(kc, (R, S), 0, NB)
    # rows sorted by primary column (stable, host-side like the assembly
    # would do it)
    order = jnp.argsort(cols_random[:, 0])
    cols_sorted = cols_random[order]
    # clustered best case: each group of R//NB consecutive rows shares one
    # contiguous K-neighborhood of columns
    base = (jnp.arange(R) * NB // R)[:, None]          # (R, 1) sorted block
    offs = jnp.arange(S)[None, :] % 8                  # 8 distinct cols/row
    cols_clustered = (base + offs) % NB

    @partial(jax.jit, static_argnames=("k",))
    def chain(v, c, xc, eps, *, k):
        A = BlockSparse(v, c, NB)

        def body(s, _):
            return s + eps * A.rmv(A.mv(s)), None

        out, _ = jax.lax.scan(body, xc, None, length=k)
        return jnp.sum(out)

    def pair_ms(c):
        # eps varies per rep (1e-30*r is numerically negligible) so no
        # (program, args) pair repeats — defeats any backend result reuse
        t1 = _time(lambda r: chain(vals, c, x, jnp.float32(1e-30 * (r + 2)),
                                   k=1))
        t9 = _time(lambda r: chain(vals, c, x, jnp.float32(1e-29 * (r + 2)),
                                   k=9))
        return max(t9 - t1, 0.0) / 8 * 1e3

    for label, c in (("random", cols_random), ("sorted0", cols_sorted),
                     ("clustered", cols_clustered)):
        ms = pair_ms(c)
        print(json.dumps({"probe": "coherence", "layout": label,
                          "rows": R, "pair_scanned_ms": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
