"""Matrix-free iterative linear algebra (batched PCG, CGLS, sparse ops).

TPU-native replacements for the reference's three linear-solver backends
(SURVEY.md §2.13):
  * `cg_batch` — batched preconditioned conjugate gradient (reference:
    vortex/cg_batch.py:5-116), here a `lax.while_loop` so the whole solve is
    one XLA program; the `CG` autograd wrapper (cg_batch.py:119-137) becomes
    a `jax.custom_vjp` whose backward pass is CG against the same operator.
  * `cgls` — conjugate gradient on the normal equations in factored form,
    the TPU replacement for scipy `sparse.linalg.lsqr` (reference:
    vortex/model.py:465) and for the CuPy sparse LU (vortex/sparse_solver.py:
    26-83): direct sparse factorization does not exist on TPU, and CGLS is
    mathematically equivalent to LSQR in exact arithmetic.
  * `PaddedSparse` — an ELL-style padded-row sparse operator (fixed nnz per
    row): `A @ v` is a gather + row dot, `A.T @ u` a segment-sum. This is the
    matrix the RBF solver assembles (reference builds scipy COO->CSR on host,
    vortex/model.py:403-433; here assembly and solve stay on device).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------- cg_batch


def cg_batch(A_bmm: Callable, B: jax.Array, M_bmm: Optional[Callable] = None,
             X0: Optional[jax.Array] = None, rtol: float = 1e-3,
             atol: float = 0.0, maxiter: Optional[int] = None):
    """Solve a batch of SPD systems A_i X_i = B_i, B: (K, n, m).

    Matches the reference semantics (vortex/cg_batch.py:5-116): stopping when
    per-batch residual norms fall under max(rtol*|B|, atol); fixed-point
    iterates freeze once converged (the while_loop runs until all batches
    converge or maxiter).
    Returns (X, info dict with 'niter', 'optimal').
    """
    K, n, m = B.shape
    if M_bmm is None:
        M_bmm = lambda x: x
    if X0 is None:
        X0 = M_bmm(B)
    if maxiter is None:
        maxiter = 5 * n

    stop = jnp.maximum(rtol * jnp.linalg.norm(B, axis=1), atol)  # (K, m)

    def res_ok(X):
        r = jnp.linalg.norm(A_bmm(X) - B, axis=1)
        return jnp.all(r <= stop)

    class _State(NamedTuple):
        X: jax.Array
        R: jax.Array
        rz: jax.Array      # <R, Z> of current iterate
        P: jax.Array
        k: jax.Array
        done: jax.Array

    R0 = B - A_bmm(X0)
    Z0 = M_bmm(R0)
    rz0 = jnp.sum(R0 * Z0, axis=1, keepdims=True)
    state0 = _State(X0, R0, rz0, Z0,
                    jnp.asarray(0, jnp.int32), res_ok(X0))

    def cond(s: _State):
        return (~s.done) & (s.k < maxiter)

    def step(s: _State):
        AP = A_bmm(s.P)
        denom = jnp.sum(s.P * AP, axis=1, keepdims=True)
        denom = jnp.where(denom == 0, 1e-8, denom)
        alpha = s.rz / denom
        X = s.X + alpha * s.P
        R = s.R - alpha * AP
        Z = M_bmm(R)
        rz_new = jnp.sum(R * Z, axis=1, keepdims=True)
        beta = rz_new / jnp.where(s.rz == 0, 1e-8, s.rz)
        P = Z + beta * s.P
        return _State(X, R, rz_new, P, s.k + 1, res_ok(X))

    final = jax.lax.while_loop(cond, step, state0)
    return final.X, {"niter": final.k, "optimal": final.done}


def cg_solve(A_bmm: Callable, B: jax.Array, **kw) -> jax.Array:
    """Differentiable batched CG: backward pass solves A dX = dB with the
    same operator (reference CG autograd Function, vortex/cg_batch.py:119-137).
    A_bmm must be symmetric positive definite and is treated as constant."""

    @jax.custom_vjp
    def solve(B):
        return cg_batch(A_bmm, B, **kw)[0]

    def fwd(B):
        X = solve(B)
        return X, None

    def bwd(_, dX):
        dB = cg_batch(A_bmm, dX, **kw)[0]
        return (dB,)

    solve.defvjp(fwd, bwd)
    return solve(B)


# ------------------------------------------------------------------ CGLS


def cgls(A_mv: Callable, At_mv: Callable, b: jax.Array, x0: jax.Array,
         maxiter: int = 500, tol: float = 1e-8, damp: float = 0.0,
         rows_reduce: Callable = jnp.sum):
    """Damped least squares min_x |A x - b|^2 + damp^2 |x|^2 via CGLS
    (CG on the regularized normal equations in factored form;
    LSQR-with-damp-equivalent in exact arithmetic, and the numerically
    recommended form).

    A_mv: x -> A @ x (rows space), At_mv: r -> Aᵀ @ r (cols space).
    Returns (x, info dict with 'niter', 'resnorm' |Aᵀ(Ax-b) - damp² x|).
    """
    # rows_reduce: reduction over row-space quantities — jnp.sum locally,
    # or a psum-wrapped sum when rows are sharded over a mesh axis
    d2 = damp * damp
    r0 = b - A_mv(x0)
    s0 = At_mv(r0) - d2 * x0
    gamma0 = jnp.sum(s0 * s0)
    stop2 = (tol ** 2) * gamma0
    phi0 = rows_reduce(r0 * r0) + d2 * jnp.sum(x0 * x0)

    # f32 CG on the normal equations LOSES conjugacy once cond(AᵀA)
    # approaches 1/eps and can then diverge outright (measured on the
    # stream-vortex assembly: |Ax-b| fine at 2k iterations, 1e3x ABOVE |b|
    # by 4k). Track the best iterate of the true damped-LS functional
    # phi = |Ax-b|^2 + damp^2 |x|^2 and return it, and stop once phi has
    # grown 1e4x above the best seen — iterating further is noise.

    class _State(NamedTuple):
        x: jax.Array
        r: jax.Array
        p: jax.Array
        gamma: jax.Array
        k: jax.Array
        phi: jax.Array
        best_x: jax.Array
        best_phi: jax.Array

    def cond(st: _State):
        return ((st.gamma > stop2) & (st.k < maxiter)
                & (st.phi < 1e4 * st.best_phi))

    def step(st: _State):
        q = A_mv(st.p)
        denom = rows_reduce(q * q) + d2 * jnp.sum(st.p * st.p)
        alpha = st.gamma / jnp.where(denom == 0, 1e-30, denom)
        x = st.x + alpha * st.p
        r = st.r - alpha * q
        s = At_mv(r) - d2 * x
        gamma_new = jnp.sum(s * s)
        beta = gamma_new / jnp.where(st.gamma == 0, 1e-30, st.gamma)
        p = s + beta * st.p
        phi = rows_reduce(r * r) + d2 * jnp.sum(x * x)
        better = phi < st.best_phi
        best_x = jnp.where(better, x, st.best_x)
        best_phi = jnp.where(better, phi, st.best_phi)
        return _State(x, r, p, gamma_new, st.k + 1, phi, best_x, best_phi)

    st = jax.lax.while_loop(
        cond, step, _State(x0, r0, s0, gamma0, jnp.asarray(0, jnp.int32),
                           phi0, x0, phi0))
    # Healthy runs return the FINAL iterate: near convergence phi sits at
    # the f32 noise floor and cannot discriminate the still-improving
    # iterates (argmin-phi would freeze x several digits early). The best
    # iterate is only the fallback when the run actually diverged.
    x_out = jnp.where(st.phi <= 2.0 * st.best_phi, st.x, st.best_x)
    return x_out, {"niter": st.k, "resnorm": jnp.sqrt(st.gamma),
                   "best_phi": st.best_phi}


# ------------------------------------------------------ block preconditioner


def block_gram(vals: jax.Array, cols: jax.Array, n_blocks: int,
               row_chunk: int = 65536) -> jax.Array:
    """Per-block-column Gram blocks of a BlockSparse operator:
    G[b] = sum over (row, slot) pairs addressing block b of
    vals[r,s,:] vals[r,s,:]^T — the (J, J) diagonal blocks of AᵀA.

    Accumulated over `row_chunk`-sized slices with lax.scan: the naive
    einsum materializes an (R*S, J, J) intermediate — ~19 GB at the
    4x-density reference scale (measured HBM OOM on a 16 GB chip) — while
    the scanned accumulation peaks at row_chunk*J*J (~67 MB).

    Accepts either the (R, S, J) BlockSparse layout or the packed
    (R, S*J) BlockSparseP layout (detected by shape: packed vals are 2-D
    with a wider minor dim than cols)."""
    if vals.ndim == 2 and vals.shape != cols.shape:
        return _block_gram_packed(vals, cols, n_blocks)
    J = vals.shape[-1]
    v = vals.reshape(-1, J)
    c = cols.reshape(-1)
    n = v.shape[0]
    pad = (-n) % row_chunk
    if pad:
        # padded slots carry v = 0, so their outer products add nothing
        v = jnp.concatenate([v, jnp.zeros((pad, J), v.dtype)])
        c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
    v = v.reshape(-1, row_chunk, J)
    c = c.reshape(-1, row_chunk)

    def step(acc, vc):
        vi, ci = vc
        outer = jnp.einsum("ri,rj->rij", vi, vi)
        return acc + jax.ops.segment_sum(outer, ci,
                                         num_segments=n_blocks), None

    G, _ = jax.lax.scan(step, jnp.zeros((n_blocks, J, J), vals.dtype),
                        (v, c))
    return G


def _block_gram_packed(vals: jax.Array, cols: jax.Array,
                       n_blocks: int) -> jax.Array:
    """`block_gram` over the packed (R, S*J) layout: row-chunked lax.scan
    whose operand reshape splits only the major row axis (tile-preserving
    for this layout — the whole point of BlockSparseP), with the per-chunk
    (chunk*S, J) flattening confined to the scan body."""
    R, SJ = vals.shape
    S = cols.shape[1]
    J = SJ // S
    # ~64k slots per chunk, matching block_gram's temp budget
    rows = max(8, (65536 // S) // 8 * 8)
    pad = (-R) % rows
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
    v = vals.reshape(-1, rows, SJ)
    c = cols.reshape(-1, rows, S)

    def step(acc, vc):
        vi, ci = vc
        vi = vi.astype(jnp.float32).reshape(-1, J)
        outer = jnp.einsum("ri,rj->rij", vi, vi)
        return acc + jax.ops.segment_sum(outer, ci.reshape(-1),
                                         num_segments=n_blocks), None

    G, _ = jax.lax.scan(step, jnp.zeros((n_blocks, J, J), jnp.float32),
                        (v, c))
    return G


def block_gram_gather(vals: jax.Array, t_idx: jax.Array,
                      d_chunk: int = 64) -> jax.Array:
    """`block_gram` over a precomputed transpose index (build_rmv_gather):
    G[b] = sum of outer(v[slot]) over the slots addressing block b —
    gather + batched contraction instead of the scatter-add, same
    motivation as `BlockSparse.rmv_gather`. Padding indices resolve to a
    zero row."""
    J = vals.shape[-1]
    v = jnp.concatenate(
        [vals.reshape(-1, J), jnp.zeros((1, J), vals.dtype)])
    B, D = t_idx.shape
    pad = (-D) % d_chunk
    if pad:
        t_idx = jnp.concatenate(
            [t_idx, jnp.full((B, pad), v.shape[0] - 1, t_idx.dtype)],
            axis=1)
    t = jnp.moveaxis(t_idx.reshape(B, -1, d_chunk), 1, 0)

    def step(acc, ti):
        g = v[ti]                                  # (B, dc, J)
        return acc + jnp.einsum("bdi,bdj->bij", g, g), None

    G, _ = jax.lax.scan(step, jnp.zeros((B, J, J), vals.dtype), t)
    return G


def block_whitener(vals: jax.Array, cols: jax.Array, n_blocks: int,
                   eig_floor: float = 1e-6) -> jax.Array:
    """Symmetric per-block whitener W[b] = V diag(1/sqrt(clip(w))) Vᵀ from
    the eigendecomposition of the per-block Grams G[b] (the (J, J)
    diagonal blocks of AᵀA).

    Right-preconditioning with W makes the columns of B = A W orthonormal
    WITHIN each site-var block (block-Jacobi on the normal equations). The
    RBF assembly's sigmoid features of one site are nearly collinear —
    measured as the dominant conditioning pathology: every iterative
    solver (f32 CGLS, f64 LSQR at 15k iterations) stalled at the same
    far-from-optimal iterate under plain column scaling (COMPARISON.md
    round 3). Eigenvalues below eig_floor * max(w_b) are clipped (their
    directions are left unscaled relative to the block's strongest —
    pseudo-whitening, robust where f32 Cholesky breaks down); empty
    blocks get W = I.
    """
    G = block_gram(vals, cols, n_blocks)
    w, V = jnp.linalg.eigh(G)                             # (B, J), (B, J, J)
    wmax = jnp.maximum(w[:, -1:], 0.0)
    scale = jax.lax.rsqrt(jnp.maximum(w, eig_floor * wmax))
    empty = (wmax[:, 0] <= 0.0)
    W = jnp.einsum("bij,bj,bkj->bik", V, scale, V)
    eye = jnp.eye(G.shape[-1], dtype=vals.dtype)
    return jnp.where(empty[:, None, None], eye, W)


def _block_apply(W: jax.Array, y: jax.Array) -> jax.Array:
    """x = W y per block; y flat (n_blocks * J,)."""
    return jnp.einsum("bij,bj->bi", W,
                      y.reshape(W.shape[0], -1)).reshape(-1)


_GRAM_JIT: dict = {}


def block_whitener_host(A, eig_floor: float = 1e-6,
                        t_idx: Optional[jax.Array] = None) -> jax.Array:
    """`block_whitener` with the eigendecomposition on the HOST in float64.

    TPU f32 `eigh` is far too inaccurate for the near-singular RBF Gram
    blocks (eigenvalue spreads beyond 1e9): measured max |W G W - I| = 661
    on-chip vs ~1e-5 from LAPACK f64 — whitening with the on-chip factors
    silently NaNs the CGLS iterates and the divergence guard returns x = 0.
    The Gram reduce (the data-sized part) stays a jitted device program;
    only the (n_blocks, J, J) blocks move to host (~1 MB at reference
    scale, once per solve). MUST be called outside jit (host transfer).

    With `t_idx` the Gram accumulation runs as `block_gram_gather` (pull)
    instead of the segment-sum scatter.
    """
    nb = int(A[-1])
    key = (nb, t_idx is not None)
    if key not in _GRAM_JIT:
        if t_idx is None:
            _GRAM_JIT[key] = jax.jit(lambda v, c: block_gram(v, c, nb))
        else:
            _GRAM_JIT[key] = jax.jit(block_gram_gather)
    arg2 = A.cols if t_idx is None else t_idx
    G = np.asarray(_GRAM_JIT[key](A.vals, arg2)).astype(np.float64)
    return jnp.asarray(_whiten_from_gram(G, eig_floor).astype(np.float32))


def _whiten_from_gram(G: np.ndarray, eig_floor: float = 1e-6) -> np.ndarray:
    """Host-f64 inverse-sqrt factor of per-block Gram matrices:
    W = V diag(1/sqrt(max(w, floor*wmax))) Vᵀ, identity for zero blocks."""
    w, V = np.linalg.eigh(G)
    wmax = np.maximum(w[:, -1:], 0.0)
    denom = np.maximum(w, np.maximum(eig_floor * wmax, 1e-300))
    W = np.einsum("bij,bj,bkj->bik", V, 1.0 / np.sqrt(denom), V)
    W[wmax[:, 0] <= 0.0] = np.eye(G.shape[-1])
    return W


def _prewhiten_x0(W_f64: np.ndarray, x0: jax.Array,
                  n_blocks: int) -> jax.Array:
    """y0 solving W y0 = x0 per block, on host in f64 (W is near-singular
    by construction; a device f32 solve can blow up the warm start)."""
    x0np = np.asarray(x0)
    if not np.any(x0np):
        return jnp.zeros_like(x0)
    y0 = np.linalg.solve(
        W_f64, x0np.astype(np.float64).reshape(n_blocks, -1)[..., None]
    )[..., 0].reshape(-1).astype(np.float32)
    return jnp.asarray(y0)


def cgls_block_precond(A, b: jax.Array, x0: jax.Array,
                       maxiter: int = 500, tol: float = 1e-8,
                       damp: float = 0.0, eig_floor: float = 1e-6,
                       W: Optional[jax.Array] = None):
    """CGLS on the block-whitened system B = A W (see block_whitener);
    returns x = W y in the original variable. `damp` regularizes the
    whitened variable y. W is symmetric, so Bᵀ r = W (Aᵀ r).

    Pass a precomputed `W` (from `block_whitener_host`) when running on a
    TPU — the default in-jit `block_whitener` relies on the backend's f32
    eigh, which is accurate on CPU LAPACK but unusable on-chip for these
    Gram spectra (see block_whitener_host)."""
    if W is None:
        W = block_whitener(A.vals, A.cols, A.n_blocks, eig_floor)
    # y0 solves W y0 = x0 per block (a warm start from cfg.warm_start must
    # survive the change of variable; W's eigenvalues are floored at
    # eig_floor*wmax so the batched solve is well-conditioned, and for the
    # x0 = 0 cold start it returns exactly 0)
    y0 = jnp.linalg.solve(W, x0.reshape(W.shape[0], -1)[..., None])[..., 0]
    y0 = y0.reshape(-1)
    x, info = cgls(lambda y: A.mv(_block_apply(W, y)),
                   lambda r: _block_apply(W, A.rmv(r)),
                   b, y0, maxiter=maxiter, tol=tol, damp=damp)
    return _block_apply(W, x), info


# --------------------------------------------------------------- sparse op


class PaddedSparse(NamedTuple):
    """ELL-style padded-row sparse matrix: fixed nnz per row.

    vals: (R, nnz) f32; cols: (R, nnz) int32 (padding: val=0, col=0);
    n_cols: static int.
    """
    vals: jax.Array
    cols: jax.Array
    n_cols: int

    def mv(self, x: jax.Array) -> jax.Array:
        """A @ x: gather + row-wise dot, (R,)."""
        return jnp.sum(self.vals * x[self.cols], axis=-1)

    def rmv(self, r: jax.Array) -> jax.Array:
        """Aᵀ @ r: scatter-add over columns, (n_cols,)."""
        contrib = (self.vals * r[:, None]).reshape(-1)
        return jax.ops.segment_sum(contrib, self.cols.reshape(-1),
                                   num_segments=self.n_cols)

    def col_norms(self) -> jax.Array:
        """Column 2-norms (for Jacobi right-preconditioning). Exact when each
        row references a column at most once — true for the RBF assembly,
        where a row's columns are (distinct KNN site, var, feature)."""
        return jnp.sqrt(jax.ops.segment_sum(
            (self.vals ** 2).reshape(-1), self.cols.reshape(-1),
            num_segments=self.n_cols))


# single-program matvec temp budget, in ELEMENTS of the (R, S, J) gathered/
# broadcast intermediate. XLA tiles it T(8,128), padding a J=16 minor dim
# 8x — so 256M elements ~ 1 GB unpadded ~ 8 GB padded, the single-chip
# ceiling. The 8x-density channel system (218M) stays single-program (the
# measured configuration); 16x and beyond take the row-chunked path.
_MATVEC_CHUNK_ELEMS = 256 * 1024 * 1024
# per-chunk size of the chunked path (~64M elements -> ~2 GB padded temp).
# Chunks are STATIC python slices unrolled at trace time: a lax.scan would
# need the whole array padded+reshaped to (k, rows, S, J) first, and that
# materializes a full-size copy in the padded T(8,128) layout — the very
# 13-16 GB allocation the chunking exists to avoid (measured at 16x).
_MATVEC_ROWS_PER_CHUNK_ELEMS = 64 * 1024 * 1024


class BlockSparse(NamedTuple):
    """Block-ELL sparse operator: each row holds `S` dense J-wide
    coefficient blocks addressed by a block-column id (site-var pairs in
    the RBF assembly, where every site contributes J feature columns).

    vals: (R, S, J) f32; cols: (R, S) int32 block ids (padding: val=0,
    col=0); n_blocks: static int (flat column count = n_blocks * J).

    Same operator algebra as PaddedSparse, ~J x fewer gather/scatter
    indices per matvec: measured on the TPU, XLA's per-element
    gather/segment-sum lowering made scalar-ELL CGLS ~100 ms/iteration at
    the 400x10 vortex scale (no faster than 1-core CPU); grouping the J
    feature columns into dense blocks moves that work onto contiguous
    lanes. The reference assembles scipy COO on host and solves on CPU
    (vortex/model.py:296-478) — no counterpart.
    """
    vals: jax.Array
    cols: jax.Array
    n_blocks: int

    @property
    def bdim(self) -> int:
        return self.vals.shape[-1]

    @property
    def n_cols(self) -> int:
        return self.n_blocks * self.vals.shape[-1]

    def mv(self, x: jax.Array) -> jax.Array:
        X = x.reshape(self.n_blocks, self.bdim)
        R, S, J = self.vals.shape
        if R * S * J <= _MATVEC_CHUNK_ELEMS:
            g = X[self.cols]                   # (R, S, J)
            return jnp.einsum("rsj,rsj->r", self.vals, g)
        # Beyond-HBM scales (16x-density channel systems and up): the
        # gathered (R, S, J) temp is tiled T(8,128) by XLA, padding the
        # J=16 minor dim 8x — 13+ GB at 570k rows (measured OOM,
        # COMPARISON.md round 4). Static unrolled row chunks bound the
        # temp; identical results (same reduction, disjoint rows).
        rows = max(1, _MATVEC_ROWS_PER_CHUNK_ELEMS // (S * J))
        outs = [jnp.einsum("rsj,rsj->r",
                           self.vals[i:i + rows], X[self.cols[i:i + rows]])
                for i in range(0, R, rows)]
        return jnp.concatenate(outs)

    def rmv(self, r: jax.Array) -> jax.Array:
        R, S, J = self.vals.shape
        if R * S * J <= _MATVEC_CHUNK_ELEMS:
            contrib = (self.vals * r[:, None, None]).reshape(-1, J)
            out = jax.ops.segment_sum(contrib, self.cols.reshape(-1),
                                      num_segments=self.n_blocks)
            return out.reshape(-1)
        rows = max(1, _MATVEC_ROWS_PER_CHUNK_ELEMS // (S * J))
        acc = jnp.zeros((self.n_blocks, J), self.vals.dtype)
        for i in range(0, R, rows):
            contrib = (self.vals[i:i + rows]
                       * r[i:i + rows, None, None]).reshape(-1, J)
            acc = acc + jax.ops.segment_sum(
                contrib, self.cols[i:i + rows].reshape(-1),
                num_segments=self.n_blocks)
        return acc.reshape(-1)

    def col_norms(self) -> jax.Array:
        sq = jax.ops.segment_sum((self.vals ** 2).reshape(-1, self.bdim),
                                 self.cols.reshape(-1),
                                 num_segments=self.n_blocks)
        return jnp.sqrt(sq.reshape(-1))

    def rmv_gather(self, r: jax.Array, t_idx: jax.Array,
                   d_chunk: int = 64) -> jax.Array:
        """Aᵀ @ r via a precomputed transpose GATHER index instead of the
        scatter-add in `rmv`.

        MEASURED NEGATIVE RESULT (TPU, reference scale, COMPARISON.md):
        2.7x SLOWER than the segment-sum scatter — the pull path pays
        max-reverse-degree padding per block column while the scatter
        touches exactly the nonzeros. Kept as an opt-in experiment
        (`--rmv_gather`); the scatter is the production default.

        `t_idx` (n_blocks, D) holds, per block-column, the flat
        slot indices (row * S + slot) of every row entry addressing it,
        padded with R*S (resolved to a zero row). Built once per sparsity
        pattern by `build_rmv_gather`; the pattern is constant across
        Picard and CGLS iterations, so the build cost amortizes to zero.

        The D axis is processed in `d_chunk` slices under lax.scan so the
        gathered (n_blocks, d_chunk, J) intermediate stays small."""
        S = self.cols.shape[1]
        J = self.bdim
        v = jnp.concatenate(
            [self.vals.reshape(-1, J), jnp.zeros((1, J), self.vals.dtype)])
        r_ext = jnp.concatenate([r, jnp.zeros((1,), r.dtype)])
        B, D = t_idx.shape
        pad = (-D) % d_chunk
        if pad:
            t_idx = jnp.concatenate(
                [t_idx, jnp.full((B, pad), v.shape[0] - 1, t_idx.dtype)],
                axis=1)
        t = jnp.moveaxis(t_idx.reshape(B, -1, d_chunk), 1, 0)  # (n, B, dc)

        def step(acc, ti):
            rows = jnp.minimum(ti // S, r_ext.shape[0] - 1)
            return acc + jnp.einsum("bdj,bd->bj", v[ti], r_ext[rows]), None

        out, _ = jax.lax.scan(step, jnp.zeros((B, J), self.vals.dtype), t)
        return out.reshape(-1)


class BlockSparseP(NamedTuple):
    """Packed block-ELL: the SAME operator as `BlockSparse`, with each
    row's S coefficient blocks stored flattened — vals (R, S*J) instead of
    (R, S, J).

    Why this exists: XLA lays an (R, S, J) f32 array out in T(8,128) tiles
    over its last two dims, padding the J=16 minor dimension 8x — so the
    unpacked vals buffer OCCUPIES and every CGLS matvec STREAMS 8x its
    logical bytes in HBM (the round-4 16x OOM and the matvec's measured
    ~order-of-magnitude gap to its own HBM floor, COMPARISON.md). Packed,
    the minor dim is S*J (768 at the vortex scales — a lane multiple), so
    vals stream at ~1x. Beyond-HBM row counts run the matvecs as a
    `lax.scan` over row chunks: splitting the MAJOR row axis is a
    tile-preserving reshape for this layout (the unpacked layout cannot
    do this — its scan-ready reshape materializes the full padded copy,
    which is why BlockSparse uses static unrolled slices instead).

    Field order matches PaddedSparse/BlockSparse: A[-1] is the static
    column descriptor (n_blocks). `vals` may be stored bf16 (opt-in);
    all contractions accumulate in f32.
    """
    vals: jax.Array   # (R, S*J)
    cols: jax.Array   # (R, S) int32 block ids (padding: val=0, col=0)
    n_blocks: int

    @property
    def bdim(self) -> int:
        return self.vals.shape[-1] // self.cols.shape[-1]

    @property
    def n_cols(self) -> int:
        return self.n_blocks * self.bdim

    def _chunk_rows(self) -> int:
        sj = self.vals.shape[-1]
        return max(8, (_MATVEC_ROWS_PER_CHUNK_ELEMS // sj) // 8 * 8)

    def mv(self, x: jax.Array) -> jax.Array:
        R, S = self.cols.shape
        J = self.bdim
        X = x.reshape(self.n_blocks, J)
        if R * S * J <= _MATVEC_CHUNK_ELEMS:
            g = X[self.cols].reshape(R, S * J)
            return jnp.einsum("rk,rk->r", self.vals, g,
                              preferred_element_type=jnp.float32)
        rows = self._chunk_rows()
        pad = (-R) % rows
        v = jnp.pad(self.vals, ((0, pad), (0, 0))).reshape(-1, rows, S * J)
        c = jnp.pad(self.cols, ((0, pad), (0, 0))).reshape(-1, rows, S)

        def body(_, vc):
            vi, ci = vc
            g = X[ci].reshape(rows, S * J)
            return None, jnp.einsum("rk,rk->r", vi, g,
                                    preferred_element_type=jnp.float32)

        _, outs = jax.lax.scan(body, None, (v, c))
        return outs.reshape(-1)[:R]

    def rmv(self, r: jax.Array) -> jax.Array:
        R, S = self.cols.shape
        J = self.bdim
        if R * S * J <= _MATVEC_CHUNK_ELEMS:
            contrib = (self.vals * r[:, None]).reshape(-1, J)
            out = jax.ops.segment_sum(contrib, self.cols.reshape(-1),
                                      num_segments=self.n_blocks)
            return out.reshape(-1)
        rows = self._chunk_rows()
        pad = (-R) % rows
        v = jnp.pad(self.vals, ((0, pad), (0, 0))).reshape(-1, rows, S * J)
        c = jnp.pad(self.cols, ((0, pad), (0, 0))).reshape(-1, rows, S)
        rr = jnp.pad(r, (0, pad)).reshape(-1, rows)

        def body(acc, vcr):
            vi, ci, ri = vcr
            contrib = (vi * ri[:, None]).reshape(-1, J)
            return acc + jax.ops.segment_sum(
                contrib, ci.reshape(-1), num_segments=self.n_blocks), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((self.n_blocks, J), jnp.float32), (v, c, rr))
        return acc.reshape(-1)

    def col_norms(self) -> jax.Array:
        R, S = self.cols.shape
        J = self.bdim
        if R * S * J <= _MATVEC_CHUNK_ELEMS:
            sq = (self.vals.astype(jnp.float32) ** 2).reshape(-1, J)
            out = jax.ops.segment_sum(sq, self.cols.reshape(-1),
                                      num_segments=self.n_blocks)
            return jnp.sqrt(out.reshape(-1))
        rows = self._chunk_rows()
        pad = (-R) % rows
        v = jnp.pad(self.vals, ((0, pad), (0, 0))).reshape(-1, rows, S * J)
        c = jnp.pad(self.cols, ((0, pad), (0, 0))).reshape(-1, rows, S)

        def body(acc, vc):
            vi, ci = vc
            sq = (vi.astype(jnp.float32) ** 2).reshape(-1, J)
            return acc + jax.ops.segment_sum(
                sq, ci.reshape(-1), num_segments=self.n_blocks), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((self.n_blocks, J), jnp.float32), (v, c))
        return jnp.sqrt(acc.reshape(-1))


def pack_block_sparse(A: BlockSparse, dtype=None) -> BlockSparseP:
    """(R, S, J) -> (R, S*J) repack (see BlockSparseP). `dtype` optionally
    narrows the stored coefficients (e.g. jnp.bfloat16 — opt-in: halves
    the streamed bytes again, ~0.4% relative perturbation of the
    OPERATOR, acceptable only where the solve tolerance dwarfs it)."""
    R, S, J = A.vals.shape
    v = A.vals.reshape(R, S * J)
    if dtype is not None:
        v = v.astype(dtype)
    return BlockSparseP(vals=v, cols=A.cols, n_blocks=int(A[-1]))


def build_rmv_gather(cols, n_blocks: int) -> jax.Array:
    """Host-side transpose index for `BlockSparse.rmv_gather`.

    cols: (R, S) block ids. Returns t_idx (n_blocks, D) int32 where row b
    lists the flat slot indices (into vals.reshape(R*S, J)) addressing
    block b, padded with R*S; D = max reverse degree. Padding slots of the
    operator itself (col=0, vals=0) land in block 0's list and contribute
    zero — harmless beyond inflating block 0's D.
    """
    c = np.asarray(cols).reshape(-1)
    n = c.shape[0]
    order = np.argsort(c, kind="stable").astype(np.int64)
    sorted_c = c[order]
    counts = np.bincount(c, minlength=n_blocks)
    D = int(counts.max()) if n else 1
    starts = np.zeros(n_blocks + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    rank = np.arange(n) - starts[sorted_c]
    t_idx = np.full((n_blocks, D), n, np.int64)
    t_idx[sorted_c, rank] = order
    return jnp.asarray(t_idx.astype(np.int32))


def cgls_sparse(A: PaddedSparse, b: jax.Array, x0: jax.Array,
                maxiter: int = 500, tol: float = 1e-8,
                precondition: bool = True, damp: float = 0.0):
    """CGLS on a PaddedSparse operator with optional Jacobi column scaling
    (solves min |A D y - b|^2 + damp^2 |y|^2, x = D y, D = 1/col_norm) —
    the role of the reference's per-block max-normalization
    (vortex/model.py:403-410), done properly per column. With scaling,
    `damp` regularizes the well-scaled variable y (zero-norm columns get
    D = 0, i.e. their coefficients are pinned to zero)."""
    if precondition:
        d = A.col_norms()
        # RELATIVE degenerate-column cutoff: an absolute one (1e-12) lets a
        # column with norm ~1e-10 get amplified ~1e10x, which destroys f32
        # CGLS on the scaled system (observed: residual diverging 1000x
        # above |b| on the stream-vortex value-BC assembly). Columns below
        # 1e-6 of the largest are dropped (coefficient pinned to zero).
        d = jnp.where(d > 1e-6 * jnp.max(d), 1.0 / d, 0.0)
        x, info = cgls(lambda y: A.mv(d * y), lambda r: d * A.rmv(r),
                       b, x0 / jnp.where(d == 0, 1.0, d),
                       maxiter=maxiter, tol=tol, damp=damp)
        return d * x, info
    return cgls(A.mv, A.rmv, b, x0, maxiter=maxiter, tol=tol, damp=damp)


def _chunked_cgls_fns(op_cls, static_field, precondition, chunk, maxiter,
                      gather_rmv=False):
    """Build the (init, run_chunk, restart_state) jitted chunk programs for
    `cgls_sparse_chunked`. Cached at module level (see `_CHUNKED_CACHE`) so
    repeat solves — e.g. one per Picard iteration per timestep — hit the jit
    cache instead of retracing fresh closures every call (~minutes per
    compile on the tunneled TPU). `damp²` is an array argument, not a trace
    constant, so sweeping damp reuses the same programs.

    `precondition`: False/True ("jacobi" column scaling) or "block" (the
    per-site-block eigen-whitener, BlockSparse only — see block_whitener).
    In block mode the "dcol" slot of the state carries W (n_blocks, J, J)
    and the scaled variable is y with x = W y (W symmetric).

    `gather_rmv`: every fn takes a trailing `t_idx` arg (see
    `build_rmv_gather`) and Aᵀr runs as `rmv_gather` (pull) instead of the
    segment-sum scatter. When False the trailing arg is accepted and
    ignored (keeps one call shape in the wrapper); pass t_idx=None."""

    def _rmv(Aop, r, t_idx):
        if gather_rmv:
            return Aop.rmv_gather(r, t_idx)
        return Aop.rmv(r)

    mk = lambda vals, cols: op_cls(vals, cols, static_field)
    block_mode = precondition == "block"

    def apply_p(P, v):
        return _block_apply(P, v) if block_mode else P * v

    if block_mode:
        # W comes from block_whitener_host computed OUTSIDE this program
        # (TPU f32 eigh is unusable for these Gram spectra) and the
        # wrapper passes the already-whitened start y0 directly.
        @jax.jit
        def init(vals, cols, b, y0, d2, P, t_idx=None):
            Aop = mk(vals, cols)
            r0 = b - Aop.mv(apply_p(P, y0))
            s0 = apply_p(P, _rmv(Aop, r0, t_idx)) - d2 * y0
            gamma0 = jnp.sum(s0 * s0)
            phi0 = jnp.sum(r0 * r0) + d2 * jnp.sum(y0 * y0)
            return (y0, r0, s0, gamma0, jnp.asarray(0, jnp.int32),
                    phi0, y0, phi0), P
    else:
        @jax.jit
        def init(vals, cols, b, x0, d2, t_idx=None):
            Aop = mk(vals, cols)
            if precondition:
                P = Aop.col_norms()
                # relative cutoff — see cgls_sparse
                P = jnp.where(P > 1e-6 * jnp.max(P), 1.0 / P, 0.0)
                y0 = x0 / jnp.where(P == 0, 1.0, P)
            else:
                P = jnp.ones((Aop.n_cols,), vals.dtype)
                y0 = x0
            r0 = b - Aop.mv(apply_p(P, y0))
            s0 = apply_p(P, _rmv(Aop, r0, t_idx)) - d2 * y0
            gamma0 = jnp.sum(s0 * s0)
            phi0 = jnp.sum(r0 * r0) + d2 * jnp.sum(y0 * y0)
            return (y0, r0, s0, gamma0, jnp.asarray(0, jnp.int32),
                    phi0, y0, phi0), P

    @jax.jit
    def restart_state(vals, cols, b, state, dcol, d2, t_idx=None):
        """Re-enter CGLS from the current best iterate with an EXACTLY
        recomputed residual (fresh Krylov process). f32 CGLS on the normal
        equations loses conjugacy on ill-conditioned systems; restarting
        every chunk bounds the drift at the cost of superlinear
        convergence — the robust mode for the stream-vortex systems."""
        Aop = mk(vals, cols)
        y, r, p, gamma, k, phi, by, bphi = state
        y = jnp.where(phi <= bphi, y, by)   # continue from the best point
        r = b - Aop.mv(apply_p(dcol, y))
        s = apply_p(dcol, _rmv(Aop, r, t_idx)) - d2 * y
        gamma = jnp.sum(s * s)
        phi = jnp.sum(r * r) + d2 * jnp.sum(y * y)
        better = phi < bphi
        by = jnp.where(better, y, by)
        bphi = jnp.where(better, phi, bphi)
        return (y, r, s, gamma, k, phi, by, bphi)

    @jax.jit
    def run_chunk(vals, cols, state, dcol, stop2, d2, t_idx=None):
        Aop = mk(vals, cols)

        def cond(st):
            y, r, p, gamma, k, phi, by, bphi, j = st
            return ((gamma > stop2) & (j < chunk) & (k < maxiter)
                    & (phi < 1e4 * bphi))

        def step(st):
            y, r, p, gamma, k, phi, by, bphi, j = st
            q = Aop.mv(apply_p(dcol, p))
            denom = jnp.sum(q * q) + d2 * jnp.sum(p * p)
            alpha = gamma / jnp.where(denom == 0, 1e-30, denom)
            y = y + alpha * p
            r = r - alpha * q
            s = apply_p(dcol, _rmv(Aop, r, t_idx)) - d2 * y
            gamma_new = jnp.sum(s * s)
            beta = gamma_new / jnp.where(gamma == 0, 1e-30, gamma)
            p = s + beta * p
            phi = jnp.sum(r * r) + d2 * jnp.sum(y * y)
            better = phi < bphi
            by = jnp.where(better, y, by)
            bphi = jnp.where(better, phi, bphi)
            return (y, r, p, gamma_new, k + 1, phi, by, bphi, j + 1)

        y, r, p, gamma, k, phi, by, bphi = state
        y, r, p, gamma, k, phi, by, bphi, _ = jax.lax.while_loop(
            cond, step, (y, r, p, gamma, k, phi, by, bphi,
                         jnp.asarray(0, jnp.int32)))
        return (y, r, p, gamma, k, phi, by, bphi)

    return init, run_chunk, restart_state


_CHUNKED_CACHE: dict = {}


def cgls_sparse_chunked(A: PaddedSparse, b: jax.Array, x0: jax.Array,
                        maxiter: int = 500, tol: float = 1e-8,
                        chunk: int = 200, precondition: bool = True,
                        damp: float = 0.0, restart: bool = False,
                        t_idx: Optional[jax.Array] = None,
                        whitener: Optional[jax.Array] = None):
    """`cgls_sparse` with the iteration loop split into fixed-size chunk
    programs (host sync between chunks) instead of one long `while_loop`
    program.

    Purpose: bound the size/duration of any single XLA program on fragile
    backends — the reference-scale vortex solve reproducibly kills the
    tunneled TPU worker when assemble + a 2000-iteration CGLS while_loop
    run back-to-back (CLAUDE.md), so this caps each program at `chunk`
    iterations and lets the host breathe (and bisect) between them. The
    chunk programs are cached at module level keyed on (operator type,
    static column count, precondition, chunk, maxiter) so repeat solves
    reuse the compiled programs; per-chunk convergence freezing matches
    the while_loop semantics exactly, so the iterates are bit-identical
    to `cgls_sparse` on a healthy backend (pinned by tests/test_linalg.py).

    restart=True re-enters each chunk from the best iterate with an exactly
    recomputed residual (periodic CGLS restart): NOT bit-identical to the
    single while_loop, but bounds f32 conjugacy drift on ill-conditioned
    systems — the robust mode for the stream-formulation vortex solves,
    whose plain f32 CGLS blows up in solution amplitude (measured,
    COMPARISON.md round 3).

    t_idx (BlockSparse only, from `build_rmv_gather(A.cols, A.n_blocks)`):
    run every Aᵀr as the pull-style `rmv_gather` instead of the
    segment-sum scatter. Numerically equivalent up to f32 summation order
    (NOT bit-identical to the scatter path).

    whitener (block mode only): a precomputed W from a previous solve of
    the same sparsity pattern (e.g. an earlier Picard iteration — the
    vortex `reuse_whitener` knob). Any full-rank W is a valid right
    preconditioner; reuse skips the Gram reduce + host-f64 eigh. The W
    actually used is returned as info["W"].
    """
    if t_idx is not None and isinstance(A, BlockSparseP):
        raise ValueError("rmv_gather (t_idx) is not supported on the "
                         "packed BlockSparseP layout — use the unpacked "
                         "BlockSparse operator for that experiment")
    # n_cols (PaddedSparse) / n_blocks (BlockSparse); a jit-built operator
    # carries it as a (weakly-typed) array leaf — coerce to a hashable int
    static_field = int(A[-1])
    key = (type(A), static_field, precondition, int(chunk),
           int(maxiter), t_idx is not None)
    if key not in _CHUNKED_CACHE:
        _CHUNKED_CACHE[key] = _chunked_cgls_fns(*key)
    init, run_chunk, restart_state = _CHUNKED_CACHE[key]

    d2 = jnp.asarray(damp * damp, jnp.float32)
    t_whiten = 0.0
    W = None
    if precondition == "block":
        _tw0 = time.perf_counter()
        W = whitener if whitener is not None else block_whitener_host(
            A, t_idx=t_idx)
        y0 = _prewhiten_x0(np.asarray(W, np.float64), x0, static_field)
        jax.block_until_ready(W)
        t_whiten = time.perf_counter() - _tw0
        state, dcol = init(A.vals, A.cols, b, y0, d2, W, t_idx)
    else:
        state, dcol = init(A.vals, A.cols, b, x0, d2, t_idx)
    stop2 = jnp.asarray((tol ** 2) * float(state[3]), jnp.float32)
    it = 0
    while True:
        state = run_chunk(A.vals, A.cols, state, dcol, stop2, d2, t_idx)
        new_it, gamma = int(state[4]), float(state[3])
        diverged = float(state[5]) >= 1e4 * float(state[7])
        if (new_it >= maxiter or gamma <= float(stop2) or new_it == it
                or diverged):
            break
        it = new_it
        if restart:
            state = restart_state(A.vals, A.cols, b, state, dcol, d2, t_idx)
    y, _, _, gamma, k, phi, by, bphi = state
    # final iterate unless diverged — see cgls
    y_out = jnp.where(phi <= 2.0 * bphi, y, by)
    if precondition == "block":
        x_out = _block_apply(dcol, y_out)
    else:
        x_out = dcol * y_out
    return x_out, {"niter": k, "resnorm": jnp.sqrt(gamma),
                   "t_whiten": t_whiten, "W": W}


def cgls_sparse_sharded(mesh, axis: str, A: PaddedSparse, b: jax.Array,
                        x0: jax.Array, maxiter: int = 500,
                        tol: float = 1e-8, damp: float = 0.0):
    """Row-sharded damped CGLS over a device mesh.

    The ELL rows (vals/cols/b) are sharded along `axis`; the solution vector
    is replicated. Per iteration: A@x is embarrassingly parallel over row
    shards, Aᵀ@r is a local segment-sum followed by a psum over ICI, and the
    row-space inner products psum. This is the idiomatic multi-chip layout
    for the vortex space-time least-squares system (the reference is
    single-GPU + CPU scipy lsqr, SURVEY §2.13).
    """
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[axis]
    R = A.vals.shape[0]
    pad = (-R) % n_dev
    vals = jnp.pad(A.vals, ((0, pad),) + ((0, 0),) * (A.vals.ndim - 1))
    cols = jnp.pad(A.cols, ((0, pad),) + ((0, 0),) * (A.cols.ndim - 1))
    b_p = jnp.pad(b, (0, pad))
    mk = lambda v, c: A._replace(vals=v, cols=c)  # PaddedSparse/BlockSparse

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P()),
             out_specs=(P(), P(), P()))
    def run(vals, cols, b, x0):
        Aop = mk(vals, cols)

        def At_mv(r):
            return jax.lax.psum(Aop.rmv(r), axis)

        def rows_reduce(q):
            return jax.lax.psum(jnp.sum(q), axis)

        x, info = cgls(Aop.mv, At_mv, b, x0, maxiter=maxiter, tol=tol,
                       damp=damp, rows_reduce=rows_reduce)
        return x, info["resnorm"], info["niter"]

    x, resnorm, niter = run(vals, cols, b_p, x0)
    return x, {"resnorm": resnorm, "niter": niter}


def _sharded_chunked_cgls_fns(mesh, axis: str, op_cls, static_field,
                              precondition, chunk: int, maxiter: int):
    """Chunk programs for `cgls_sparse_sharded_chunked`: the same
    (init, run_chunk, restart_state) triple as `_chunked_cgls_fns`, each a
    jitted `shard_map` over `mesh` with the ELL rows (vals/cols/b) and the
    row-space residual r sharded along `axis` and everything in column
    space replicated. The two row-space reductions per iteration (Aᵀr and
    the q/r inner products) psum over ICI; iterate/freeze/divergence
    semantics match the single-chip chunk programs exactly.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mk = lambda vals, cols: op_cls(vals, cols, static_field)
    block_mode = precondition == "block"

    def apply_p(Pm, v):
        return _block_apply(Pm, v) if block_mode else Pm * v

    def psum(v):
        return jax.lax.psum(v, axis)

    # state: (y repl, r SHARDED, p repl, gamma, k, phi, by, bphi)
    ST = (P(), P(axis), P(), P(), P(), P(), P(), P())
    smap = partial(shard_map, mesh=mesh, check_vma=False)

    if block_mode:
        # W from the host-f64 eigen-whitener (Gram psum'd over row shards
        # by `_sharded_block_gram`); y0 pre-whitened by the wrapper.
        @jax.jit
        @partial(smap, in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
                 out_specs=(ST, P()))
        def init(vals, cols, b, y0, d2, W):
            Aop = mk(vals, cols)
            r0 = b - Aop.mv(apply_p(W, y0))
            s0 = apply_p(W, psum(Aop.rmv(r0))) - d2 * y0
            gamma0 = jnp.sum(s0 * s0)
            phi0 = psum(jnp.sum(r0 * r0)) + d2 * jnp.sum(y0 * y0)
            return (y0, r0, s0, gamma0, jnp.asarray(0, jnp.int32),
                    phi0, y0, phi0), W
    else:
        @jax.jit
        @partial(smap, in_specs=(P(axis), P(axis), P(axis), P(), P()),
                 out_specs=(ST, P()))
        def init(vals, cols, b, x0, d2):
            Aop = mk(vals, cols)
            if precondition:
                # global column norms: local sum of squares, psum'd
                if isinstance(Aop, (BlockSparse, BlockSparseP)):
                    sq = jax.ops.segment_sum(
                        (Aop.vals.astype(jnp.float32) ** 2).reshape(
                            -1, Aop.bdim),
                        Aop.cols.reshape(-1), num_segments=Aop.n_blocks)
                    Pm = jnp.sqrt(psum(sq.reshape(-1)))
                else:
                    sq = jax.ops.segment_sum(
                        (Aop.vals ** 2).reshape(-1), Aop.cols.reshape(-1),
                        num_segments=Aop.n_cols)
                    Pm = jnp.sqrt(psum(sq))
                Pm = jnp.where(Pm > 1e-6 * jnp.max(Pm), 1.0 / Pm, 0.0)
                y0 = x0 / jnp.where(Pm == 0, 1.0, Pm)
            else:
                Pm = jnp.ones((Aop.n_cols,), vals.dtype)
                y0 = x0
            r0 = b - Aop.mv(apply_p(Pm, y0))
            s0 = apply_p(Pm, psum(Aop.rmv(r0))) - d2 * y0
            gamma0 = jnp.sum(s0 * s0)
            phi0 = psum(jnp.sum(r0 * r0)) + d2 * jnp.sum(y0 * y0)
            return (y0, r0, s0, gamma0, jnp.asarray(0, jnp.int32),
                    phi0, y0, phi0), Pm

    @jax.jit
    @partial(smap, in_specs=(P(axis), P(axis), P(axis), ST, P(), P()),
             out_specs=ST)
    def restart_state(vals, cols, b, state, dcol, d2):
        Aop = mk(vals, cols)
        y, r, p, gamma, k, phi, by, bphi = state
        y = jnp.where(phi <= bphi, y, by)
        r = b - Aop.mv(apply_p(dcol, y))
        s = apply_p(dcol, psum(Aop.rmv(r))) - d2 * y
        gamma = jnp.sum(s * s)
        phi = psum(jnp.sum(r * r)) + d2 * jnp.sum(y * y)
        better = phi < bphi
        by = jnp.where(better, y, by)
        bphi = jnp.where(better, phi, bphi)
        return (y, r, s, gamma, k, phi, by, bphi)

    @jax.jit
    @partial(smap, in_specs=(P(axis), P(axis), ST, P(), P(), P()),
             out_specs=ST)
    def run_chunk(vals, cols, state, dcol, stop2, d2):
        Aop = mk(vals, cols)

        def cond(st):
            y, r, p, gamma, k, phi, by, bphi, j = st
            return ((gamma > stop2) & (j < chunk) & (k < maxiter)
                    & (phi < 1e4 * bphi))

        def step(st):
            y, r, p, gamma, k, phi, by, bphi, j = st
            q = Aop.mv(apply_p(dcol, p))
            denom = psum(jnp.sum(q * q)) + d2 * jnp.sum(p * p)
            alpha = gamma / jnp.where(denom == 0, 1e-30, denom)
            y = y + alpha * p
            r = r - alpha * q
            s = apply_p(dcol, psum(Aop.rmv(r))) - d2 * y
            gamma_new = jnp.sum(s * s)
            beta = gamma_new / jnp.where(gamma == 0, 1e-30, gamma)
            p = s + beta * p
            phi = psum(jnp.sum(r * r)) + d2 * jnp.sum(y * y)
            better = phi < bphi
            by = jnp.where(better, y, by)
            bphi = jnp.where(better, phi, bphi)
            return (y, r, p, gamma_new, k + 1, phi, by, bphi, j + 1)

        y, r, p, gamma, k, phi, by, bphi = state
        y, r, p, gamma, k, phi, by, bphi, _ = jax.lax.while_loop(
            cond, step, (y, r, p, gamma, k, phi, by, bphi,
                         jnp.asarray(0, jnp.int32)))
        return (y, r, p, gamma, k, phi, by, bphi)

    return init, run_chunk, restart_state


_SHARDED_CHUNKED_CACHE: dict = {}
_SHARDED_GRAM_JIT: dict = {}


def _sharded_block_gram(mesh, axis: str, A) -> jax.Array:
    """Per-block Gram blocks of a row-sharded BlockSparse: local
    `block_gram` over each row shard, psum'd over `axis`."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    nb = int(A[-1])
    key = (mesh, axis, nb)
    if key not in _SHARDED_GRAM_JIT:
        @jax.jit
        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P(axis), P(axis)), out_specs=P())
        def gram(vals, cols):
            return jax.lax.psum(block_gram(vals, cols, nb), axis)
        _SHARDED_GRAM_JIT[key] = gram
    return _SHARDED_GRAM_JIT[key](A.vals, A.cols)


def cgls_sparse_sharded_chunked(mesh, axis: str, A: PaddedSparse,
                                b: jax.Array, x0: jax.Array,
                                maxiter: int = 500, tol: float = 1e-8,
                                chunk: int = 200, precondition=True,
                                damp: float = 0.0, restart: bool = False,
                                whitener: Optional[jax.Array] = None):
    """`cgls_sparse_chunked` over a row-sharded device mesh — the
    multi-chip production path for the vortex space-time solve.

    Combines the two solver features that previously excluded each other
    (models/vortex.py round-2 advisory #4): the row-sharded CGLS layout of
    `cgls_sparse_sharded` (A@x local per shard, Aᵀr + inner products psum
    over ICI) AND the bounded per-program duration of the chunked solver
    (fragile tunneled backends die on long single programs — CLAUDE.md).
    Also extends the block eigen-whitener to the mesh path: the Gram
    blocks reduce per-shard on device (psum), the eigendecomposition runs
    on host in f64 exactly as `block_whitener_host`.

    Iterates match the single-chip chunked solver to f32 summation-order
    tolerance (the psum reduction tree reorders the row-space sums; the
    chunk/freeze/divergence logic is identical). The reference has no
    distributed solver of any kind (SURVEY §2.13: single GPU + CPU scipy
    lsqr at vortex/model.py:465).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    R = A.vals.shape[0]
    pad = (-R) % n_dev
    if pad:  # zero rows: mv contributes 0, b rows 0 -> r rows 0
        A = A._replace(
            vals=jnp.pad(A.vals, ((0, pad),) + ((0, 0),) * (A.vals.ndim - 1)),
            cols=jnp.pad(A.cols, ((0, pad),) + ((0, 0),) * (A.cols.ndim - 1)))
        b = jnp.pad(b, (0, pad))
    # place the row data once so every chunk program reuses the layout
    shard_rows = NamedSharding(mesh, P(axis))
    vals = jax.device_put(A.vals, shard_rows)
    cols = jax.device_put(A.cols, shard_rows)
    b = jax.device_put(b, shard_rows)

    static_field = int(A[-1])
    key = (mesh, axis, type(A), static_field, precondition, int(chunk),
           int(maxiter))
    if key not in _SHARDED_CHUNKED_CACHE:
        _SHARDED_CHUNKED_CACHE[key] = _sharded_chunked_cgls_fns(
            mesh, axis, type(A), static_field, precondition, chunk, maxiter)
    init, run_chunk, restart_state = _SHARDED_CHUNKED_CACHE[key]

    d2 = jnp.asarray(damp * damp, jnp.float32)
    t_whiten = 0.0
    W = None
    if precondition == "block":
        _tw0 = time.perf_counter()
        if whitener is not None:
            W = whitener
            Wn = np.asarray(W, np.float64)
        else:
            G = np.asarray(_sharded_block_gram(
                mesh, axis, A._replace(vals=vals, cols=cols))
            ).astype(np.float64)
            Wn = _whiten_from_gram(G)
            W = jnp.asarray(Wn.astype(np.float32))
        y0 = _prewhiten_x0(Wn, x0, static_field)
        jax.block_until_ready(W)
        t_whiten = time.perf_counter() - _tw0
        state, dcol = init(vals, cols, b, y0, d2, W)
    else:
        state, dcol = init(vals, cols, b, x0, d2)
    stop2 = jnp.asarray((tol ** 2) * float(state[3]), jnp.float32)
    it = 0
    while True:
        state = run_chunk(vals, cols, state, dcol, stop2, d2)
        new_it, gamma = int(state[4]), float(state[3])
        diverged = float(state[5]) >= 1e4 * float(state[7])
        if (new_it >= maxiter or gamma <= float(stop2) or new_it == it
                or diverged):
            break
        it = new_it
        if restart:
            state = restart_state(vals, cols, b, state, dcol, d2)
    y, _, _, gamma, k, phi, by, bphi = state
    y_out = jnp.where(phi <= 2.0 * bphi, y, by)
    if precondition == "block":
        x_out = _block_apply(dcol, y_out)
    else:
        x_out = dcol * y_out
    return x_out, {"niter": k, "resnorm": jnp.sqrt(gamma),
                   "t_whiten": t_whiten, "W": W}
