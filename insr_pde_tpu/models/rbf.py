"""Random-basis-function (random-feature / ELM-style) space-time ansatz.

TPU-native redesign of the reference's `Random_Basis_Function{,_L}`
(reference: base/networks.py:128-489). The field is

    u_e(x, t) = sum_{n in KNN(x,t)} sum_j  w_n(x,t) * sigmoid(z_{n,e,j}) * U[n,e,j]
    z_{n,e,j} = A[n,e,j,:] . (x - c_n)/bw  +  tA[n,e,j] * (t - s_n)/tbw + b[n,e,j]

with fixed random (A, tA, b), grid-placed space-time basis sites (c_n, s_n),
partition-of-unity indicator weights w, and solvable coefficients U.

Differences by design:
  * derivatives are ANALYTIC: sigma' = sigma(1-sigma), so d/dx and d/dt are
    einsums over the same gathered features — the reference differentiates
    through torch autograd per point (base/networks.py:381-384, with the
    Hessian left as a TODO at :382); here first AND second order are closed
    form and fuse into the gather+einsum program;
  * KNN is `ops.knn` (matmul + top_k) instead of pytorch3d C++ kernels;
  * the (T, N, E, J) parameter blocks are flattened to one site axis (T*N)
    so per-point gathers are single `take`s rather than the reference's
    expand/gather chains (base/networks.py:354-369);
  * everything is a pure function of a params NamedTuple -> jit/vmap/shard
    friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.knn import knn


@dataclass(frozen=True)
class RBFConfig:
    """Mirrors the reference cfg fields consumed by Random_Basis_Function_L
    (base/networks.py:237-259 / starterL.py:9-28)."""
    dim: int = 2
    n_vars: int = 3            # variable_num (E)
    n_feat: int = 16           # num_per_point_feature (J)
    n_spatial_basis: int = 400  # N (snapped to resolution**dim)
    time_num: int = 10         # T time slices
    time_length: float = 1.0
    band_width: float = 10.0
    neighbor_k: int = 6
    seed: int = 213421
    pou_width: float = 0.0     # spatial PoU support; 0 = band_width
                               # (for 'hat' space PoU set ~ the grid spacing)
    # Shepard-normalize the combined PoU weights: w_k -> w_k / sum_k w_k
    # (with the full quotient-rule derivative chain). The site grid stops
    # half a spacing inside the domain (init_rbf cell centers), so in the
    # outer strips — exactly where every boundary/inlet row lives — the
    # hat/smooth PoU sums to < 1 and even a field all sites agree on gets
    # scaled by the deficient sum. Normalization restores an EXACT
    # partition of unity everywhere (a no-op in the interior at matched
    # spacing). Off by default (reference parity; and it would couple the
    # two slices an overlapping indicator time-PoU intentionally keeps
    # independent). Ignored when both PoUs are 'simple'.
    pou_normalize: bool = False
    # Per-site polynomial tail appended to the J sigmoid features (0 = off,
    # 1 = {1, x, y, .., t}, 2 = + all space-time quadratics). Standard
    # RBF-FD augmentation: with it, global polynomials of that degree lie
    # EXACTLY in the span (each site can carry the same global polynomial,
    # so K-window switches cancel identically), which random sigmoid
    # features only approximate — measured as the binding constraint on the
    # channel scene, whose true solution psi = v*(y+1) is linear
    # (COMPARISON.md round 3). The reference has no counterpart
    # (base/networks.py:252-255 draws pure random features).
    poly: int = 0

    @property
    def spatial_spacing(self) -> float:
        return 2.0 / self.spatial_resolution

    @property
    def effective_pou_width(self) -> float:
        return self.pou_width if self.pou_width > 0 else self.band_width

    @property
    def spatial_resolution(self) -> int:
        return int(round(self.n_spatial_basis ** (1.0 / self.dim)))

    @property
    def n_sites_spatial(self) -> int:
        return self.spatial_resolution ** self.dim

    @property
    def n_sites(self) -> int:
        return self.n_sites_spatial * self.time_num

    @property
    def time_band_width(self) -> float:
        # time PoU support = slice spacing so each point sees its own slice
        return self.time_length / max(self.time_num - 1, 1)

    @property
    def n_poly(self) -> int:
        if self.poly <= 0:
            return 0
        n = 1 + self.dim + 1                      # 1, x_a, t
        if self.poly >= 2:
            n += self.dim * (self.dim + 1) // 2 + self.dim + 1
        return n

    @property
    def n_feat_total(self) -> int:
        return self.n_feat + self.n_poly

    @property
    def n_coeffs(self) -> int:
        return self.n_sites * self.n_vars * self.n_feat_total


class RBFParams(NamedTuple):
    centers: jax.Array   # (S, dim) spatial site positions
    times: jax.Array     # (S,)     site time coordinates
    A: jax.Array         # (S, E, J, dim) random spatial directions
    tA: jax.Array        # (S, E, J) random time directions
    bias: jax.Array      # (S, E, J)
    u: jax.Array         # (S, E, J) solvable coefficients


def init_rbf(cfg: RBFConfig, key: jax.Array) -> RBFParams:
    """Grid basis sites (reference generate_basis, base/networks.py:269-281)
    + N(0,1) random features (base/networks.py:252-255)."""
    res = cfg.spatial_resolution
    coords = (jnp.linspace(0.5, res - 0.5, res) / res) * 2.0 - 1.0
    grid = jnp.stack(jnp.meshgrid(*([coords] * cfg.dim), indexing="ij"),
                     axis=-1).reshape(-1, cfg.dim)
    ts = jnp.linspace(0.0, cfg.time_length, cfg.time_num)
    centers = jnp.tile(grid, (cfg.time_num, 1))
    times = jnp.repeat(ts, grid.shape[0])

    S = centers.shape[0]
    kA, kt, kb, ku = jax.random.split(key, 4)
    shape = (S, cfg.n_vars, cfg.n_feat)
    return RBFParams(
        centers=centers, times=times,
        A=jax.random.normal(kA, shape + (cfg.dim,)),
        tA=jax.random.normal(kt, shape),
        bias=jax.random.normal(kb, shape),
        u=jax.random.normal(ku, (S, cfg.n_vars, cfg.n_feat_total)),
    )


def pou_simple(x: jax.Array) -> jax.Array:
    """Indicator partition-of-unity bump on [-1, 1] (reference PoU_simple,
    base/networks.py:121-125)."""
    return jnp.where((x >= -1.0) & (x <= 1.0), 1.0, 0.0)


def pou_sine(x: jax.Array) -> jax.Array:
    """C1 sine-blended bump on [-5/4, 5/4]: ramps 0.5 +/- sin(2 pi x)/2 on
    the shoulders, plateau 1 inside [-3/4, 3/4].

    The reference's `PoU` (base/networks.py:113-119) intends this shape but
    is unusable as written: `(x>=(-5/4)&(x<-3/4))` binds `&` before `>=`,
    and the plateau is typo'd `.1`; it is also never called. This is the
    corrected, smooth PoU option.
    """
    shoulder_lo = 0.5 + jnp.sin(2.0 * jnp.pi * x) / 2.0
    shoulder_hi = 0.5 - jnp.sin(2.0 * jnp.pi * x) / 2.0
    out = jnp.zeros_like(x)
    out = jnp.where((x >= -1.25) & (x < -0.75), shoulder_lo, out)
    out = jnp.where((x >= -0.75) & (x < 0.75), 1.0, out)
    out = jnp.where((x >= 0.75) & (x < 1.25), shoulder_hi, out)
    return out


def pou_hat(x: jax.Array) -> jax.Array:
    """Hat (linear-interpolation) bump on [-1, 1]: a TRUE partition of unity
    across adjacent sites at unit spacing. Unlike the indicator
    `pou_simple`, the represented field stays continuous when a query's
    neighbor window switches between time slices (with indicators the field
    JUMPS at window boundaries — a latent flaw of the reference design that
    surfaces as soon as collocation points live between slices)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def pou_hat_grad(x: jax.Array) -> jax.Array:
    """d pou_hat / dx (a.e.): -sign(x) inside the support."""
    return jnp.where(jnp.abs(x) < 1.0, -jnp.sign(x), 0.0)


def pou_smooth(x: jax.Array) -> jax.Array:
    """C1 smooth-hat PoU on [-1, 1]: S(1 - |x|) with the cubic smoothstep
    S(s) = 3s^2 - 2s^3. Same 2-site support as `pou_hat` and still an exact
    partition of unity at unit spacing (S(s) + S(1-s) = 1), but C1
    EVERYWHERE (S'(0) = S'(1) = 0 kills both the center and edge kinks).
    Fields represented with it have continuous first derivatives — required
    by the stream-function formulation, where velocity IS a derivative and
    hat-PoU kinks would make it jump across cell boundaries."""
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return s * s * (3.0 - 2.0 * s)


def pou_smooth_grad(x: jax.Array) -> jax.Array:
    """d pou_smooth / dx: -sign(x) S'(1-|x|), S'(s) = 6s(1-s)."""
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return -jnp.sign(x) * 6.0 * s * (1.0 - s)


def pou_smooth_hess(x: jax.Array) -> jax.Array:
    """d2 pou_smooth / dx2 (a.e.): S''(1-|x|) = 6 - 12(1-|x|) inside."""
    inside = jnp.abs(x) < 1.0
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return jnp.where(inside, 6.0 - 12.0 * s, 0.0)


def pou_smooth2(x: jax.Array) -> jax.Array:
    """C2 smooth-hat PoU on [-1, 1]: S5(1 - |x|) with the quintic
    smootherstep S5(s) = 6s^5 - 15s^4 + 10s^3. Still an exact partition of
    unity at unit spacing (S5(s) + S5(1-s) = 1) with the same 2-site
    support, and C2 EVERYWHERE (S5' and S5'' vanish at both ends). Fields
    represented with it have continuous Hessians — so the stream-function
    velocity u = curl(psi) is C1 and even finite-difference divergence
    checks see a divergence-free field (with the C1 cubic PoU the Hessian
    jumps at cell kinks dominate an FD stencil)."""
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return s ** 3 * (10.0 + s * (-15.0 + 6.0 * s))


def pou_smooth2_grad(x: jax.Array) -> jax.Array:
    """d pou_smooth2 / dx: -sign(x) S5'(1-|x|), S5'(s) = 30 s^2 (1-s)^2."""
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return -jnp.sign(x) * 30.0 * (s * (1.0 - s)) ** 2


def pou_smooth2_hess(x: jax.Array) -> jax.Array:
    """d2 pou_smooth2 / dx2: S5''(1-|x|) = 60 s (1-s) (1-2s)."""
    s = jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)
    return 60.0 * s * (1.0 - s) * (1.0 - 2.0 * s)


# (value, grad, second) per PoU family; grads/seconds are a.e. derivatives
# in the PoU's own normalized coordinate (callers divide by the width).
_POU_FNS = {
    "simple": (pou_simple,
               lambda x: jnp.zeros_like(x),
               lambda x: jnp.zeros_like(x)),
    "hat": (pou_hat, pou_hat_grad, lambda x: jnp.zeros_like(x)),
    "smooth": (pou_smooth, pou_smooth_grad, pou_smooth_hess),
    "smooth2": (pou_smooth2, pou_smooth2_grad, pou_smooth2_hess),
}


def _poly_terms(dim: int, degree: int) -> list[tuple[tuple, int]]:
    """Monomial exponent tuples ((ex_0..ex_{D-1}), et) for the degree-
    `degree` polynomial tail in the site-local coordinates (x_rel, t_rel)."""
    terms = [((0,) * dim, 0)]
    if degree >= 1:
        for a in range(dim):
            e = [0] * dim
            e[a] = 1
            terms.append((tuple(e), 0))
        terms.append(((0,) * dim, 1))
    if degree >= 2:
        for a in range(dim):
            for b in range(a, dim):
                e = [0] * dim
                e[a] += 1
                e[b] += 1
                terms.append((tuple(e), 0))
        for a in range(dim):
            e = [0] * dim
            e[a] = 1
            terms.append((tuple(e), 1))
        terms.append(((0,) * dim, 2))
    return terms


def _poly_block(x_rel: jax.Array, t_rel: jax.Array, bw: float, tbw: float,
                degree: int, second: bool):
    """Polynomial tail features and analytic derivatives in PHYSICAL
    coordinates (d x_rel / dx = 1/bw, d t_rel / dt = 1/tbw).

    Returns (phi (Q,K,P), dx (Q,K,P,D), dt (Q,K,P), dxx_diag (Q,K,P,D),
    dxx_full (Q,K,P,D,D) | None, dxt (Q,K,P,D) | None)."""
    dim = x_rel.shape[-1]
    terms = _poly_terms(dim, degree)

    def mono(ex, et):
        v = jnp.ones(t_rel.shape, x_rel.dtype)
        for d, e in enumerate(ex):
            if e:
                v = v * (x_rel[..., d] ** e if e > 1 else x_rel[..., d])
        if et:
            v = v * (t_rel ** et if et > 1 else t_rel)
        return v

    def d_dx(ex, et, a):
        if ex[a] == 0:
            return None
        e2 = list(ex)
        e2[a] -= 1
        return (ex[a] / bw), (tuple(e2), et)

    zeros = jnp.zeros(t_rel.shape, x_rel.dtype)
    phi = jnp.stack([mono(ex, et) for ex, et in terms], axis=-1)
    dx = jnp.stack(
        [jnp.stack([(lambda r: zeros if r is None else r[0] * mono(*r[1]))(
            d_dx(ex, et, a)) for a in range(dim)], axis=-1)
         for ex, et in terms], axis=-2)
    dt = jnp.stack(
        [zeros if et == 0 else (et / tbw) * mono(ex, et - 1)
         for ex, et in terms], axis=-1)

    def d2_dx(ex, et, a, b):
        r1 = d_dx(ex, et, a)
        if r1 is None:
            return zeros
        c1, (ex1, et1) = r1
        r2 = d_dx(ex1, et1, b)
        if r2 is None:
            return zeros
        c2, (ex2, et2) = r2
        return c1 * c2 * mono(ex2, et2)

    dxx_diag = jnp.stack(
        [jnp.stack([d2_dx(ex, et, a, a) for a in range(dim)], axis=-1)
         for ex, et in terms], axis=-2)
    dxx_full = dxt = None
    if second:
        dxx_full = jnp.stack(
            [jnp.stack([jnp.stack([d2_dx(ex, et, a, b) for b in range(dim)],
                                  axis=-1) for a in range(dim)], axis=-2)
             for ex, et in terms], axis=-3)
        def d2_dxdt(ex, et, a):
            r = d_dx(ex, et, a)
            if r is None or et == 0:
                return zeros
            c1, (ex1, et1) = r
            return c1 * (et1 / tbw) * mono(ex1, et1 - 1)

        dxt = jnp.stack(
            [jnp.stack([d2_dxdt(ex, et, a) for a in range(dim)], axis=-1)
             for ex, et in terms], axis=-2)
    return phi, dx, dt, dxx_diag, dxx_full, dxt


class PointBasis(NamedTuple):
    """Per-query gathered basis block: everything the PDE assembly needs.

    phi:  (Q, K, E, J) sigmoid features
    dx:   (Q, K, E, J, D) d phi / d x (analytic)
    dt:   (Q, K, E, J) d phi / d t (analytic)
    dxx:  (Q, K, E, J, D) diagonal second derivatives (analytic; the
          reference never implemented this — base/networks.py:382 TODO)
    w:    (Q, K) PoU weights
    dwdt: (Q, K) d w / d t (nonzero for the 'hat' time PoU)
    dwdx: (Q, K, D) d w / d x (nonzero for the 'hat' space PoU)
    idx:  (Q, K) site indices into the flattened site axis

    Second-order block (None unless `point_basis(..., second=True)`; needed
    by the stream-function formulation, where velocities are first
    derivatives of psi and the momentum operator therefore needs seconds):
    dxx_full: (Q, K, E, J, D, D) full d2 phi / dx_a dx_b
    dxt:      (Q, K, E, J, D)    d2 phi / dx_a dt
    dwdx2:    (Q, K, D, D)       d2 w / dx_a dx_b (hat PoU: off-diagonal
              only — per-dim hats have zero second derivative a.e.)
    dwdxdt:   (Q, K, D)          d2 w / dx_a dt
    """
    phi: jax.Array
    dx: jax.Array
    dt: jax.Array
    dxx: jax.Array
    w: jax.Array
    dwdt: jax.Array
    dwdx: jax.Array
    idx: jax.Array
    dxx_full: Optional[jax.Array] = None
    dxt: Optional[jax.Array] = None
    dwdx2: Optional[jax.Array] = None
    dwdxdt: Optional[jax.Array] = None


def point_basis(cfg: RBFConfig, p: RBFParams, x: jax.Array, t: jax.Array,
                idx: Optional[jax.Array] = None,
                time_pou: str = "simple",
                space_pou: str = "simple",
                second: bool = False) -> PointBasis:
    """Evaluate gathered features at (x (Q,dim), t (Q,)).

    If idx is None, runs space-time KNN with the time axis rescaled by
    bw/tbw so temporal and spatial distances are commensurate (reference
    neighbor_search, base/networks.py:293-316).

    time_pou / space_pou: 'simple' (indicator, reference parity) or 'hat'.
    'hat' makes the representation CONTINUOUS when the K-neighbor window
    switches: with indicators the K-truncated sum jumps between
    neighborhoods, so fields can encode variation in window switches that
    the analytic derivative operators cannot see (observed as transport
    solves where the field never moves). Spatial 'hat' uses
    cfg.pou_width (set it to the site grid spacing for a true bilinear
    partition of unity over the cell corners); its x-derivative feeds the
    operator columns via the product rule.
    """
    bw, tbw = cfg.band_width, cfg.time_band_width
    if idx is None:
        scale = bw / tbw
        query = jnp.concatenate([x, (t * scale)[:, None]], axis=1)
        sites = jnp.concatenate(
            [p.centers, (p.times * scale)[:, None]], axis=1)
        _, idx = knn(query, sites, cfg.neighbor_k)

    x_rel = (x[:, None, :] - p.centers[idx]) / bw          # (Q, K, D)
    t_rel = (t[:, None] - p.times[idx]) / tbw              # (Q, K)

    A = p.A[idx]                                           # (Q, K, E, J, D)
    tA = p.tA[idx]                                         # (Q, K, E, J)
    b = p.bias[idx]

    z = (jnp.einsum("qkejd,qkd->qkej", A, x_rel) +
         tA * t_rel[:, :, None, None] + b)
    phi = jax.nn.sigmoid(z)
    sig1 = phi * (1.0 - phi)                               # sigma'
    sig2 = sig1 * (1.0 - 2.0 * phi)                        # sigma''

    dx = sig1[..., None] * A / bw
    dt = sig1 * tA / tbw
    dxx = sig2[..., None] * (A / bw) ** 2

    pw = cfg.effective_pou_width
    xp_rel = (x[:, None, :] - p.centers[idx]) / pw         # (Q, K, D)
    pv, pg, ph = _POU_FNS[space_pou]
    per_dim = pv(xp_rel)                                   # (Q, K, D)
    g = pg(xp_rel) / pw
    x_w = jnp.prod(per_dim, axis=-1)
    # d/dx_a of the product: grad of dim a times the other dims' values
    excl = x_w[..., None] / jnp.where(per_dim > 0, per_dim, 1.0)
    dx_w = jnp.where(per_dim > 0, excl * g, 0.0)
    dxx_w = None
    if second:
        # d2/dx_a dx_b of prod_d v(x_d): off-diagonal g_a g_b times the
        # product over remaining dims; diagonal v''_a times the others
        # (zero a.e. for hat; nonzero for the C1 smooth PoU).
        safe = jnp.where(per_dim > 0, per_dim, 1.0)
        excl_ab = (x_w[..., None, None]
                   / (safe[..., :, None] * safe[..., None, :]))
        inside = (per_dim > 0)[..., :, None] & (per_dim > 0)[..., None, :]
        dxx_w = jnp.where(inside,
                          excl_ab * g[..., :, None] * g[..., None, :], 0.0)
        h = ph(xp_rel) / pw ** 2
        diag = jnp.where(per_dim > 0, excl * h, 0.0)
        eye = jnp.eye(x.shape[-1], dtype=bool)
        dxx_w = jnp.where(eye, diag[..., :, None] * eye, dxx_w)

    tv, tg, _ = _POU_FNS[time_pou]
    t_w = tv(t_rel)
    dt_w = tg(t_rel) / tbw

    dxx_full = dxt = dwdx2 = dwdxdt = None
    if second:
        A_bw = A / bw                                      # (Q, K, E, J, D)
        dxx_full = sig2[..., None, None] * (A_bw[..., :, None]
                                            * A_bw[..., None, :])
        dxt = sig2[..., None] * A_bw * (tA / tbw)[..., None]
        dwdx2 = dxx_w * t_w[..., None, None]
        dwdxdt = dx_w * dt_w[..., None]

    if cfg.poly > 0:
        # polynomial tail appended on the J axis, identical across E (each
        # variable keeps its own coefficients in u)
        E = phi.shape[2]

        def bcast(a):
            return jnp.broadcast_to(a[:, :, None],
                                    a.shape[:2] + (E,) + a.shape[2:])

        p_phi, p_dx, p_dt, p_dxx, p_full, p_dxt = _poly_block(
            x_rel, t_rel, bw, tbw, cfg.poly, second)
        phi = jnp.concatenate([phi, bcast(p_phi)], axis=3)
        dx = jnp.concatenate([dx, bcast(p_dx)], axis=3)
        dt = jnp.concatenate([dt, bcast(p_dt)], axis=3)
        dxx = jnp.concatenate([dxx, bcast(p_dxx)], axis=3)
        if second:
            dxx_full = jnp.concatenate([dxx_full, bcast(p_full)], axis=3)
            dxt = jnp.concatenate([dxt, bcast(p_dxt)], axis=3)
    w = x_w * t_w                                      # (Q, K)
    dwdt = x_w * dt_w                                  # (Q, K)
    dwdx = dx_w * t_w[..., None]                       # (Q, K, D)

    if cfg.pou_normalize and (space_pou != "simple" or time_pou != "simple"):
        # Shepard normalization: w_hat = w / W, W = sum_k w_k, with the
        # quotient-rule chain through every tracked derivative. Interior
        # points at matched spacing have W = 1 and all W-derivatives 0, so
        # this only changes the half-spacing edge strips (see RBFConfig).
        W = jnp.sum(w, axis=1, keepdims=True)          # (Q, 1)
        iW = 1.0 / jnp.maximum(W, 1e-12)
        Wx = jnp.sum(dwdx, axis=1, keepdims=True)      # (Q, 1, D)
        Wt = jnp.sum(dwdt, axis=1, keepdims=True)      # (Q, 1)
        iW2 = iW * iW
        if second:
            Wxx = jnp.sum(dwdx2, axis=1, keepdims=True)    # (Q, 1, D, D)
            Wxt = jnp.sum(dwdxdt, axis=1, keepdims=True)   # (Q, 1, D)
            iW3 = iW2 * iW
            dwdx2 = (dwdx2 * iW[..., None, None]
                     - (dwdx[..., :, None] * Wx[..., None, :]
                        + dwdx[..., None, :] * Wx[..., :, None]
                        + w[..., None, None] * Wxx) * iW2[..., None, None]
                     + 2.0 * w[..., None, None]
                     * (Wx[..., :, None] * Wx[..., None, :])
                     * iW3[..., None, None])
            dwdxdt = (dwdxdt * iW[..., None]
                      - (dwdx * Wt[..., None] + dwdt[..., None] * Wx
                         + w[..., None] * Wxt) * iW2[..., None]
                      + 2.0 * (w * Wt)[..., None] * Wx * iW3[..., None])
        dwdx = dwdx * iW[..., None] - (w * iW2)[..., None] * Wx
        dwdt = dwdt * iW - w * Wt * iW2
        w = w * iW

    return PointBasis(phi=phi, dx=dx, dt=dt, dxx=dxx,
                      w=w, dwdt=dwdt, dwdx=dwdx, idx=idx,
                      dxx_full=dxx_full, dxt=dxt,
                      dwdx2=dwdx2, dwdxdt=dwdxdt)


# ---- per-coefficient column blocks (Q, K, E, J) ---------------------------

def basis_val(pb: PointBasis) -> jax.Array:
    """Columns of the value operator: w * phi."""
    return pb.w[:, :, None, None] * pb.phi


def basis_dx(pb: PointBasis) -> jax.Array:
    """Columns of d/dx: w * dphi/dx + dw/dx * phi (product rule through the
    spatial PoU), (Q,K,E,J,D)."""
    return (pb.w[:, :, None, None, None] * pb.dx
            + pb.dwdx[:, :, None, None, :] * pb.phi[..., None])


def basis_dt(pb: PointBasis) -> jax.Array:
    """Columns of d/dt: w * dphi/dt + dw/dt * phi (product rule through the
    time PoU)."""
    return (pb.w[:, :, None, None] * pb.dt
            + pb.dwdt[:, :, None, None] * pb.phi)


# ---- field evaluation against coefficients --------------------------------

def field_value(pb: PointBasis, u: jax.Array) -> jax.Array:
    """u_e(x,t): (Q, E). Reference inference (base/networks.py:452-488)."""
    return jnp.einsum("qkej,qkej->qe", basis_val(pb), u[pb.idx])


def field_grad(pb: PointBasis, u: jax.Array) -> jax.Array:
    """d u_e / d x: (Q, E, D)."""
    return jnp.einsum("qkejd,qkej->qed", basis_dx(pb), u[pb.idx])


def basis_dxx_diag(pb: PointBasis) -> jax.Array:
    """Columns of the diagonal second derivatives: w * phi'' + 2 dw/dx phi'
    (hat PoU has zero second derivative a.e.), (Q,K,E,J,D)."""
    return (pb.w[:, :, None, None, None] * pb.dxx
            + 2.0 * pb.dwdx[:, :, None, None, :] * pb.dx)


def field_dt(pb: PointBasis, u: jax.Array) -> jax.Array:
    """d u_e / d t: (Q, E)."""
    return jnp.einsum("qkej,qkej->qe", basis_dt(pb), u[pb.idx])


def field_lap(pb: PointBasis, u: jax.Array) -> jax.Array:
    """Laplacian of u_e: (Q, E) — capability the reference lacks
    (Hessian TODO at base/networks.py:382)."""
    return jnp.einsum("qkej,qkej->qe", basis_dxx_diag(pb).sum(-1),
                      u[pb.idx])


def basis_hess(pb: PointBasis) -> jax.Array:
    """Columns of the FULL spatial Hessian d2(w phi)/dx_a dx_b, incl. the
    PoU product-rule terms: (Q, K, E, J, D, D). Requires a `second=True`
    point_basis. Symmetric in (a, b) by construction — the stream-function
    formulation's exact-continuity property rests on this symmetry."""
    w = pb.w[:, :, None, None, None, None]
    wa = pb.dwdx[:, :, None, None, :, None]
    wb = pb.dwdx[:, :, None, None, None, :]
    wab = pb.dwdx2[:, :, None, None, :, :]
    return (w * pb.dxx_full
            + wa * pb.dx[..., None, :] + wb * pb.dx[..., :, None]
            + wab * pb.phi[..., None, None])


def basis_dxdt(pb: PointBasis) -> jax.Array:
    """Columns of the mixed derivative d2(w phi)/dx_a dt: (Q, K, E, J, D).
    Requires a `second=True` point_basis."""
    return (pb.w[:, :, None, None, None] * pb.dxt
            + pb.dwdx[:, :, None, None, :] * pb.dt[..., None]
            + pb.dwdt[:, :, None, None, None] * pb.dx
            + pb.dwdxdt[:, :, None, None, :] * pb.phi[..., None])


def field_hess(pb: PointBasis, u: jax.Array) -> jax.Array:
    """Full spatial Hessian of u_e: (Q, E, D, D)."""
    return jnp.einsum("qkejab,qkej->qeab", basis_hess(pb), u[pb.idx])


def field_dxdt(pb: PointBasis, u: jax.Array) -> jax.Array:
    """Mixed space-time derivative of u_e: (Q, E, D)."""
    return jnp.einsum("qkeja,qkej->qea", basis_dxdt(pb), u[pb.idx])


def column_ids(cfg: RBFConfig, idx: jax.Array, var: int) -> jax.Array:
    """Global coefficient columns for (site idx (Q,K), var e): (Q, K*J).

    Coefficient layout: ((site * E) + e) * J + j — the flattened u array.
    (Reference idx_box / expand_idx bookkeeping, base/networks.py:256,
    vortex/model.py:270-292.)
    """
    E, J = cfg.n_vars, cfg.n_feat_total
    base = (idx * E + var) * J                        # (Q, K)
    return (base[:, :, None] + jnp.arange(J)[None, None, :]).reshape(
        idx.shape[0], -1)


def block_ids(cfg: RBFConfig, idx: jax.Array, var: int) -> jax.Array:
    """Block-column ids for (site idx (Q,K), var e): (Q, K) — one id per
    dense J-feature block, `site * E + e` (the J axis stays dense inside
    the block; same flat layout as column_ids: flat = block * J + j)."""
    return idx * cfg.n_vars + var


def spatial_knn_idx(cfg: RBFConfig, p: RBFParams, x: jax.Array) -> jax.Array:
    """Spatial-only neighbor search over basis centers, (Q, K) — reference
    neighbor_search_spatial (base/networks.py:318-344)."""
    _, idx = knn(x, p.centers, cfg.neighbor_k)
    return idx


def structured_spacetime_idx(cfg: RBFConfig, p: RBFParams, x: jax.Array,
                             t: jax.Array, time_window: int = 2) -> jax.Array:
    """Structured neighborhood: K spatial-nearest grid sites x the
    `time_window` nearest time slices — (Q, K * time_window).

    The reference's scaled space-time KNN (base/networks.py:293-316) ranks
    sites by sqrt(|dx|^2 + (dt * bw/tbw)^2); with its default scales the
    temporal term dwarfs the spatial one, so all K neighbors land on the
    query's own time slice and the global system DECOUPLES across slices —
    nothing propagates information forward in time (observed: transported
    fields decay to zero). Exploiting the regular slice layout instead
    guarantees every point couples to adjacent slices.
    """
    ns = cfg.n_sites_spatial
    _, sidx = knn(x, p.centers[:ns], cfg.neighbor_k)       # (Q, K)
    spacing = cfg.time_length / max(cfg.time_num - 1, 1)
    base = jnp.floor(t / spacing).astype(jnp.int32)
    # clamp the window START so the slices are always distinct (a clip on
    # the endpoints would duplicate sites at t = T, breaking the
    # distinct-columns invariant of the sparse assembly)
    base = jnp.clip(base - (time_window - 1) // 2, 0,
                    max(cfg.time_num - time_window, 0))
    offs = jnp.arange(time_window, dtype=jnp.int32)
    slices = base[:, None] + offs[None, :]                 # (Q, W)
    idx = slices[:, :, None] * ns + sidx[:, None, :]       # (Q, W, K)
    return idx.reshape(x.shape[0], -1)


# ---- dense (non-KNN) variant ----------------------------------------------

def point_basis_dense(cfg: RBFConfig, p: RBFParams, x: jax.Array,
                      t: jax.Array) -> PointBasis:
    """All-sites variant (reference Random_Basis_Function.cal_homo,
    base/networks.py:176-194): K = S. Use for small site counts only."""
    S = p.centers.shape[0]
    idx = jnp.tile(jnp.arange(S)[None, :], (x.shape[0], 1))
    return point_basis(cfg, p, x, t, idx=idx)
