"""Mesh geometry ops as pure JAX functions.

TPU-native redesign of the reference's kaolin-derived torchgp helpers
(reference: elasticity/torchgp/*.py). Differences by design:
  * samplers are pure functions of an explicit PRNG key, fully on-device —
    the reference bounces to host numpy for Dirichlet barycentric weights in
    its hot loop (torchgp/sample_volume.py:37-38); here `jax.random.dirichlet`
    keeps everything in the compiled program;
  * "distribution" objects (torch.distributions.Categorical,
    area/volume_weighted_distribution.py) become plain probability arrays
    consumed by `jax.random.categorical` on log-probs;
  * `per_vertex_areas` uses scatter-add (`.at[].add`) and does NOT reproduce
    the reference's off-by-one `-1` index shift for tet meshes
    (torchgp/per_vertex_areas.py:22 subtracts 1 from already-0-based indices);
  * `boundary_faces` is host-side numpy (runs once at mesh load), same
    unique-sorted-faces-with-count-1 algorithm as the reference
    (torchgp/boundary_faces.py:4-29, a gptoolbox port).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- measures


def per_face_normals(V: jax.Array, F: jax.Array) -> jax.Array:
    """Unnormalized face normals (cross products), (F, 3).
    Reference: torchgp/per_face_normals.py:25-35."""
    f = V[F]  # (F, 3, 3)
    return jnp.cross(f[:, 1] - f[:, 0], f[:, 2] - f[:, 0])


def per_face_areas(V: jax.Array, F: jax.Array) -> jax.Array:
    """Triangle areas, (F,). Reference: torchgp/per_face_areas.py:4-15."""
    if V.shape[-1] == 2:
        V = jnp.concatenate([V, jnp.zeros_like(V[:, :1])], axis=-1)
    return 0.5 * jnp.linalg.norm(per_face_normals(V, F), axis=-1)


def per_tet_volumes(V: jax.Array, T: jax.Array) -> jax.Array:
    """Tet volumes |(a x b) . c| / 6, (T,).
    Reference: torchgp/per_tet_volumes.py:3-18."""
    t = V[T]  # (T, 4, 3)
    a, b, c = t[:, 1] - t[:, 0], t[:, 2] - t[:, 0], t[:, 3] - t[:, 0]
    return jnp.abs(jnp.einsum("td,td->t", jnp.cross(a, b), c)) / 6.0


def per_vertex_areas(V: jax.Array, T: jax.Array) -> jax.Array:
    """Barycentric-lumped area (tris) or volume (tets) per vertex, (V, 1).
    Reference: torchgp/per_vertex_areas.py:5-40 (scatter-add form)."""
    nv_elem = T.shape[1]
    if nv_elem == 4:
        measure = per_tet_volumes(V, T)
    elif nv_elem == 3:
        measure = per_face_areas(V, T)
    else:
        raise NotImplementedError(f"elements with {nv_elem} vertices")
    share = measure / nv_elem
    out = jnp.zeros((V.shape[0],), V.dtype)
    for k in range(nv_elem):
        out = out.at[T[:, k]].add(share)
    return out[:, None]


# ------------------------------------------------------------ distributions


def area_weighted_distribution(V, F) -> jax.Array:
    """Face-sampling probabilities (F,), proportional to area.
    Reference: torchgp/area_weighted_distribution.py:26-45 (Categorical)."""
    a = per_face_areas(V, F)
    return a / jnp.sum(a)


def volume_weighted_distribution(V, T) -> jax.Array:
    """Tet-sampling probabilities (T,), proportional to volume.
    Reference: torchgp/volume_weighted_distribution.py:4-23."""
    v = per_tet_volumes(V, T)
    return v / jnp.sum(v)


def _categorical(key, probs, n):
    logits = jnp.log(jnp.clip(probs, 1e-30, None))
    return jax.random.categorical(key, logits, shape=(n,))


def random_face(key, V, F, n, distrib=None) -> jax.Array:
    """Sample n face indices ~ area. Reference: torchgp/random_face.py:27-45."""
    if distrib is None:
        distrib = area_weighted_distribution(V, F)
    return _categorical(key, distrib, n)


def random_tet(key, V, T, n, distrib=None) -> jax.Array:
    """Sample n tet indices ~ volume. Reference: torchgp/random_tet.py:5-22."""
    if distrib is None:
        distrib = volume_weighted_distribution(V, T)
    return _categorical(key, distrib, n)


# ----------------------------------------------------------------- sampling


def sample_surface(key, V, F, n, distrib=None) -> jax.Array:
    """n area-weighted surface samples via sqrt-uv barycentric interpolation.
    Reference: torchgp/sample_surface.py:27-52."""
    kf, ku, kv = jax.random.split(key, 3)
    fidx = random_face(kf, V, F, n, distrib)
    f = V[F[fidx]]  # (n, 3, d)
    u = jnp.sqrt(jax.random.uniform(ku, (n, 1), V.dtype))
    v = jax.random.uniform(kv, (n, 1), V.dtype)
    return (1 - u) * f[:, 0] + (u * (1 - v)) * f[:, 1] + (u * v) * f[:, 2]


def sample_volume(key, V, T, n, distrib=None) -> jax.Array:
    """n volume-weighted tet samples with Dirichlet(1,1,1,1) barycentric
    weights — fully on-device (the reference round-trips to host numpy here,
    torchgp/sample_volume.py:37-38). Reference: torchgp/sample_volume.py:9-75."""
    kt, kb = jax.random.split(key)
    tidx = random_tet(kt, V, T, n, distrib)
    tet = V[T[tidx]]  # (n, 4, d)
    barys = jax.random.dirichlet(kb, jnp.ones((4,), V.dtype), (n,))
    return jnp.einsum("nk,nkd->nd", barys, tet)


def sample_mesh(key, V, F, n, distrib=None) -> jax.Array:
    """Dispatch tri -> surface, tet -> volume (reference
    elasticity/sampling.py:4-9)."""
    if F.shape[1] == 3:
        return sample_surface(key, V, F, n, distrib)
    if F.shape[1] == 4:
        return sample_volume(key, V, F, n, distrib)
    raise NotImplementedError(f"elements with {F.shape[1]} vertices")


def sample_near_surface(key, V, F, n, variance: float = 0.01,
                        distrib=None) -> jax.Array:
    """Surface samples + gaussian normal jitter.
    Reference: torchgp/sample_near_surface.py:27-45."""
    ks, kn = jax.random.split(key)
    samples = sample_surface(ks, V, F, n, distrib)
    return samples + variance * jax.random.normal(kn, samples.shape, V.dtype)


def sample_uniform_aabb(key, n, sdim: int = 3, dtype=jnp.float32) -> jax.Array:
    """Uniform samples in the [-1, 1]^sdim bounding box (the mesh-space
    analogue of torchgp/sample_uniform.py:25-31)."""
    return jax.random.uniform(key, (n, sdim), dtype, -1.0, 1.0)


def barycentric_coordinates(points, A, B, C) -> jax.Array:
    """Barycentric coords of (N, 3) points w.r.t. triangles (A, B, C).
    Reference: torchgp/barycentric_coordinates.py:27-56."""
    v0, v1 = B - A, C - A
    v2 = points - A
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = d00 * d11 - d01 * d01
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def point_sample(key, V, F, methods, n_per_method) -> jax.Array:
    """Combined sampler: list of 'rand' | 'near' | 'trace' methods, n samples
    each (reference torchgp/point_sample.py:29-57)."""
    outs = []
    for m in methods:
        key, sub = jax.random.split(key)
        if m == "rand":
            outs.append(sample_uniform_aabb(sub, n_per_method, V.shape[1],
                                            V.dtype))
        elif m == "near":
            outs.append(sample_near_surface(sub, V, F, n_per_method))
        elif m == "trace":
            outs.append(sample_surface(sub, V, F, n_per_method))
        else:
            raise NotImplementedError(f"point_sample method {m!r}")
    return jnp.concatenate(outs, axis=0)


# --------------------------------------------------------------- transforms


def normalize(V, F):
    """Center the bbox and scale to unit max radius (reference
    torchgp/normalize.py:24-38). Returns (V', F)."""
    v_center = (jnp.max(V, axis=0) + jnp.min(V, axis=0)) / 2.0
    V = V - v_center
    max_dist = jnp.sqrt(jnp.max(jnp.sum(V ** 2, axis=-1)))
    return V / max_dist, F


def boundary_faces(T: np.ndarray) -> np.ndarray:
    """Boundary triangles of a tet mesh: faces appearing exactly once among
    all per-tet faces, orientation preserved. Host-side numpy, runs once at
    mesh load. Reference: torchgp/boundary_faces.py:4-29."""
    T = np.asarray(T)
    assert T.shape[1] == 4
    all_f = np.vstack((T[:, [3, 1, 2]], T[:, [2, 0, 3]],
                       T[:, [1, 3, 0]], T[:, [0, 2, 1]]))
    sorted_f = np.sort(all_f, axis=1)
    _, idx, counts = np.unique(sorted_f, return_index=True,
                               return_counts=True, axis=0)
    return all_f[idx[counts == 1]]


def sample_spc(key, corners: jax.Array, level: int,
               num_samples: int) -> jax.Array:
    """Uniform samples inside structured-point-cloud voxels: jitter within
    each corner's unit cell at `level`, mapped to [-1, 1]^3.
    Reference: torchgp/sample_spc.py:26-44 (kaolin SPC leftover; exported
    but unused by any reference model)."""
    res = 2.0 ** level
    jitter = jax.random.uniform(key, (corners.shape[0], num_samples, 3),
                                corners.dtype)
    samples = (corners[:, None, :3] + jitter).reshape(-1, 3) / res
    return samples * 2.0 - 1.0


def sample_tex(uv: jax.Array, material_idx: jax.Array,
               textures: jax.Array) -> jax.Array:
    """RGB lookup at (N, 2) uv coords with bilinear interpolation.

    textures: (M, H, W, 3) stack of material images (uniform size; the
    gather-based bilinear replaces torch grid_sample). The v axis is flipped
    to match image row order, as the reference notes
    (torchgp/sample_tex.py:37-38). Reference: torchgp/sample_tex.py:27-60
    (kaolin leftover; exported but unused by any reference model)."""
    h, w = textures.shape[1], textures.shape[2]
    u = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    v = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (h - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    m = material_idx
    c00 = textures[m, v0, u0]
    c01 = textures[m, v0, u1]
    c10 = textures[m, v1, u0]
    c11 = textures[m, v1, u1]
    return ((1 - fv) * ((1 - fu) * c00 + fu * c01)
            + fv * ((1 - fu) * c10 + fu * c11))
