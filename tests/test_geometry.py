"""Mesh geometry library tests (reference parity: elasticity/torchgp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insr_pde_tpu.geometry import (area_weighted_distribution, boundary_faces,
                                   box_tet_mesh, box_tri_mesh, normalize,
                                   per_face_areas, per_tet_volumes,
                                   per_vertex_areas, read_medit, sample_mesh,
                                   sample_surface, sample_volume,
                                   volume_weighted_distribution)


@pytest.fixture(scope="module")
def tri_mesh():
    V, F = box_tri_mesh(4)
    return jnp.asarray(V, jnp.float32), jnp.asarray(F)


@pytest.fixture(scope="module")
def tet_mesh():
    V, T = box_tet_mesh(2)
    return jnp.asarray(V, jnp.float32), jnp.asarray(T)


def test_tri_areas_sum(tri_mesh):
    V, F = tri_mesh
    assert np.isclose(float(jnp.sum(per_face_areas(V, F))), 4.0, rtol=1e-5)


def test_tet_volumes_sum(tet_mesh):
    V, T = tet_mesh
    assert np.isclose(float(jnp.sum(per_tet_volumes(V, T))), 8.0, rtol=1e-5)


def test_per_vertex_areas_sum(tet_mesh):
    V, T = tet_mesh
    assert np.isclose(float(jnp.sum(per_vertex_areas(V, T))), 8.0, rtol=1e-5)


def test_normalize_unit_radius(tet_mesh):
    V, T = tet_mesh
    Vn, _ = normalize(V * 3.7 + 2.0, T)
    r = jnp.sqrt(jnp.max(jnp.sum(Vn ** 2, axis=-1)))
    assert np.isclose(float(r), 1.0, rtol=1e-5)


def test_boundary_faces_of_cube(tet_mesh):
    V, T = tet_mesh
    SF = boundary_faces(np.asarray(T))
    # surface area of the tri-boundary of the [-1,1]^3 cube = 24
    area = float(jnp.sum(per_face_areas(V, jnp.asarray(SF))))
    assert np.isclose(area, 24.0, rtol=1e-5)


def test_sample_surface_on_mesh(tri_mesh):
    V, F = tri_mesh
    pts = sample_surface(jax.random.PRNGKey(0), V, F, 512)
    assert pts.shape == (512, 3)
    # the tri mesh lives in the z=0 plane of [-1,1]^2
    assert float(jnp.max(jnp.abs(pts[:, 2]))) < 1e-6
    assert float(jnp.max(jnp.abs(pts[:, :2]))) <= 1.0 + 1e-5


def test_sample_volume_inside(tet_mesh):
    V, T = tet_mesh
    pts = sample_volume(jax.random.PRNGKey(1), V, T, 1024)
    assert pts.shape == (1024, 3)
    assert float(jnp.max(jnp.abs(pts))) <= 1.0 + 1e-5
    # roughly uniform: mean near 0
    assert float(jnp.max(jnp.abs(jnp.mean(pts, axis=0)))) < 0.1


def test_sample_mesh_dispatch(tri_mesh, tet_mesh):
    k = jax.random.PRNGKey(2)
    assert sample_mesh(k, *tri_mesh, 16).shape == (16, 3)
    assert sample_mesh(k, *tet_mesh, 16).shape == (16, 3)


def test_distributions_normalized(tri_mesh, tet_mesh):
    V, F = tri_mesh
    assert np.isclose(float(jnp.sum(area_weighted_distribution(V, F))), 1.0)
    V, T = tet_mesh
    assert np.isclose(float(jnp.sum(volume_weighted_distribution(V, T))), 1.0)


def test_read_medit_roundtrip(tmp_path):
    V, T = box_tet_mesh(1)
    SF = boundary_faces(T)
    path = tmp_path / "box.mesh"
    with open(path, "w") as f:
        f.write("MeshVersionFormatted 1\nDimension 3\nVertices\n")
        f.write(f"{len(V)}\n")
        for v in V:
            f.write(f"{v[0]} {v[1]} {v[2]} 1\n")
        f.write(f"Triangles\n{len(SF)}\n")
        for t in SF:
            f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} 1\n")
        f.write(f"Tetrahedra\n{len(T)}\n")
        for t in T:
            f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} {t[3]+1} 1\n")
        f.write("End\n")
    data = read_medit(str(path))
    assert np.allclose(data.points, V)
    assert np.array_equal(data.cells_dict["tetra"], T)
    assert np.array_equal(data.cells_dict["triangle"], SF)


def test_sample_spc_in_bounds():
    from insr_pde_tpu.geometry import sample_spc
    corners = jnp.asarray([[0, 0, 0], [3, 3, 3]], jnp.float32)
    pts = sample_spc(jax.random.PRNGKey(0), corners, level=2, num_samples=50)
    assert pts.shape == (100, 3)
    assert float(jnp.min(pts)) >= -1.0 and float(jnp.max(pts)) <= 1.0


def test_sample_tex_bilinear():
    from insr_pde_tpu.geometry import sample_tex
    # 2x2 texture: corners with known colors; uv (0,1)=top-left row 0
    tex = jnp.asarray([[[[1, 0, 0], [0, 1, 0]],
                        [[0, 0, 1], [1, 1, 1]]]], jnp.float32)
    uv = jnp.asarray([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [0.5, 0.5]])
    idx = jnp.zeros(4, jnp.int32)
    rgb = sample_tex(uv, idx, tex)
    np.testing.assert_allclose(np.asarray(rgb[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb[1]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb[2]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb[3]), [0.5, 0.5, 0.5],
                               atol=1e-6)


def test_write_medit_roundtrip(tmp_path):
    """write_medit -> read_medit is the identity on points/cells (the
    lucy-stand-in pipeline materializes procedural meshes this way)."""
    from insr_pde_tpu.geometry import write_medit
    V, T = box_tet_mesh(2)
    path = tmp_path / "rt.mesh"
    write_medit(str(path), V, {"tetra": T})
    data = read_medit(str(path))
    assert np.allclose(data.points, V)
    assert np.array_equal(data.cells_dict["tetra"], T)


def test_statue_tet_mesh_valid():
    """Lucy-scale stand-in: right vertex/tet counts, positive volumes
    (taper+twist is orientation-preserving), height span [0, 2]."""
    from insr_pde_tpu.geometry import statue_tet_mesh
    n = 6
    V, T = statue_tet_mesh(n)
    assert V.shape == ((n + 1) ** 3, 3)
    assert T.shape == (5 * n ** 3, 4)
    vols = np.asarray(per_tet_volumes(jnp.asarray(V, jnp.float32),
                                      jnp.asarray(T)))
    assert (vols > 0).all() or (vols < 0).all()  # consistent orientation
    assert abs(float(np.abs(vols).sum())) > 0.5  # non-degenerate solid
    assert np.isclose(V[:, 2].min(), 0.0) and np.isclose(V[:, 2].max(), 2.0)
