"""fastmesh C extension: build, parity with the python parser, speed."""

import os
import time

import numpy as np
import pytest

from insr_pde_tpu.geometry import box_tet_mesh, boundary_faces
from insr_pde_tpu.geometry.mesh_io import read_medit
from insr_pde_tpu.native import read_medit_native


def _write_medit(path, V, T, SF=None, dim=3):
    with open(path, "w") as f:
        f.write(f"MeshVersionFormatted 1\nDimension {dim}\nVertices\n"
                f"{len(V)}\n")
        for v in V:
            f.write(" ".join(str(x) for x in v[:dim]) + " 1\n")
        if SF is not None:
            f.write(f"Triangles\n{len(SF)}\n")
            for t in SF:
                f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} 1\n")
        f.write(f"Tetrahedra\n{len(T)}\n")
        for t in T:
            f.write(f"{t[0]+1} {t[1]+1} {t[2]+1} {t[3]+1} 1\n")
        f.write("End\n")


@pytest.fixture(scope="module")
def mesh_file(tmp_path_factory):
    V, T = box_tet_mesh(4)
    SF = boundary_faces(T)
    path = tmp_path_factory.mktemp("native") / "box.mesh"
    _write_medit(str(path), V, T, SF)
    return str(path), V, T, SF


def test_native_builds_and_parses(mesh_file):
    path, V, T, SF = mesh_file
    data = read_medit_native(path)
    if data is None:
        pytest.skip("no C compiler available")
    np.testing.assert_allclose(data.points, V, atol=1e-12)
    assert np.array_equal(data.cells_dict["tetra"], T)
    assert np.array_equal(data.cells_dict["triangle"], SF)


def test_native_matches_python_parser(mesh_file):
    path = mesh_file[0]
    native = read_medit_native(path)
    if native is None:
        pytest.skip("no C compiler available")
    os.environ["INSR_NO_NATIVE"] = "1"
    try:
        pyd = read_medit(path)
    finally:
        del os.environ["INSR_NO_NATIVE"]
    np.testing.assert_allclose(native.points, pyd.points, atol=1e-12)
    for k in pyd.cells_dict:
        assert np.array_equal(native.cells_dict[k], pyd.cells_dict[k])


def test_native_is_faster_on_large_mesh(tmp_path):
    if read_medit_native.__module__ and _no_compiler():
        pytest.skip("no C compiler available")
    V, T = box_tet_mesh(14)  # ~3.4k verts, ~13.7k tets
    path = tmp_path / "big.mesh"
    _write_medit(str(path), V, T)

    t0 = time.perf_counter()
    native = read_medit_native(str(path))
    t_native = time.perf_counter() - t0

    os.environ["INSR_NO_NATIVE"] = "1"
    try:
        t0 = time.perf_counter()
        pyd = read_medit(str(path))
        t_py = time.perf_counter() - t0
    finally:
        del os.environ["INSR_NO_NATIVE"]

    np.testing.assert_allclose(native.points, pyd.points)
    # don't enforce a ratio (CI noise) — just report and sanity-bound
    assert t_native < max(t_py * 2.0, 1.0)


def test_native_rejects_duplicate_sections(tmp_path):
    """A second Vertices section must error out, not overflow the buffers
    sized from the first pass (fastmesh.c fm_count/fm_parse contract)."""
    if _no_compiler():
        pytest.skip("no C compiler available")
    path = tmp_path / "dup.mesh"
    with open(path, "w") as f:
        f.write("MeshVersionFormatted 1\nDimension 3\n")
        f.write("Vertices\n1\n0 0 0 1\n")
        f.write("Tetrahedra\n1\n1 1 1 1 1\n")
        # adversarial: second, larger Vertices section
        f.write("Vertices\n3\n1 0 0 1\n0 1 0 1\n0 0 1 1\n")
        f.write("End\n")
    with pytest.raises(ValueError):
        read_medit_native(str(path))


def test_native_rebuilds_on_source_change(tmp_path, monkeypatch):
    """The cached .so is keyed on a content hash of fastmesh.c — a stale or
    foreign binary must never be loaded (ADVICE r1: supply-chain risk)."""
    import insr_pde_tpu.native as native
    if _no_compiler():
        pytest.skip("no C compiler available")
    # poison the hash sidecar: _build() must detect the mismatch and rebuild
    with open(native._SO_HASH, "w") as f:
        f.write("deadbeef")
    so = native._build()
    assert so is not None
    with open(native._SO_HASH) as f:
        assert f.read().strip() == native._src_hash()


def _no_compiler():
    from insr_pde_tpu.native import _load
    return _load() is None
