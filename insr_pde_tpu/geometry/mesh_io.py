"""Dependency-free mesh readers.

The reference loads tet/tri meshes through `meshio.read`
(elasticity/model.py:75-81: `.points` + `cells_dict['tetra'|'triangle']`).
This module provides a minimal MEDIT `.mesh` and Wavefront `.obj` reader
returning the same (points, cells_dict) surface, as plain numpy on host —
arrays go to device once, when the model builds its constant buffers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict

import numpy as np

# MEDIT section name -> (cell key, vertices per element)
_MEDIT_CELLS = {
    "triangles": ("triangle", 3),
    "tetrahedra": ("tetra", 4),
    "quadrilaterals": ("quad", 4),
    "edges": ("line", 2),
    "hexahedra": ("hexahedron", 8),
}


@dataclass
class MeshData:
    """Mirror of the meshio object surface used by the reference."""
    points: np.ndarray                      # (V, 3) float64
    cells_dict: Dict[str, np.ndarray] = field(default_factory=dict)


def read_medit(path: str) -> MeshData:
    """Parse an ASCII MEDIT `.mesh` file (INRIA format).

    Layout: `MeshVersionFormatted`, `Dimension`, then sections
    (`Vertices`, `Triangles`, `Tetrahedra`, ...) each followed by a count and
    that many whitespace-separated rows; element indices are 1-based (converted
    to 0-based here, matching what meshio hands the reference).

    Uses the fastmesh C extension when a compiler is available
    (insr_pde_tpu/native); this function body is the pure-python fallback.
    Set INSR_NO_NATIVE=1 to force the fallback.
    """
    if not os.environ.get("INSR_NO_NATIVE"):
        try:
            from ..native import read_medit_native
            data = read_medit_native(path)
            if data is not None:
                return data
        except Exception:
            pass  # fall back to the python parser
    with open(path) as f:
        tokens = f.read().split()

    i = 0
    dim = 3
    points = None
    cells: Dict[str, np.ndarray] = {}
    n_tok = len(tokens)
    while i < n_tok:
        word = tokens[i].lower()
        if word == "meshversionformatted":
            i += 2
        elif word == "dimension":
            dim = int(tokens[i + 1])
            i += 2
        elif word == "vertices":
            count = int(tokens[i + 1])
            i += 2
            width = dim + 1  # coords + reference tag
            flat = np.asarray(tokens[i:i + count * width], dtype=np.float64)
            rows = flat.reshape(count, width)
            pts = rows[:, :dim]
            if dim == 2:
                pts = np.concatenate(
                    [pts, np.zeros((count, 1), np.float64)], axis=1)
            points = pts
            i += count * width
        elif word in _MEDIT_CELLS:
            key, nv = _MEDIT_CELLS[word]
            count = int(tokens[i + 1])
            i += 2
            width = nv + 1  # indices + reference tag
            flat = np.asarray(tokens[i:i + count * width], dtype=np.int64)
            cells[key] = flat.reshape(count, width)[:, :nv] - 1
            i += count * width
        elif word == "end":
            break
        else:  # unknown scalar-valued section keyword; skip the keyword
            i += 1
    if points is None:
        raise ValueError(f"{path}: no Vertices section")
    return MeshData(points=points, cells_dict=cells)


def write_medit(path: str, points: np.ndarray,
                cells_dict: Dict[str, np.ndarray]) -> None:
    """Write an ASCII MEDIT `.mesh` file (inverse of `read_medit`).

    Used to materialize procedural stand-in meshes (geometry/procedural.py)
    as files the elasticity CLI can point --mesh_path at — e.g. the
    lucy-scale stand-in for the reference's stripped asset
    (reference .MISSING_LARGE_BLOBS:1, scripts/elasticity3Dlucy.sh)."""
    key_to_section = {v[0]: (k.capitalize(), v[1])
                      for k, v in _MEDIT_CELLS.items()}
    pts = np.asarray(points, np.float64)
    if pts.ndim != 2 or pts.shape[1] != 3:
        raise ValueError(f"points must be (V, 3), got {pts.shape}")
    with open(path, "w") as f:
        f.write("MeshVersionFormatted 2\nDimension\n3\n")
        f.write(f"Vertices\n{len(pts)}\n")
        for p in pts:
            f.write(f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} 0\n")
        for key, cells in cells_dict.items():
            section, nv = key_to_section[key]
            cells = np.asarray(cells, np.int64)
            if cells.shape[1] != nv:
                raise ValueError(
                    f"{key} cells must be (N, {nv}), got {cells.shape}")
            f.write(f"{section}\n{len(cells)}\n")
            for c in cells:
                f.write(" ".join(str(int(v) + 1) for v in c) + " 0\n")
        f.write("End\n")


def read_obj(path: str) -> MeshData:
    """Minimal Wavefront OBJ reader (v/f records, triangulating fans)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return MeshData(points=np.asarray(verts, np.float64),
                    cells_dict={"triangle": np.asarray(faces, np.int64)})


def read_mesh(path: str) -> MeshData:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mesh":
        return read_medit(path)
    if ext == ".obj":
        return read_obj(path)
    raise NotImplementedError(f"mesh format {ext!r} (have: .mesh, .obj)")
