"""Native host-runtime components (C, built on demand, pure-python fallback).

`read_medit_native(path)` parses a MEDIT .mesh via the fastmesh C extension
(compiled once with the system compiler into the package dir; returns None if
no compiler is available so callers fall back to the python parser in
geometry/mesh_io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastmesh.c")
_SO = os.path.join(_HERE, "_fastmesh.so")
_SO_HASH = _SO + ".sha256"  # content hash of the source the .so was built from
_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    # The binary is never committed (gitignored); a cached .so is reused only
    # when the sidecar hash matches the current source content — mtimes are
    # unreliable after checkout and a stale/committed blob must never win.
    want = _src_hash()
    try:
        with open(_SO_HASH) as f:
            have = f.read().strip()
    except OSError:
        have = ""
    if os.path.exists(_SO) and have == want:
        return _SO
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
            with open(_SO_HASH, "w") as f:
                f.write(want)
            return _SO
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_longlong
        lib.fm_count.restype = ctypes.c_int
        lib.fm_count.argtypes = [ctypes.c_char_p, i64,
                                 ctypes.POINTER(i64), ctypes.POINTER(i64),
                                 ctypes.POINTER(i64), ctypes.POINTER(i64)]
        lib.fm_parse.restype = ctypes.c_int
        lib.fm_parse.argtypes = [
            ctypes.c_char_p, i64, i64, i64, i64, i64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        _lib = lib
        return _lib


def read_medit_native(path: str):
    """Parse a MEDIT .mesh with the C extension.

    Returns a geometry.mesh_io.MeshData, or None when the extension cannot
    be built (callers then use the python parser).
    """
    lib = _load()
    if lib is None:
        return None
    from ..geometry.mesh_io import MeshData

    with open(path, "rb") as f:
        buf = f.read()
    i64 = ctypes.c_longlong
    dim, nv, ntri, ntet = i64(), i64(), i64(), i64()
    rc = lib.fm_count(buf, len(buf), ctypes.byref(dim), ctypes.byref(nv),
                      ctypes.byref(ntri), ctypes.byref(ntet))
    if rc != 0:
        what = "duplicate section in" if rc == 2 else "truncated"
        raise ValueError(f"{path}: {what} MEDIT file")
    verts = np.empty((nv.value, 3), np.float64)
    tris = np.empty((max(ntri.value, 1), 3), np.int64)
    tets = np.empty((max(ntet.value, 1), 4), np.int64)
    rc = lib.fm_parse(buf, len(buf), dim.value, nv.value, ntri.value,
                      ntet.value, verts, tris, tets)
    if rc != 0:
        what = "inconsistent counts in" if rc == 2 else "truncated"
        raise ValueError(f"{path}: {what} MEDIT file")
    cells = {}
    if ntri.value:
        cells["triangle"] = tris
    if ntet.value:
        cells["tetra"] = tets
    return MeshData(points=verts, cells_dict=cells)
