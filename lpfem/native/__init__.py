"""Native (C++) host-runtime kernels with ctypes bindings.

The reference's host-side machinery is C++ (MFEM); here the numerics run in
JAX/XLA on TPU, and the host runtime pieces that benefit from native speed —
topological dof numbering, mesh refinement — are C++ with a NumPy fallback.

The shared library is built on demand with ``g++`` (cached next to the
source); if no toolchain is available everything silently falls back to the
NumPy implementations in :mod:`lpfem.space` / :mod:`lpfem.mesh`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "dofs.cpp")

_lib = None
_tried = False


def _so_path() -> str:
    """Library path keyed by a hash of the source: a stale binary (e.g. from
    a fresh clone where checkout mtimes are meaningless) can never be loaded
    against a newer dofs.cpp."""
    import hashlib
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"liblpfem_native-{h}.so")


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        so = _so_path()
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", so],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.lpfem_build_hex_dofs.restype = ctypes.c_int64
        lib.lpfem_build_hex_dofs.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_hex_dofs(elems: np.ndarray, n_verts: int, p: int):
    """Native topological dof numbering; returns (elem_dofs, n_dofs) or None
    if the native library is unavailable.

    Note: edge/face ids use first-encounter order (the NumPy path uses
    sorted-unique order), so raw dof ids differ by a permutation; all
    topological invariants (sharing pattern, counts) are identical. Use one
    path consistently per space — :class:`lpfem.space.H1Space` does.
    """
    lib = _load()
    if lib is None:
        return None
    elems = np.ascontiguousarray(elems, dtype=np.int64)
    ne = elems.shape[0]
    out = np.zeros((ne, (p + 1) ** 3), dtype=np.int64)
    n = lib.lpfem_build_hex_dofs(
        elems.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ne, int(n_verts), int(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        return None
    return out, int(n)
