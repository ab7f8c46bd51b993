"""Native C++ host-I/O parity: Gmsh parser and binary VTU writer
(``lpfem/native/vtuio.cpp``) against the pure-Python fallbacks.

The reference gets both from MFEM's C++ (the Gmsh reader behind
``Mesh(file)``, ``Solvers/cylinder-diffraction.cpp:225``; and
``ParaViewDataCollection``, ``Solvers/PF_linear_par.cpp:433-449``)."""

import os

import numpy as np
import pytest

from lpfem import native
from lpfem.io import volume_cells, write_vtu
from lpfem.mesh import load_gmsh, make_cartesian3d
from lpfem.space import H1Space

REF_MSH = "/root/reference/Meshes/mesh_cylinder_half.msh"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_gmsh_native_matches_python(monkeypatch):
    if not os.path.exists(REF_MSH):
        pytest.skip("reference mesh not present")
    m_nat = load_gmsh(REF_MSH)
    monkeypatch.setattr(native, "parse_gmsh", lambda p: None)
    m_py = load_gmsh(REF_MSH)
    assert np.array_equal(m_py.verts, m_nat.verts)
    assert np.array_equal(m_py.elems, m_nat.elems)
    assert np.array_equal(m_py.bdr_quads, m_nat.bdr_quads)
    assert np.array_equal(m_py.bdr_attrs, m_nat.bdr_attrs)
    assert m_nat.verts.shape == (4290, 3)     # committed-mesh node count


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_vtu_binary_blocks_match_ascii_data(tmp_path):
    m = make_cartesian3d(3, 2, 2, 1.0, 0.5, 0.5)
    sp = H1Space(m, 3)
    v = np.arange(sp.n_dofs, dtype=float)
    path = str(tmp_path / "t.vtu")
    write_vtu(path, sp, {"phi": v}, binary=True)
    raw = open(path, "rb").read()
    assert b'encoding="raw"' in raw and b'header_type="UInt64"' in raw
    i = raw.index(b'encoding="raw">') + len(b'encoding="raw">')
    while raw[i:i + 1] in b"\n_":
        i += 1

    def block(i):
        n = int.from_bytes(raw[i:i + 8], "little")
        return raw[i + 8:i + 8 + n], i + 8 + n

    pts_b, i = block(i)
    conn_b, i = block(i)
    offs_b, i = block(i)
    types_b, i = block(i)
    fld_b, i = block(i)
    pts, conn = volume_cells(sp)
    assert np.array_equal(np.frombuffer(pts_b).reshape(-1, 3), pts)
    assert np.array_equal(
        np.frombuffer(conn_b, dtype=np.int64).reshape(-1, 8), conn)
    assert np.array_equal(np.frombuffer(offs_b, dtype=np.int64),
                          8 * np.arange(1, len(conn) + 1))
    assert np.all(np.frombuffer(types_b, dtype=np.uint8) == 12)
    assert np.array_equal(np.frombuffer(fld_b),
                          v[np.asarray(sp.elem_dofs)].reshape(-1))
