"""Native C++ kernels, cylinder mesh, io, analytic series."""

import os

import numpy as np
import pytest

from lpfem import native
from lpfem.cylmesh import make_half_cylinder_tank
from lpfem.mesh import make_wave_tank, make_wave_tank_finite, load_mfem
from lpfem.space import H1Space, SurfaceSpace, build_hex_dofs


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("p", [2, 3, 4])
def test_native_dof_numbering_semantics(p):
    m = make_wave_tank(4, 2, 2)
    ednp, nnp, _ = build_hex_dofs(m.elems, m.n_verts, p)
    edc, nc = native.build_hex_dofs(m.elems, m.n_verts, p)
    assert nnp == nc
    # ids may be permuted; the sharing pattern must be identical
    def canon(ed):
        flat = ed.ravel()
        first = {}
        out = np.zeros_like(flat)
        for i, v in enumerate(flat):
            out[i] = first.setdefault(v, len(first))
        return out
    assert np.array_equal(canon(ednp), canon(edc))


def test_half_cylinder_mesh_valid():
    from lpfem.operators import LaplacePA, geometric_factors
    m = make_half_cylinder_tank(n_theta=12, n_r=6, nz=2)
    sp = H1Space(m, 2)
    op = LaplacePA(sp)  # raises on inverted elements
    import jax.numpy as jnp
    vol = float(jnp.sum(op.wdetJ))
    exact = 12 * 6 * (1 / (2 * np.pi)) - 0.5 * np.pi * 0.25 * (1 / (2 * np.pi))
    # faceted cylinder: slightly larger hole boundary chords -> small excess
    assert abs(vol - exact) / exact < 2e-3
    # attrs: free surface and cylinder wall exist
    surf = SurfaceSpace(sp, attr=2)
    cyl = SurfaceSpace(sp, attr=3)
    r = np.hypot(cyl.node_coords[:, 0] - 4.0, cyl.node_coords[:, 1])
    assert np.all(np.abs(r - 0.5) < 8e-3)


def test_half_cylinder_curved_geometry():
    """Isoparametric curvature (SetCurvature parity, better than the
    reference's faceted re-interpolation): exact rim circle + exact volume."""
    from lpfem.operators import LaplacePA
    import jax.numpy as jnp
    m = make_half_cylinder_tank(n_theta=12, n_r=6, nz=2, geom_order=3)
    sp = H1Space(m, 3)
    op = LaplacePA(sp)
    vol = float(jnp.sum(op.wdetJ))
    exact = 12 * 6 * (1 / (2 * np.pi)) - 0.5 * np.pi * 0.25 * (1 / (2 * np.pi))
    assert abs(vol - exact) / exact < 1e-9
    cyl = SurfaceSpace(sp, attr=3)
    r = np.hypot(cyl.node_coords[:, 0] - 4.0, cyl.node_coords[:, 1])
    assert np.max(np.abs(r - 0.5)) < 1e-12


def test_mccamy_fuchs_known_values():
    from lpfem.analytic import mccamy_fuchs_envelope
    # long-wave limit ka->0: runup -> ~2 upwave... sanity: values positive,
    # bounded, and the up-wave side (theta=pi) exceeds the shadow (theta=0)
    th = np.linspace(0, np.pi, 91)
    env = mccamy_fuchs_envelope(th, ka=np.pi)  # ka for lambda=1, a=0.5
    assert np.all(env > 0) and np.all(env < 4)
    assert env[-1] > env[0]   # run-up on the incident side


def test_io_roundtrip(tmp_path):
    import jax.numpy as jnp
    from lpfem.io import (DataFile, ParaViewCollection, load_checkpoint,
                          save_checkpoint, write_vtu, write_vtu_surface)
    m = make_wave_tank_finite(4, 1, 1)
    sp = H1Space(m, 2)
    surf = SurfaceSpace(sp, attr=2)
    u = sp.project(lambda x, y, z: x + y * z)
    pc = ParaViewCollection(str(tmp_path), "t")
    pc.save(0, 0.0, write_vtu, sp, {"u": u})
    pc.save(1, 0.5, write_vtu_surface, surf, {"v": u[surf.surf_to_vol]})
    assert os.path.exists(tmp_path / "t" / "t.pvd")
    ck = tmp_path / "c.npz"
    save_checkpoint(str(ck), step=3, t=1.5, y=u[:10], phi=u, run="x")
    step, t, y, phi, meta = load_checkpoint(str(ck))
    assert step == 3 and t == 1.5 and meta["run"] == "x"
    assert np.allclose(y, u[:10])
    df = DataFile(str(tmp_path / "d.txt"), "a b")
    df.append(1, 2.5)
    df2 = DataFile(str(tmp_path / "d.txt"), "a b")
    df2.append(2, 3.5)
    assert df2.read().shape == (2, 2)


def test_mfem_parser_roundtrip_via_reference():
    """Parse the committed periodic mesh if the reference tree is mounted."""
    path = "/root/reference/Meshes/wave-tank.mesh"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    m = load_mfem(path)
    assert m.n_elems == 3 and m.n_verts == 12 and m.periodic
    assert m.periodic_axes == (0,)
    # same counts as our generator
    g = make_wave_tank(3, 1, 1)
    sp_m = H1Space(m, 3)
    sp_g = H1Space(g, 3)
    assert sp_m.n_dofs == sp_g.n_dofs


def test_gmsh_parser_via_reference():
    path = "/root/reference/Meshes/mesh_cylinder_half.msh"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    from lpfem.mesh import load_gmsh
    m = load_gmsh(path)
    assert m.n_elems > 0
    assert 2 in m.bdr_attrs and 3 in m.bdr_attrs
    from lpfem.operators import LaplacePA
    sp = H1Space(m, 1)
    LaplacePA(sp)   # positive Jacobians


def test_polar_mesh_structured_lattice_equivalence():
    """The polar cylinder mesh declares a logical lattice; the structured
    (gather-free) numbering must produce the same operator action as the
    generic topological numbering, matched through node coordinates."""
    import jax.numpy as jnp
    from lpfem.operators import LaplacePA

    p = 3
    m = make_half_cylinder_tank(n_theta=14, n_r=7, nz=2, geom_order=p)
    sp_s = H1Space(m, p)
    sp_u = H1Space(m, p, structured=False)
    assert sp_s.struct is not None
    assert sp_u.struct is None
    f = lambda X: np.sin(3 * X[:, 0]) * np.cos(2 * X[:, 1]) + X[:, 2] ** 2
    xs = jnp.asarray(f(sp_s.node_coords))
    xu = jnp.asarray(f(sp_u.node_coords))
    ys = np.asarray(LaplacePA(sp_s).apply(xs))
    yu = np.asarray(LaplacePA(sp_u).apply(xu))
    ks = np.lexsort(np.round(sp_s.node_coords, 9).T)
    ku = np.lexsort(np.round(sp_u.node_coords, 9).T)
    assert np.allclose(sp_s.node_coords[ks], sp_u.node_coords[ku], atol=1e-9)
    assert np.allclose(ys[ks], yu[ku], atol=1e-12)


def test_polar_mesh_capped_radial_profile():
    """dr_max caps every radial layer (wave-resolving far field)."""
    m = make_half_cylinder_tank(n_theta=32, nz=1, dr_max=0.35, grading=1.4,
                                geom_order=2)
    assert m.lattice_dims is not None
    cc = m.corner_coords
    # per-ray radial layer width must be <= dr_max: corners v0->v1 and
    # v3->v2 are the +r edges at fixed theta (see cylmesh element ordering)
    r = np.hypot(cc[..., 0] - 4.0, cc[..., 1])
    dr = np.maximum(np.abs(r[:, 1] - r[:, 0]), np.abs(r[:, 2] - r[:, 3]))
    assert float(dr.max()) <= 0.35 + 1e-9


def test_gmsh_curvature_exact_rim():
    """SetCurvature-equivalent on the committed reference mesh: with the
    cylinder projector the imported faceted rim becomes exactly circular
    (the capability MFEM's SetCurvature cannot recover from a linear mesh,
    cylinder-diffraction.cpp:259-264); elements stay valid."""
    import jax.numpy as jnp
    from lpfem.mesh import load_gmsh, set_curvature, cylinder_projector
    from lpfem.operators import LaplacePA

    path = "/root/reference/Meshes/mesh_cylinder_half.msh"
    if not os.path.exists(path):
        pytest.skip("reference mesh not available")
    m = load_gmsh(path)
    set_curvature(m, 3, {3: cylinder_projector(4.0, 4.0, 0.5)})
    sp = H1Space(m, 3)
    op = LaplacePA(sp)  # raises on inverted elements
    X = sp.node_coords
    r = np.hypot(X[:, 0] - 4.0, X[:, 1] - 4.0)
    near = np.abs(r - 0.5) <= 5e-3
    assert near.sum() > 100
    assert np.abs(r[near] - 0.5).max() < 1e-12
    # domain volume = tank minus half-cylinder, exact with the curved rim
    vol = float(jnp.sum(op.wdetJ))
    exact = 12 * 6 * (1 / (2 * np.pi)) - 0.5 * np.pi * 0.25 * (1 / (2 * np.pi))
    assert abs(vol - exact) / exact < 2e-5


def test_glvis_stream(tmp_path):
    """GLVis socket payload: a local TCP sink receives a well-formed
     'solution' stream (mesh + P1 gridfunction); no server -> graceful
    disable (PF_linear_serial.cpp:447-455 behavior)."""
    import socket
    import threading
    from lpfem.glvis import GLVisStream, solution_text

    m = make_wave_tank_finite(4, 1, 1)
    sp = H1Space(m, 3)
    surf = SurfaceSpace(sp, attr=2)
    u = sp.project(lambda x, y, z: x + y * z)

    # payload structure (volume + surface)
    txt = solution_text(sp, u, keys="Rjlc")
    assert txt.startswith("solution\nMFEM mesh v1.0")
    assert f"elements\n{m.n_elems * 27}\n" in txt      # p^3 sub-hexes
    assert "FiniteElementCollection: H1_3D_P1" in txt
    assert txt.rstrip().endswith("keys Rjlc")
    n_vals = len(txt.split("Ordering: 0\n\n")[1].split("keys")[0].split())
    assert n_vals == m.n_elems * 4 ** 3                # one value per lattice pt
    stxt = solution_text(surf, u[surf.surf_to_vol])
    assert "H1_2D_P1" in stxt and "dimension\n2" in stxt

    # live socket round-trip
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = []

    def sink():
        conn, _ = srv.accept()
        while chunk := conn.recv(1 << 16):
            received.append(chunk)
        conn.close()

    th = threading.Thread(target=sink, daemon=True)
    th.start()
    vis = GLVisStream("127.0.0.1", port)
    assert vis.send(surf, u[surf.surf_to_vol], keys="Rj")
    vis.close()
    th.join(timeout=5)
    srv.close()
    assert b"".join(received).decode() == solution_text(
        surf, u[surf.surf_to_vol], keys="Rj")

    # nobody listening: returns False, disables, does not raise
    dead = GLVisStream("127.0.0.1", port)
    assert not dead.send(surf, u[surf.surf_to_vol])
    assert not dead.send(surf, u[surf.surf_to_vol])


def test_rim_extraction_exact_ring_only():
    """The diffraction rim trace must keep ONLY the r=a ring. The
    reference's loose 5e-3 band (cylinder-diffraction.cpp:483) also
    catches first-interior GLL nodes on a wave-resolving mesh, whose
    off-rim field values appear as paired-point spikes in eta(theta) —
    the exact failure the tight default tolerance exists to prevent."""
    from experiments.diffraction import extract_rim
    p = 4
    m = make_half_cylinder_tank(Lx=4.0, Ly=2.0, cx=2.0, a=0.5,
                                n_theta=64, nz=1, dr_max=0.25,
                                grading=1.4, geom_order=p)
    sp = H1Space(m, p)
    surf = SurfaceSpace(sp, attr=2)
    X = np.asarray(surf.node_coords)
    field = np.hypot(X[:, 0] - 2.0, X[:, 1])   # sentinel: node radius

    th, vals = extract_rim(X, 2.0, 0.0, 0.5, 1e-9, field)
    # exact ring: every kept node sits on r=a to roundoff, angles unique,
    # full half-circle arc at p nodes per angular element
    assert len(th) == p * 64 + 1
    assert np.max(np.abs(vals - 0.5)) < 1e-9
    assert np.all(np.diff(th) > 0)
    assert abs(th[0]) < 1e-12 and abs(th[-1] - np.pi) < 1e-12

    # the reference band DOES select off-rim nodes here (first interior
    # GLL ring ~ 2.7e-3 off the rim) — the spike mechanism is real; only
    # the tight tolerance guarantees a pure-rim trace
    r = field
    assert np.sum(np.abs(r - 0.5) <= 5e-3) >= 2 * np.sum(np.abs(r - 0.5) <= 1e-9)
