import numpy as np
import pytest

from lpfem.mesh import make_cartesian3d, make_wave_tank
from lpfem.space import H1Space, SurfaceSpace


@pytest.mark.parametrize("p", [1, 2, 3, 5])
def test_dof_count_box(p):
    nx, ny, nz = 3, 2, 2
    m = make_cartesian3d(nx, ny, nz, 1, 1, 1)
    sp = H1Space(m, p)
    assert sp.n_dofs == (nx * p + 1) * (ny * p + 1) * (nz * p + 1)
    assert sp.elem_dofs.shape == (m.n_elems, (p + 1) ** 3)
    assert sp.elem_dofs.min() == 0 and sp.elem_dofs.max() == sp.n_dofs - 1


@pytest.mark.parametrize("p", [1, 2, 4])
def test_dof_count_periodic(p):
    nx, ny, nz = 4, 2, 2
    m = make_wave_tank(nx, ny, nz)
    sp = H1Space(m, p)
    assert sp.n_dofs == (nx * p) * (ny * p + 1) * (nz * p + 1)


@pytest.mark.parametrize("p", [2, 3, 4])
def test_shared_dofs_have_identical_coords(p):
    """The orientation canonicalization: a dof shared between elements must
    map to the same physical point from every element, and distinct dofs to
    distinct points."""
    m = make_cartesian3d(2, 2, 2, 1.0, 0.8, 0.6)
    sp = H1Space(m, p)
    X = sp.elem_node_coords.reshape(-1, 3)
    ids = sp.elem_dofs.ravel()
    coords = {}
    for i, d in enumerate(ids):
        if d in coords:
            assert np.allclose(coords[d], X[i], atol=1e-12), f"dof {d} mismatch"
        else:
            coords[d] = X[i]
    # distinct dofs -> distinct coords
    pts = np.array([coords[d] for d in sorted(coords)])
    _, cnt = np.unique(np.round(pts / 1e-9).astype(np.int64), axis=0, return_counts=True)
    assert cnt.max() == 1


@pytest.mark.parametrize("p", [2, 4])
def test_shared_dofs_periodic_coords(p):
    m = make_wave_tank(4, 1, 2, Lx=1.0)
    sp = H1Space(m, p)
    X = sp.elem_node_coords.reshape(-1, 3)
    # wrap x for comparison
    Xw = X.copy()
    Xw[:, 0] = np.mod(Xw[:, 0] + 1e-12, 1.0)
    ids = sp.elem_dofs.ravel()
    coords = {}
    for i, d in enumerate(ids):
        if d in coords:
            assert np.allclose(coords[d], Xw[i], atol=1e-9), f"dof {d} mismatch"
        else:
            coords[d] = Xw[i]


def test_boundary_dofs_box():
    p = 3
    nx, ny, nz = 3, 2, 2
    m = make_cartesian3d(nx, ny, nz, 1, 1, 1)
    sp = H1Space(m, p)
    top = sp.boundary_dofs(6)   # attr 6 = z-max for raw cartesian
    assert len(top) == (nx * p + 1) * (ny * p + 1)
    X = sp.node_coords[top]
    assert np.allclose(X[:, 2], 1.0)


def test_surface_space_tank():
    p = 3
    m = make_wave_tank(4, 2, 2)
    sp = H1Space(m, p)
    surf = SurfaceSpace(sp, attr=2)
    assert surf.n_elems == 4 * 2
    assert surf.n_dofs == (4 * p) * (2 * p + 1)  # x-periodic surface grid
    # all mapped volume dofs on z = zmax
    zmax = m.bounding_box()[1][2]
    assert np.allclose(surf.node_coords[:, 2], zmax)
    # injective map
    assert len(np.unique(surf.surf_to_vol)) == surf.n_dofs
    # surface dofs == volume boundary dofs of attr 2
    vol_bdofs = sp.boundary_dofs(2)
    assert set(surf.surf_to_vol.tolist()) == set(vol_bdofs.tolist())


def test_project_roundtrip():
    m = make_cartesian3d(2, 2, 2, 1, 1, 1)
    sp = H1Space(m, 3)
    f = lambda x, y, z: 1.0 + 2 * x + 3 * y * z
    u = sp.project(f)
    X = sp.node_coords
    assert np.allclose(u, f(X[:, 0], X[:, 1], X[:, 2]))


def test_extruded_renumber_column_apply():
    """Meshes without a declared lattice but built as a 2D-mesh z-extrusion
    (every imported Gmsh tank, reference cylinder-diffraction.cpp:225) get
    column dof numbering + the ColumnLattice E-vector fast path; the
    operator must match the lattice-path operator exactly."""
    import jax.numpy as jnp
    from lpfem.cylmesh import make_half_cylinder_tank
    from lpfem.mesh import Mesh
    from lpfem.operators import LaplacePA

    m = make_half_cylinder_tank(n_theta=10, n_r=5, nz=2, geom_order=2)
    m2 = Mesh(m.verts, m.elems, m.corner_coords, m.bdr_quads, m.bdr_attrs,
              m.periodic, m.geom_nodes, m.geom_order,
              periodic_axes=m.periodic_axes)   # lattice stripped
    spl = H1Space(m, 3)
    spe = H1Space(m2, 3)
    assert spl.struct is not None and spe.extruded is not None

    opl, ope = LaplacePA(spl), LaplacePA(spe)
    assert ope.column is not None

    f = lambda X: np.sin(X[:, 0]) * np.cos(2 * X[:, 1]) + X[:, 2] ** 2
    yl = np.asarray(opl.apply(jnp.asarray(f(spl.node_coords))))
    ye = np.asarray(ope.apply(jnp.asarray(f(spe.node_coords))))
    key = {tuple(np.round(c, 9)): i for i, c in enumerate(spl.node_coords)}
    perm = np.array([key[tuple(np.round(c, 9))] for c in spe.node_coords])
    assert np.max(np.abs(ye - yl[perm])) < 1e-11

    # gather/scatter adjointness
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(spe.n_dofs))
    w = jnp.asarray(rng.standard_normal((ope.column.ne, 4 ** 3)))
    a = float(jnp.vdot(ope.column.gather(u), w))
    b = float(jnp.vdot(u, ope.column.scatter(w)))
    assert np.isclose(a, b, rtol=1e-12)
