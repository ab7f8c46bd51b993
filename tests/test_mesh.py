import numpy as np
import pytest

from lpfem.mesh import (
    make_cartesian3d, make_periodic, make_wave_tank, make_wave_tank_finite,
)


def test_cartesian_counts():
    m = make_cartesian3d(3, 2, 4, 1.0, 0.5, 2.0)
    assert m.n_elems == 24
    assert m.n_verts == 4 * 3 * 5
    assert len(m.bdr_quads) == 2 * (3 * 2 + 3 * 4 + 2 * 4)
    bbmin, bbmax = m.bounding_box()
    assert np.allclose(bbmin, 0) and np.allclose(bbmax, [1.0, 0.5, 2.0])


def test_wave_tank_periodic_counts():
    # the committed wave-tank.mesh: 3 hexes, 12 vertices, 14 boundary quads
    m = make_wave_tank(3, 1, 1)
    assert m.n_elems == 3
    assert m.n_verts == 12          # (3)(2)(2) after x-identification
    # committed wave-tank.mesh lists 14 incl. 2 coincident seam duplicates
    # (MFEM MakePeriodic artifact); we drop interior faces: 3 bottom + 3 top
    # + 3+3 y-sides.
    assert len(m.bdr_quads) == 12
    assert m.periodic
    assert sorted(np.unique(m.bdr_attrs)) == [1, 2, 3, 4]
    # geometry stays unwrapped: element corner x-coords span the full domain
    assert np.isclose(m.corner_coords[..., 0].max(), 1.0)


@pytest.mark.parametrize("nx,ny,nz,ne", [(32, 2, 8, 512), (64, 2, 8, 1024),
                                         (64, 2, 16, 2048), (128, 2, 16, 4096)])
def test_wave_tank_big_family(nx, ny, nz, ne):
    # weak-scaling family wave-tank-big{,2,4,8}.mesh (SURVEY.md §2c)
    m = make_wave_tank(nx, ny, nz)
    assert m.n_elems == ne
    assert m.n_verts == nx * (ny + 1) * (nz + 1)


def test_wave_tank_finite():
    m = make_wave_tank_finite()
    assert m.n_elems == 36
    assert not m.periodic
    assert sorted(np.unique(m.bdr_attrs)) == [1, 2, 3, 4, 5, 6]
    bbmin, bbmax = m.bounding_box()
    assert np.isclose(bbmax[0], 12.0)
    assert np.isclose(bbmax[2], 1 / (2 * np.pi))


def test_uniform_refine_counts():
    m = make_cartesian3d(2, 1, 1, 1, 1, 1)
    r = m.uniform_refine()
    assert r.n_elems == 16
    assert r.n_verts == 5 * 3 * 3
    assert len(r.bdr_quads) == 4 * len(m.bdr_quads)
    # attrs survive
    assert set(np.unique(r.bdr_attrs)) == set(np.unique(m.bdr_attrs))
    # total volume preserved by children geometry
    assert np.isclose(_hex_volume(r), 1.0)


def test_refine_periodic():
    m = make_wave_tank(3, 1, 1)
    r = m.uniform_refine()
    assert r.n_elems == 24
    assert r.periodic
    # periodic vertex count: 6 * 3 * 3
    assert r.n_verts == 6 * 3 * 3
    assert np.isclose(_hex_volume(r), 1.0 * 0.1 * (1 / (2 * np.pi)), rtol=1e-12)


def _hex_volume(m):
    # volume via 1-point... use geometric factors through a space
    from lpfem.space import H1Space
    from lpfem.operators import geometric_factors
    import jax.numpy as jnp
    sp = H1Space(m, 1)
    _, wdetJ, _ = geometric_factors(sp, 2)
    return float(jnp.sum(wdetJ))
