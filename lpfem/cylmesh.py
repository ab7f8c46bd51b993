"""Half-cylinder diffraction tank mesh generator (host, NumPy).

Self-contained replacement for the reference's Gmsh meshes
(``Meshes/mesh_cylinder.geo``, ``mesh_cylinder_exact.geo``,
``mesh_cylinder_half.msh``): a bottom-mounted circular cylinder on the
symmetry plane of a half-domain wave tank, meshed as a single polar block —
rays from the cylinder center to the outer rectangle, geometrically graded
in radius (natural near-cylinder refinement, mirroring the Gmsh distance
threshold field ``mesh_cylinder.geo:52-63``) — extruded in z.

Boundary attributes follow ``mesh_cylinder_exact.geo:30-38``:
top (free surface) = 2, cylinder wall = 3, all other walls/bottom/symmetry
plane = 1 (natural zero-Neumann, so their exact attr is inert; the lateral
absorber zone is driven by y-coordinates, not attrs).

The gmsh import path (``lpfem.mesh.load_gmsh``) remains available for
externally generated meshes like the committed ``mesh_cylinder_half.msh``.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

__all__ = ["make_half_cylinder_tank"]


def _ray_boundary_hit(c, d, Lx, y1):
    """Distance from c along unit direction d to the rectangle boundary
    [0,Lx] x [c_y, y1] (c sits on the bottom edge y = c_y)."""
    ts = []
    if d[0] > 1e-14:
        ts.append((Lx - c[0]) / d[0])
    if d[0] < -1e-14:
        ts.append((0.0 - c[0]) / d[0])
    if d[1] > 1e-14:
        ts.append((y1 - c[1]) / d[1])
    return min(t for t in ts if t > 0)


def make_half_cylinder_tank(Lx: float = 12.0, Ly: float = 6.0,
                            h: float = 1.0 / (2 * np.pi),
                            cx: float = 4.0, a: float = 0.5,
                            n_theta: int = 24, n_r: int = 12, nz: int = 2,
                            grading: float = 1.25) -> Mesh:
    """Polar-block half-cylinder tank.

    Domain: [0,Lx] x [0,Ly] x [0,h] minus the half-disk of radius ``a``
    centered at (cx, 0) (the symmetry plane is y=0). ``grading`` > 1 packs
    radial layers toward the cylinder.
    """
    c = np.array([cx, 0.0])
    thetas = np.linspace(0.0, np.pi, n_theta + 1)
    # radial fractions with geometric grading (fine near the cylinder)
    w = grading ** np.arange(n_r)
    frac = np.concatenate([[0.0], np.cumsum(w)]) / np.sum(w)

    # 2D node grid [n_theta+1, n_r+1, 2]
    pts = np.zeros((n_theta + 1, n_r + 1, 2))
    for i, th in enumerate(thetas):
        d = np.array([np.cos(th), np.sin(th)])
        t_out = _ray_boundary_hit(c, d, Lx, Ly)
        p0 = c + a * d
        p1 = c + t_out * d
        for j, f in enumerate(frac):
            pts[i, j] = p0 + f * (p1 - p0)

    # 2D vertex ids
    def vid2(i, j):
        return i * (n_r + 1) + j

    nv2 = (n_theta + 1) * (n_r + 1)
    verts2 = pts.reshape(-1, 2)

    # z levels
    zs = np.linspace(0.0, h, nz + 1)
    verts = np.zeros((nv2 * (nz + 1), 3))
    for k, z in enumerate(zs):
        verts[k * nv2:(k + 1) * nv2, :2] = verts2
        verts[k * nv2:(k + 1) * nv2, 2] = z

    def vid(i, j, k):
        return k * nv2 + vid2(i, j)

    # hexes: quad (i,j) x layer k. 2D quad cycle (ccw in x-y):
    # (i,j) -> (i,j+1) -> (i+1,j+1) -> (i+1,j) has positive orientation since
    # theta increases ccw and r outward: check below and fix orientation.
    elems = []
    for i in range(n_theta):
        for j in range(n_r):
            q = [vid2(i, j), vid2(i, j + 1), vid2(i + 1, j + 1), vid2(i + 1, j)]
            # ensure ccw (positive z-normal)
            p = verts2[q]
            area = 0.0
            for m in range(4):
                x0, y0 = p[m]
                x1, y1 = p[(m + 1) % 4]
                area += x0 * y1 - x1 * y0
            if area < 0:
                q = q[::-1]
            for k in range(nz):
                elems.append([q[0] + k * nv2, q[1] + k * nv2,
                              q[2] + k * nv2, q[3] + k * nv2,
                              q[0] + (k + 1) * nv2, q[1] + (k + 1) * nv2,
                              q[2] + (k + 1) * nv2, q[3] + (k + 1) * nv2])
    elems = np.asarray(elems, dtype=np.int64)

    # boundary quads: top z=h -> 2, cylinder r=a -> 3, rest -> 1
    bq, ba = [], []
    for i in range(n_theta):
        for j in range(n_r):
            pass
    # top/bottom faces per 2D quad
    for i in range(n_theta):
        for j in range(n_r):
            q = [vid2(i, j), vid2(i, j + 1), vid2(i + 1, j + 1), vid2(i + 1, j)]
            bq.append([v + nz * nv2 for v in q])
            ba.append(2)                      # free surface
            bq.append(list(q))
            ba.append(1)                      # bottom
    # cylinder wall: j = 0 ring
    for i in range(n_theta):
        for k in range(nz):
            bq.append([vid(i, 0, k), vid(i + 1, 0, k),
                       vid(i + 1, 0, k + 1), vid(i, 0, k + 1)])
            ba.append(3)
    # outer boundary: j = n_r ring (tank walls)
    for i in range(n_theta):
        for k in range(nz):
            bq.append([vid(i, n_r, k), vid(i + 1, n_r, k),
                       vid(i + 1, n_r, k + 1), vid(i, n_r, k + 1)])
            ba.append(1)
    # symmetry plane segments: theta = 0 and theta = pi rows (y = 0)
    for j in range(n_r):
        for k in range(nz):
            bq.append([vid(0, j, k), vid(0, j + 1, k),
                       vid(0, j + 1, k + 1), vid(0, j, k + 1)])
            ba.append(1)
            bq.append([vid(n_theta, j, k), vid(n_theta, j + 1, k),
                       vid(n_theta, j + 1, k + 1), vid(n_theta, j, k + 1)])
            ba.append(1)

    return Mesh(verts=verts, elems=elems, corner_coords=verts[elems],
                bdr_quads=np.asarray(bq, dtype=np.int64),
                bdr_attrs=np.asarray(ba, dtype=np.int64))
