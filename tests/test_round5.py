"""Round-5 regression tests: solver telemetry, rotated-import renumber
fallback, config-threaded IR knobs (VERDICT.md round-4 items 4 and 7)."""

import numpy as np
import pytest

from lpfem.configs import preset
from lpfem.problem import Problem


def test_solver_stats_reported_on_converged_run():
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=3, nsteps=5)
    prob = Problem(cfg)
    (t, y, phi), _ = prob.run()
    stats = prob.last_solver_stats
    assert int(stats.max_iters) > 0
    assert not bool(stats.unconverged)


def test_under_iterated_solve_is_reported():
    """A max_iter-starved CG must surface as unconverged telemetry + a
    RuntimeWarning — the analogue of MFEM CGSolver printing
    'No convergence!' (``Solvers/laplace_solver.cpp:113`` path), which a
    fused scan would otherwise swallow silently."""
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=3, nsteps=2,
                 cg_max_iter=2, cg_rtol_sq=1e-24)
    prob = Problem(cfg)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        (t, y, phi), _ = prob.run()
    assert bool(prob.last_solver_stats.unconverged)
    assert int(prob.last_solver_stats.max_iters) == 2


def test_solve_laplace_reports_solveinfo():
    import jax.numpy as jnp
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=2, nsteps=2)
    prob = Problem(cfg)
    y0, phi0 = prob.initial_state()
    pfs = y0[prob.surf.n_dofs:]
    phi, info = prob.fso.solve_laplace(pfs, jnp.zeros_like(phi0))
    assert bool(info.converged)
    assert float(info.rz) <= float(info.rz0) * prob.cfg.cg_rtol_sq


def test_sharded_run_reports_stats():
    from lpfem.shard import ShardedProblem, make_device_mesh
    cfg = preset("pf_linear_periodic", nx=4, ny=2, nz=2, order=2, nsteps=3)
    prob = Problem(cfg, build_precond=False)
    sprob = ShardedProblem(prob, mesh=make_device_mesh(2))
    sprob.run(n_steps=3)
    assert int(sprob.last_solver_stats.max_iters) > 0
    assert not bool(sprob.last_solver_stats.unconverged)


def test_ir_knobs_thread_from_config():
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=2, nsteps=2,
                 dtype="mixed", ir_max_outer=7, ir_inner_rtol_sq=1e-6)
    prob = Problem(cfg)
    assert prob.fso.ir_max_outer == 7
    assert prob.fso.ir_inner_rtol_sq == 1e-6


def test_rotated_cartesian_import_falls_back_to_unstructured():
    """A lattice mesh whose element connectivity is rotated (lattice
    centroids, non-lattice local axes) must keep the unstructured numbering
    instead of crashing (round-4 VERDICT weak item 5) — and still produce
    the correct operator."""
    from lpfem.mesh import Mesh, make_wave_tank_finite
    from lpfem.space import H1Space

    m = make_wave_tank_finite(2, 2, 2, 1.0, 1.0, 0.5)
    # rotate element 0's vertex list by a quarter turn about z:
    # (0,1,2,3|4,5,6,7) -> (1,2,3,0|5,6,7,4) keeps a valid hex with the
    # same vertex set but a rotated local frame
    elems = m.elems.copy()
    rot = [1, 2, 3, 0, 5, 6, 7, 4]
    elems[0] = elems[0][rot]
    cc = m.corner_coords.copy()
    cc[0] = cc[0][rot]
    m2 = Mesh(m.verts, elems, cc, m.bdr_quads, m.bdr_attrs, m.periodic,
              m.geom_nodes, m.geom_order, periodic_axes=m.periodic_axes)
    sp2 = H1Space(m2, 2)     # must not raise
    assert sp2.struct is None

    # the operator on the rotated-connectivity mesh matches the reference
    # numbering's spectrum (same mesh, same bilinear form)
    from lpfem.operators import LaplacePA
    sp1 = H1Space(m, 2)
    A1 = LaplacePA(sp1, mode="sumfact").assemble_scipy()
    A2 = LaplacePA(sp2, mode="sumfact").assemble_scipy()
    e1 = np.sort(np.linalg.eigvalsh(A1.toarray()))
    e2 = np.sort(np.linalg.eigvalsh(A2.toarray()))
    assert np.allclose(e1, e2, rtol=1e-9, atol=1e-12)


def test_max_error_quad_semantics():
    """SurfaceSpace.max_error_quad = MFEM ComputeMaxError over element
    integration points (convergence-parallel.cpp:269-271): exact for
    degree<=p data, strictly >= the nodal max for interpolated data (GLL
    nodes interpolate, quadrature points expose the interelement error)."""
    from lpfem.mesh import make_wave_tank_finite
    from lpfem.space import H1Space, SurfaceSpace

    m = make_wave_tank_finite(4, 2, 2, 2.0, 1.0, 1.0)
    sp = H1Space(m, 3)
    surf = SurfaceSpace(sp, attr=2)

    poly = lambda x, y, z: 1.0 + x + x * y + x ** 3 - 2.0 * y ** 2
    vals = surf.project(poly)
    assert surf.max_error_quad(vals, poly) < 1e-12

    wave = lambda x, y, z: np.sin(2.0 * np.pi * x) * np.cos(np.pi * y)
    vals = surf.project(wave)
    e_quad = surf.max_error_quad(vals, wave)
    e_nodal = float(np.max(np.abs(vals - surf.project(wave))))
    assert e_nodal == 0.0            # projection interpolates at the nodes
    assert 1e-6 < e_quad < 1e-1      # the literal metric sees the gap


def test_parallel_glvis_handshake():
    """The reference's parallel programs stream 'parallel <np> <rank>'
    pieces over one socket per rank (laplace_solver_parallel.cpp:166-172);
    pieces must carry the handshake and tile the full visualization mesh."""
    import socket
    import threading
    from lpfem.glvis import GLVisStream, parallel_solution_text
    from lpfem.io import surface_cells
    from lpfem.mesh import make_wave_tank_finite
    from lpfem.space import H1Space, SurfaceSpace

    m = make_wave_tank_finite(5, 2, 1)
    sp = H1Space(m, 2)
    surf = SurfaceSpace(sp, attr=2)
    u = sp.project(lambda x, y, z: x * y + z)[surf.surf_to_vol]

    nranks = 3
    pts_full, conn_full = surface_cells(surf)
    tot_cells = tot_pts = 0
    for r in range(nranks):
        txt = parallel_solution_text(surf, u, nranks, r, keys="Rj")
        assert txt.startswith(f"parallel {nranks} {r}\nsolution\n")
        assert ("keys Rj" in txt) == (r == 0)
        ncell = int(txt.split("elements\n")[1].split("\n")[0])
        npts = int(txt.split("vertices\n")[1].split("\n")[0])
        tot_cells += ncell
        tot_pts += npts
    assert tot_cells == conn_full.shape[0]
    assert tot_pts == pts_full.shape[0]

    # one connection per rank against a local sink
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(nranks)
    port = srv.getsockname()[1]
    received = []

    def sink():
        conns = [srv.accept()[0] for _ in range(nranks)]
        for c in conns:
            buf = b""
            while chunk := c.recv(1 << 16):
                buf += chunk
            received.append(buf.decode())
            c.close()

    th = threading.Thread(target=sink, daemon=True)
    th.start()
    vis = GLVisStream("127.0.0.1", port)
    assert vis.send_parallel(surf, u, nranks)
    vis.close()
    th.join(timeout=5)
    srv.close()
    heads = sorted(r.split("\n")[0] for r in received)
    assert heads == sorted(f"parallel {nranks} {r}" for r in range(nranks))


def test_max_error_quad_periodic_seam():
    """The periodic wrap elements read the identified seam node from the
    far side of the domain; max_error_quad must unwrap per element (true
    corner extent) or the interpolated geometry sweeps the whole period."""
    from lpfem.mesh import make_wave_tank
    from lpfem.space import H1Space, SurfaceSpace

    m = make_wave_tank(8, 2, 4, 1.0, 0.25, 0.5)
    sp = H1Space(m, 4)
    surf = SurfaceSpace(sp, attr=2)
    fn = lambda x, y, z: np.sin(2.0 * np.pi * x)
    err = surf.max_error_quad(surf.project(fn), fn)
    assert err < 1e-4, err       # spectral: broken wrap handling gives ~1.0
