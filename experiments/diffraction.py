"""Wave-cylinder diffraction study + McCamy-Fuchs validation.

Reproduces ``Solvers/cylinder-diffraction.cpp``:
- half-domain tank with bottom-mounted cylinder (here: the self-contained
  polar mesh from :mod:`lpfem.cylmesh`; ``--gmsh`` loads an external v2.2
  mesh like the committed ``mesh_cylinder_half.msh``)
- order 4, lambda=1, kh=1, H=0.01 (``:227-253``); the reference runs RK4
  350 steps over 10T — the default here keeps dt (35 steps/period) but runs
  15T so the scattered steady state fully develops before the envelope
  period (10T leaves ~1% startup transients in the shadow)
- three relaxation zones: generation Ng=2.5, x-absorption Ns=4,
  lateral y-absorption Ns_y=3, ramp 3T (``:339-389``, ``:193-209``).
  Deviation from the reference (``--lateral zero`` restores it): the lateral
  zone relaxes toward the INCIDENT wave, not zero — damping the total field
  laterally continuously diffracts the incident wave off the zone edge and
  biases the shadow-side envelope up by ~4%; scattered-only absorption is
  the open-sea boundary the McCamy-Fuchs comparison assumes. With it the
  rim envelope lands within 2.7% mean pointwise deviation of the analytic
  series (committed data/cylinder-diffraction.txt vs cylinder_boundary.txt)
- eta envelope = nodal max over the last period, normalized by 2/H
  (``:415-444``)
- rim extraction: nodes with |r-a| <= 5e-3, theta >= 0, sorted + dedup ->
  ``data/cylinder-diffraction.txt`` (``:479-593``)

and ``Solvers/cylinder-exact.cpp``: the analytic McCamy-Fuchs envelope ->
``data/cylinder_boundary.txt``.

Usage:
  python -m experiments.diffraction --order 4 --nsteps 350
  python -m experiments.diffraction --quick          # small smoke setup
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def extract_rim(X, cx, cy, radius, tol, values):
    """Rim trace (theta, value) from surface node coords + nodal field.

    Keeps nodes with ``|r - radius| <= tol`` and ``theta >= 0``, sorted by
    theta with duplicate angles removed — the reference's extraction loop
    (``cylinder-diffraction.cpp:479-498,563-591``) minus its loose 5e-3
    band: with an exact-rim mesh (polar ring / curvature-snapped Gmsh) a
    tight ``tol`` keeps ONLY the r=a ring, excluding first-interior GLL
    nodes (~1.1e-3 off the rim at p=4) whose smaller envelope values show
    up as paired-point spikes in eta(theta).
    """
    X = np.asarray(X)
    r = np.hypot(X[:, 0] - cx, X[:, 1] - cy)
    theta = np.arctan2(X[:, 1] - cy, X[:, 0] - cx)
    keep = (np.abs(r - radius) <= tol) & (theta >= 0)
    th, vals = theta[keep], np.asarray(values)[keep]
    order_i = np.argsort(th)
    th, vals = th[order_i], vals[order_i]
    uniq = np.concatenate([[True], np.diff(th) > 1e-10])
    return th[uniq], vals[uniq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--nsteps", type=int, default=525)
    ap.add_argument("--periods", type=float, default=15.0,
                    help="the reference runs 10T/350 steps; 15T at the same "
                         "dt lets the scattered steady state fully develop "
                         "(the envelope is still the max over the LAST T)")
    ap.add_argument("--n-theta", type=int, default=96)
    ap.add_argument("--n-r", type=int, default=16,
                    help="radial layers (ignored when --dr-max is set)")
    ap.add_argument("--dr-max", type=float, default=0.25,
                    help="cap on radial layer width in wavelengths; the "
                         "far field must resolve the propagating wave "
                         "(reference half mesh: ~0.5 background spacing). "
                         "0 disables (pure geometric grading)")
    ap.add_argument("--nz", type=int, default=1)
    ap.add_argument("--gmsh", default=None, help="load a Gmsh v2.2 mesh instead")
    ap.add_argument("--Lx", type=float, default=12.0)
    ap.add_argument("--Ly", type=float, default=6.0,
                    help="half-domain width (reference half mesh: 6)")
    ap.add_argument("--cx", type=float, default=4.0)
    ap.add_argument("--cy", type=float, default=0.0,
                    help="cylinder center y (4.0 for the committed half mesh)")
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--H", type=float, default=0.01)
    ap.add_argument("--precond", default="pmg")
    ap.add_argument("--apply-mode", default="pallas",
                    help="pallas | fused | sumfact")
    ap.add_argument("--cheb-degree", type=int, default=3)
    ap.add_argument("--rim-tol", type=float, default=1e-9,
                    help="|r-a| tolerance for rim-node extraction. The polar "
                         "mesh's innermost ring (and a curvature-snapped "
                         "Gmsh rim) sits on r=a to roundoff, so the default "
                         "keeps EXACTLY the rim ring; the reference's loose "
                         "5e-3 band (cylinder-diffraction.cpp:483) also "
                         "catches first-interior GLL nodes (~1.1e-3 off the "
                         "rim at p=4), which shows up as paired-point "
                         "spikes in eta(theta)")
    ap.add_argument("--lateral", choices=["incident", "zero"], default="incident",
                    help="lateral-zone relaxation target. 'zero' damps the "
                         "TOTAL field like the reference (cylinder-"
                         "diffraction.cpp:208-209), which continuously "
                         "diffracts the incident wave off the zone edge and "
                         "biases the shadow envelope up; 'incident' damps "
                         "only the scattered field (open-sea boundary)")
    ap.add_argument("--chunk", type=int, default=25,
                    help="steps per dispatched program (the device watchdog "
                         "kills single programs running >~5 min)")
    ap.add_argument("--shard", type=int, default=0,
                    help="run the time loop through the n-device sharded "
                         "runner with the per-step record hook — the "
                         "reference's MPI form incl. the rim gather "
                         "(cylinder-diffraction.cpp:537-560); the envelope "
                         "must match the single-device run to round-off")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--rtol-sq", type=float, default=None,
                    help="CG tolerance on r.z; default 1e-24 (f64) / 1e-10 (f32)")
    ap.add_argument("--out", default="data/cylinder-diffraction.txt")
    ap.add_argument("--out-exact", default="data/cylinder_boundary.txt")
    args = ap.parse_args()
    if args.quick:
        # small smoke setup; explicit flags still win
        args.order = 2 if args.order == 4 else args.order
        args.nsteps = 60 if args.nsteps == 525 else args.nsteps
        args.periods = 3.0 if args.periods == 15.0 else args.periods
        args.n_theta, args.n_r, args.dr_max = 12, 6, 0.0
    if args.rtol_sq is None:
        args.rtol_sq = 1e-24 if args.dtype == "float64" else 1e-10
    # absolute residual floor: the envelope physics needs ||r|| ~ 1e-8 of the
    # O(1e-2) BC scale; without it warm-started stages chase 2000 iterations
    atol_sq = 0.0 if args.dtype == "float64" else 1e-20

    import jax
    from lpfem.analytic import mccamy_fuchs_envelope
    from lpfem.cylmesh import make_half_cylinder_tank
    from lpfem.mesh import load_gmsh
    from lpfem.configs import Config
    from lpfem.problem import Problem
    from lpfem.surface import RelaxationZones, cabs_weight, cgen_weight
    from lpfem.io import DataFile

    h = 1.0 / (2.0 * np.pi)
    if args.gmsh:
        from lpfem.mesh import cylinder_projector, set_curvature
        mesh = load_gmsh(args.gmsh)
        # SetCurvature(order) + exact-rim snap of the cylinder wall (attr 3),
        # cylinder-diffraction.cpp:259-264
        set_curvature(mesh, args.order,
                      {3: cylinder_projector(args.cx, args.cy, args.radius)})
    else:
        mesh = make_half_cylinder_tank(Lx=args.Lx, Ly=args.Ly, h=h, cx=args.cx,
                                       a=args.radius, n_theta=args.n_theta,
                                       n_r=args.n_r, nz=args.nz,
                                       geom_order=args.order,
                                       grading=1.4 if args.dr_max else 1.25,
                                       dr_max=args.dr_max or None)

    cfg = Config(name="cylinder_diffraction", order=args.order, H=args.H,
                 wave_by="wavelength", wave_lambda=1.0, kh_override=1.0,
                 nsteps=args.nsteps, t_final_periods=args.periods,
                 cg_rtol_sq=args.rtol_sq, cg_atol_sq=atol_sq,
                 cg_max_iter=600, dtype=args.dtype, apply_mode=args.apply_mode,
                 precond=args.precond, cheb_degree=args.cheb_degree)
    prob = Problem(cfg, mesh=mesh)
    wave = prob.wave
    lam = wave.wavelength

    # three relaxation zones (cylinder-diffraction.cpp:339-389)
    bbmin, bbmax = mesh.bounding_box()
    X = prob.surf.node_coords
    cgen = cgen_weight(X[:, 0], float(bbmin[0]), float(bbmin[0]) + 2.5 * lam)
    cabs = cabs_weight(X[:, 0], float(bbmax[0]) - 4.0 * lam, float(bbmax[0]))
    cabsy = cabs_weight(X[:, 1], float(bbmax[1]) - 3.0 * lam, float(bbmax[1]))
    if args.lateral == "incident":
        # lateral open-sea boundary: relax toward the incident Airy wave so
        # only the scattered field is absorbed; the incident wave passes the
        # zone undisturbed (the gen-group target is exactly that wave)
        gen_w, abs_w = cgen + cabsy, cabs
    else:
        gen_w, abs_w = cgen, cabs + cabsy
    prob.relax = RelaxationZones.build(prob.surf, wave, tau=prob.dt,
                                       cgen=gen_w, cabs=abs_w,
                                       n_ramp=3.0, dtype=prob.dtype)
    prob.fso.relax = prob.relax

    print(f"mesh: {mesh.n_elems} hexes; dofs vol={prob.space.n_dofs} "
          f"surf={prob.surf.n_dofs}; T={wave.T:.4f} dt={prob.dt:.4f}")

    y0, phi0 = prob.initial_state()
    ns = prob.surf.n_dofs
    record = lambda t, y, aux: (t, y[:ns])

    sprob = None
    if args.shard:
        from lpfem.shard import ShardedProblem, make_device_mesh
        sprob = ShardedProblem(prob, mesh=make_device_mesh(args.shard))

    # Chunked execution: one multi-minute XLA program trips the device
    # watchdog; ~50-step chunks keep each dispatch short and give progress.
    chunk = args.chunk
    t0_wall = time.perf_counter()
    t, y, phi = 0.0, y0, phi0
    ts_all, etas_all = [], []
    done = 0
    while done < args.nsteps:
        n = min(chunk, args.nsteps - done)
        if sprob is not None:
            (t, y, phi), (ts, etas) = sprob.run(n_steps=n, t0=t,
                                                state=(y, phi), record=record)
            prob._last_ok = sprob._last_ok
        else:
            (t, y, phi), (ts, etas) = prob.run(n_steps=n, t0=t, state=(y, phi),
                                               record=record)
        jax.block_until_ready(etas)
        t = float(t)
        done += n
        prob.check_state(y, np.asarray(phi))   # failure detection
        ts_all.append(np.asarray(ts))
        etas_all.append(np.asarray(etas))
        print(f"step {done}/{args.nsteps} t={t:.3f} "
              f"max|eta|={float(np.max(np.abs(etas_all[-1]))):.4f} "
              f"[{time.perf_counter() - t0_wall:.0f}s]")
    print(f"run: {time.perf_counter() - t0_wall:.1f}s  t_final={t:.3f}")

    # envelope: nodal max over the last period (cylinder-diffraction.cpp:415-429)
    ts = np.concatenate(ts_all)
    etas = np.concatenate(etas_all)
    t_last_start = float(t) - wave.T
    sel = ts >= t_last_start - 1e-12
    env = np.max(etas[sel], axis=0) * (2.0 / args.H)

    # rim extraction (":479-498") + dedup (":585-591")
    th, vals = extract_rim(X, args.cx, args.cy, args.radius, args.rim_tol, env)

    # fresh file per run (the rim table is a result set, not an append log)
    if os.path.exists(args.out):
        os.remove(args.out)
    df = DataFile(args.out, "theta(rad) eta")
    for a_, v_ in zip(th, vals):
        df.append(a_, v_)
    print(f"extracted {len(th)} rim points -> {args.out}")

    # ParaView envelope snapshot (cylinder-diffraction.cpp:729-743)
    from lpfem.io import write_vtu_surface
    os.makedirs("ParaView", exist_ok=True)
    write_vtu_surface("ParaView/cylinder_envelope.vtu", prob.surf,
                      {"eta_env": env, "eta_final": np.asarray(y[:ns])})
    print("wrote ParaView/cylinder_envelope.vtu")

    # analytic companion (cylinder-exact.cpp)
    ka = wave.k * args.radius
    th_e = np.linspace(0, np.pi, 181)
    env_e = mccamy_fuchs_envelope(th_e, ka)
    with open(args.out_exact, "w") as f:
        f.write("# theta(rad)  eta\n")
        for a_, v_ in zip(th_e, env_e):
            f.write(f"{a_} {v_}\n")

    # quantitative comparison: pointwise relative (the strict metric) and
    # normalized by the envelope maximum (~2, the run-up) for context
    ref = np.interp(th, th_e, env_e)
    rel_pw = np.abs(vals - ref) / np.abs(ref)
    rel_nm = np.abs(vals - ref) / np.max(np.abs(ref))
    print(f"rim envelope vs McCamy-Fuchs: pointwise rel dev "
          f"mean {np.mean(rel_pw):.3f} / max {np.max(rel_pw):.3f}; "
          f"normalized-by-max mean {np.mean(rel_nm):.3f} / "
          f"max {np.max(rel_nm):.3f}")


if __name__ == "__main__":
    main()
