"""End-to-end free-surface wave propagation tests.

Model: the reference's dynamic-accuracy verification — run the RK4 solver
for one period on the periodic tank and require eta to return to its exact
profile (``Convergence_and_Scaling/convergence-parallel.cpp:249-281``)."""

import numpy as np
import pytest

from lpfem.configs import preset
from lpfem.problem import Problem


def test_periodic_wave_one_period():
    # pf_linear_periodic physics on a slightly finer tank so p=4 is resolved
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=4, nsteps=50,
                 cg_max_iter=1000)
    prob = Problem(cfg)
    (t, y, phi), _ = prob.run()
    assert np.isclose(float(t), prob.wave.T, rtol=1e-12)
    err = prob.eta_error_inf(y, float(t))
    # dominated by the spatial w-tilde error (~2e-3 relative on this coarse
    # tank, measured); amplitude H/2 = 2.5e-3
    assert err < 0.1 * prob.cfg.H, err


def test_periodic_wave_p_convergence():
    """p-convergence of the dynamic solver after one period
    (convergence-parallel-partial.cpp:150-305): error decays with p to the
    RK4 time-error floor."""
    errs = []
    for p in [1, 2, 3]:
        cfg = preset("pf_linear_periodic", nx=4, nz=2, order=p, nsteps=60,
                     cg_max_iter=1000)
        prob = Problem(cfg)
        (t, y, phi), _ = prob.run()
        errs.append(prob.eta_error_inf(y, float(t)))
    errs = np.array(errs)
    assert np.all(errs[1:] < errs[:-1] * 0.5), errs


def test_warm_start_solve_is_stable():
    """The carried volume potential acts as the CG initial guess (MFEM keeps
    phi across Mult calls). Note MFEM/our tolerance is *relative to the
    current solve's* initial residual, so a warm start drives the absolute
    residual further down rather than reducing iteration counts — assert
    that, plus idempotence of the re-solve."""
    import jax.numpy as jnp
    cfg = preset("pf_linear_periodic", nx=4, nz=2, order=3, nsteps=8)
    prob = Problem(cfg)
    y0, phi0 = prob.initial_state()
    pfs = y0[prob.surf.n_dofs:]
    phi1, _ = prob.fso.solve_laplace(pfs, jnp.zeros_like(phi0))
    phi2, _ = prob.fso.solve_laplace(pfs, phi1)
    # re-solve from the converged state barely moves the solution
    scale = float(jnp.max(jnp.abs(phi1)))
    assert float(jnp.max(jnp.abs(phi2 - phi1))) < 1e-10 * scale
    # absolute residual of the constrained system is at round-off
    ess = prob.fso.ess
    r = prob.op.constrained_rhs(jnp.zeros_like(phi0), ess, pfs)[0] \
        - prob.op.constrained_apply(phi2, ess)
    assert float(jnp.max(jnp.abs(r))) < 1e-12


def test_finite_tank_relaxation_smoke():
    """Short run of the flagship finite-tank configuration: wave stays
    bounded and the absorption zone keeps the outlet quiet."""
    # keep the flagship's dt = 5T/180 when shortening the run
    cfg = preset("pf_linear_par_partial", nsteps=20, t_final_periods=20 * 5 / 180,
                 order=2)
    prob = Problem(cfg)
    # start from rest: the generation zone must build the wave up
    y0, phi0 = prob.zero_state()
    (t, y, phi), _ = prob.run(n_steps=20, state=(y0, phi0))
    ns = prob.surf.n_dofs
    eta = np.asarray(y[:ns])
    assert np.all(np.isfinite(eta))
    # amplitude bounded by the target wave amplitude (with margin)
    assert np.max(np.abs(eta)) < 2.0 * prob.cfg.H
    # generation zone has begun producing a wave
    assert np.max(np.abs(eta)) > 1e-5 * prob.cfg.H


def test_rk4_nan_freeze_preserves_last_finite_state():
    """In-scan guard: a NaN mid-scan freezes the carry at the last finite
    step instead of contaminating the rest of the fused program."""
    import jax.numpy as jnp
    from lpfem.timestep import rk4_run

    def f(t, y, aux):
        dy = jnp.where(t < 0.45, -y, jnp.nan)  # NaN stage from t >= 0.45
        return dy, aux

    y0 = jnp.ones(4)
    aux0 = jnp.zeros(2)
    (t, y, aux), _, ok = rk4_run(f, y0, aux0, 0.0, 0.1, 10)
    assert not bool(ok)
    assert np.all(np.isfinite(np.asarray(y)))
    # the NaN first appears in the step 0.4 -> 0.5 (stage time 0.45):
    # the carry must hold the 4-step state
    (t4, y4, _), _, ok4 = rk4_run(f, y0, aux0, 0.0, 0.1, 4)
    assert bool(ok4)
    assert np.isclose(float(t), float(t4))
    assert np.allclose(np.asarray(y), np.asarray(y4))


def test_check_state_reports_in_scan_divergence():
    from lpfem.configs import preset
    from lpfem.problem import Problem

    prob = Problem(preset("pf_linear_periodic", order=2, nsteps=4))
    (t, y, phi), _ = prob.run(n_steps=2)
    prob.check_state(y, phi)          # healthy run passes
    prob._last_ok = np.bool_(False)   # simulate a frozen scan
    with pytest.raises(FloatingPointError):
        prob.check_state(y, phi)


def test_assembled_apply_mode_matches_pa():
    """apply_mode='assembled' runs the time loop's CG on the fully assembled
    ELL SpMV (the PF_linear_par full-assembly configuration,
    Solvers/PF_linear_par.cpp:114-120); the trajectory must match the
    matrix-free PA path to solver tolerance."""
    from lpfem.configs import preset
    from lpfem.problem import Problem

    kw = dict(nx=8, order=2, nsteps=4, cg_max_iter=800)
    pa = Problem(preset("pf_linear_par", apply_mode="fused", **kw))
    (t1, y1, _), _ = pa.run(n_steps=4)
    asm = Problem(preset("pf_linear_par", apply_mode="assembled", **kw))
    assert asm.op_solve is not None and asm.op_solve.row_nnz_max > 0
    (t2, y2, _), _ = asm.run(n_steps=4)
    err = float(np.max(np.abs(np.asarray(y1) - np.asarray(y2))))
    scale = max(float(np.max(np.abs(np.asarray(y1)))), 1e-30)
    assert err < 1e-8 * max(scale, 1e-3), (err, scale)
