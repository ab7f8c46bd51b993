"""Double-single (two-f32) arithmetic and the DS separable apply: the
accuracy contract that lets `pcg_ir` replace its emulated-f64 outer
operator (VERDICT round-4 item 1: DS apply must match f64 to <= 1e-13
relative)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpfem.ds import (DS, SeparableDS, ds_add_f32, ds_dot_hi, ds_from_f64,
                      ds_sub, ds_to_f64, split, two_prod_presplit, two_sum)


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-5, jnp.float32)
    s, e = two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    ah, al = split(a)
    bh, bl = split(b)
    p, e = two_prod_presplit(a, b, ah, al, bh, bl)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))


def test_ds_roundtrip_and_vector_ops():
    rng = np.random.default_rng(2)
    x64 = jnp.asarray(rng.standard_normal(4096), jnp.float64)
    y64 = jnp.asarray(rng.standard_normal(4096), jnp.float64)
    x = ds_from_f64(x64)
    # a DS pair carries ~49 mantissa bits, not 53: roundtrip to ~2^-49
    assert float(jnp.max(jnp.abs(ds_to_f64(x) - x64))) <= 2.0 ** -48
    d = ds_sub(x, ds_from_f64(y64))
    err = np.asarray(jnp.abs(ds_to_f64(d) - (x64 - y64)))
    assert err.max() < 1e-13
    e32 = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    u = ds_add_f32(x, e32)
    want = x64 + e32.astype(jnp.float64)
    err = np.asarray(jnp.abs(ds_to_f64(u) - want))
    # exact up to the DS representation floor (~2^-48 of the result)
    assert err.max() <= 2.0 ** -47 * np.abs(np.asarray(want)).max()


def _sep_problem(nx=6, ny=3, nz=4, order=3, periodic=True):
    from lpfem.configs import preset
    from lpfem.problem import Problem
    name = "pf_linear_periodic" if periodic else "pf_linear_serial"
    cfg = preset(name, nx=nx, ny=ny, nz=nz, order=order, nsteps=2)
    return Problem(cfg)


@pytest.mark.parametrize("periodic", [True, False])
def test_ds_separable_apply_matches_f64(periodic):
    prob = _sep_problem(periodic=periodic)
    sep = prob.op.sep
    assert sep is not None
    # f64 separable operator (build from the f64 twin of the op)
    from lpfem.operators import SeparableLattice
    sep64 = SeparableLattice.build(prob.space, prob.op.q, jnp.float64)
    rng = np.random.default_rng(3)
    x64 = jnp.asarray(rng.standard_normal(prob.space.n_dofs), jnp.float64)
    y64 = sep64.apply(x64)

    ds_op = SeparableDS(sep64)
    yds = ds_to_f64(ds_op.apply(ds_from_f64(x64)))
    rel = float(jnp.linalg.norm(yds - y64) / jnp.linalg.norm(y64))
    assert rel < 1e-13, rel


def test_ds_constrained_apply_top_matches_f64():
    prob = _sep_problem(periodic=True)
    from lpfem.operators import SeparableLattice
    sep64 = SeparableLattice.build(prob.space, prob.op.q, jnp.float64)
    rng = np.random.default_rng(4)
    x64 = jnp.asarray(rng.standard_normal(prob.space.n_dofs), jnp.float64)
    y64 = sep64.constrained_apply_top(x64)
    ds_op = SeparableDS(sep64)
    yds = ds_to_f64(ds_op.constrained_apply_top(ds_from_f64(x64)))
    rel = float(jnp.linalg.norm(yds - y64) / jnp.linalg.norm(y64))
    assert rel < 1e-13, rel


def test_ds_dot_hi_reasonable():
    rng = np.random.default_rng(5)
    x64 = jnp.asarray(rng.standard_normal(10000), jnp.float64)
    d = ds_from_f64(x64)
    got = float(ds_dot_hi(d, d))
    want = float(jnp.dot(x64, x64))
    assert abs(got - want) / want < 1e-5


def test_mixed_ds_solve_matches_f64_outer():
    """End-to-end: the DS-outer mixed solve (pcg_ir_ds) must reproduce the
    emulated-f64-outer trajectory — same fixed point, same tolerance
    semantics (``Convergence_and_Scaling/ss.cpp:90-93``)."""
    from lpfem.configs import preset
    from lpfem.problem import Problem
    from lpfem.ds import DS, ds_to_f64

    kw = dict(nx=4, nz=2, order=3, nsteps=4, dtype="mixed")
    p64 = Problem(preset("pf_linear_periodic", hi_apply="f64", **kw))
    pds = Problem(preset("pf_linear_periodic", hi_apply="ds", **kw))
    assert pds.fso._ds_op is not None
    (t1, y1, phi1), _ = p64.run()
    (t2, y2, phi2), _ = pds.run()
    assert isinstance(phi2, DS)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-10
    assert float(jnp.max(jnp.abs(phi1 - ds_to_f64(phi2)))) < 1e-9
    assert not bool(pds.last_solver_stats.unconverged)

    # chunked resume threads the DS carry bit-identically
    (ta, ya, pa), _ = pds.run(n_steps=2)
    (tb, yb, pb), _ = pds.run(n_steps=2, t0=float(ta), state=(ya, pa))
    assert float(jnp.max(jnp.abs(yb - y2))) == 0.0


def test_hi_apply_auto_gates_on_tolerance_and_platform():
    """'auto' engages DS only when (a) the requested tolerance is within
    the ~49-bit DS residual floor — the rz0*1e-24 protocols
    (``strongscaling.cpp:87``) keep the f64 outer — and (b) f64 is
    emulated on the backend (TPU). On this CPU test backend native f64 is
    ~25x faster than DS arithmetic, so 'auto' must keep the f64 outer at
    EVERY tolerance; 'ds' still forces the DS path (how the DS tests run
    off-chip)."""
    import jax

    from lpfem.configs import preset
    from lpfem.problem import Problem

    assert jax.devices()[0].platform == "cpu"
    kw = dict(nx=4, nz=2, order=2, nsteps=2, dtype="mixed")
    tight = Problem(preset("pf_linear_periodic", cg_rtol_sq=1e-24, **kw))
    assert tight.fso._ds_op is None
    faithful = Problem(preset("pf_linear_periodic", cg_rtol_sq=1e-16, **kw))
    assert faithful.fso._ds_op is None      # cpu: native f64 wins
    forced = Problem(preset("pf_linear_periodic", cg_rtol_sq=1e-16,
                            hi_apply="ds", **kw))
    assert forced.fso._ds_op is not None
    forced_tight = Problem(preset("pf_linear_periodic", cg_rtol_sq=1e-24,
                                  hi_apply="ds", **kw))
    assert forced_tight.fso._ds_op is not None


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("ess_top", [False, True])
def test_ds_pallas_kernel_structure_matches_f64(periodic, ess_top):
    """The Pallas DS sep kernel (interpret mode, f64 streams) must
    reproduce the f64 assembled separable operator to 1e-13: this pins
    every structural element — window blocking, shared-plane carry fold,
    coefficient tables, the top-plane constraint. The f32 EFT arithmetic
    itself cannot be validated through XLA:CPU (its fusion pass duplicates
    multiplies into consumers and LLVM fma-contracts them, silently
    demoting any jitted DS stream to plain f32 — see the kernel module
    docstring); it is covered by the eager primitive tests above and the
    on-chip check (scripts/ds_kernel_chipcheck.py)."""
    prob = _sep_problem(periodic=periodic)
    from lpfem.kernels.sep_apply_ds import lattice_sep_apply_ds
    from lpfem.operators import SeparableLattice
    sep64 = SeparableLattice.build(prob.space, prob.op.q, jnp.float64)
    rng = np.random.default_rng(7)
    x64 = jnp.asarray(rng.standard_normal(prob.space.n_dofs), jnp.float64)
    y64 = (sep64.constrained_apply_top(x64) if ess_top
           else sep64.apply(x64))
    ds_op = SeparableDS(sep64, q=prob.op.q, use_kernel="interpret")
    assert ds_op._kern is not None
    xds = ds_from_f64(x64)
    k = ds_op._kern
    yh, yl = lattice_sep_apply_ds(
        xds.hi, xds.lo, ds_op._kcx, ds_op._kcy, ds_op._kzt, p=sep64.p,
        dims=k["dims"], periodic=k["periodic"], ess_top=ess_top,
        interpret=True, dtype=jnp.float64)
    yds = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    rel = float(jnp.linalg.norm(yds - y64) / jnp.linalg.norm(y64))
    assert rel < 1e-13, rel


def test_ds_pallas_kernel_wiring_dispatch():
    """SeparableDS(use_kernel='interpret') must dispatch apply /
    constrained_apply_top through the Pallas kernel; through XLA:CPU the
    compensation is fma-demoted (see above), so the contract here is only
    f32-grade agreement — the dispatch and layout, not the EFT."""
    prob = _sep_problem(periodic=True)
    from lpfem.operators import SeparableLattice
    sep64 = SeparableLattice.build(prob.space, prob.op.q, jnp.float64)
    rng = np.random.default_rng(8)
    x64 = jnp.asarray(rng.standard_normal(prob.space.n_dofs), jnp.float64)
    ds_op = SeparableDS(sep64, q=prob.op.q, use_kernel="interpret")
    assert ds_op._kern is not None
    for ess in (False, True):
        y64 = (sep64.constrained_apply_top(x64) if ess else sep64.apply(x64))
        xds = ds_from_f64(x64)
        yds = ds_to_f64(ds_op.constrained_apply_top(xds) if ess
                        else ds_op.apply(xds))
        rel = float(jnp.linalg.norm(yds - y64) / jnp.linalg.norm(y64))
        assert rel < 1e-6, rel
