"""Chip probe: cost of the mixed-mode OUTER (f64, emulated) constrained
apply vs the inner f32 sep-kernel apply, and the full pcg_ir solve wall.

Motivation (VERDICT round-4 weak item 1): the faithful-protocol solve wall
is dominated by `pcg_ir`'s f64 residual applies (`lpfem/surface.py`
solve_laplace -> op_hi.constrained_apply), which run XLA's emulated-f64
path on v5e. This probe quantifies the gap the double-single (two-f32)
apply has to close.

Usage: python scripts/f64_apply_probe.py [--refs 2] [--chain 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def chain_time(fn, x, n, reps=3):
    """Median wall of n chained applies (tunnel latency ~30ms: chain)."""
    y = fn(x)
    jax.block_until_ready(y)         # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        jax.block_until_ready(y)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2] / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", type=int, default=2)
    ap.add_argument("--chain", type=int, default=50)
    args = ap.parse_args()

    from lpfem.configs import preset
    from lpfem.params import jit_with_params
    from lpfem.problem import Problem

    cfg = preset("scaling_base", order=4, ref_levels=args.refs,
                 dtype="mixed", cg_rtol_sq=1e-16, cg_max_iter=300,
                 hi_apply="f64")
    prob = Problem(cfg)
    n = prob.space.n_dofs
    print(f"refs={args.refs} n_dofs={n}")
    fso = prob.fso
    ess = fso.ess

    y0, phi0 = prob.initial_state()

    # inner f32 apply (sep kernel)
    op = prob.op
    f_lo = jit_with_params(
        lambda v: op.constrained_apply(v, ess), prob.params)
    x32 = phi0.astype(jnp.float32)
    t_lo = chain_time(f_lo, x32, args.chain)
    print(f"f32 inner constrained apply: {t_lo*1e3:.3f} ms")

    # outer f64 apply (current emulated path)
    oph = prob.op_hi
    f_hi = jit_with_params(
        lambda v: oph.constrained_apply(v, ess), prob.params)
    t_hi = chain_time(f_hi, phi0, max(4, args.chain // 10))
    print(f"f64 outer constrained apply: {t_hi*1e3:.3f} ms  "
          f"({t_hi/t_lo:.1f}x the f32 apply)")

    # full faithful solve (pcg_ir cold)
    solve = jit_with_params(
        lambda y_, w_: fso.solve_laplace(y_[fso.n_surf:], w_), prob.params)
    r = solve(y0, phi0)
    jax.block_until_ready(r)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve(y0, phi0)
        jax.block_until_ready(r)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    _, info = r
    print(f"pcg_ir cold solve: {walls[1]*1e3:.1f} ms  "
          f"iters={int(info.iters)} converged={bool(info.converged)}")
    # implied outer budget: pcg_ir does (1 + n_outer) f64 applies
    print(f"  -> f64-apply share if 5 outer applies: "
          f"{5*t_hi/walls[1]*100:.0f}%")

    # ---- double-single outer (lpfem.ds + solvers.pcg_ir_ds) ----
    from lpfem.ds import DS, ds_from_f64, ds_to_f64
    cfg2 = preset("scaling_base", order=4, ref_levels=args.refs,
                  dtype="mixed", cg_rtol_sq=1e-16, cg_max_iter=300,
                  hi_apply="ds")
    prob2 = Problem(cfg2)
    fso2 = prob2.fso
    dsop = fso2._ds_op
    f_ds = jit_with_params(lambda v: dsop.constrained_apply_top(v),
                           prob2.params)
    xds = ds_from_f64(phi0)
    t_ds = chain_time(f_ds, xds, args.chain)
    print(f"DS outer constrained apply: {t_ds*1e3:.3f} ms  "
          f"({t_hi/t_ds:.1f}x faster than f64)")

    solve2 = jit_with_params(
        lambda y_, w_: fso2.solve_laplace(y_[fso2.n_surf:], w_),
        prob2.params)
    y0b, phi0b = prob2.initial_state()
    r2 = solve2(y0b, phi0b)
    jax.block_until_ready(r2)
    walls2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        r2 = solve2(y0b, phi0b)
        jax.block_until_ready(r2)
        walls2.append(time.perf_counter() - t0)
    walls2.sort()
    phi_ds, info2 = r2
    print(f"pcg_ir_ds cold solve: {walls2[1]*1e3:.1f} ms  "
          f"iters={int(info2.iters)} converged={bool(info2.converged)}  "
          f"({walls[1]/walls2[1]:.2f}x faster than f64 outer)")
    # cross-check the two solutions agree
    dev = float(jnp.max(jnp.abs(r[0] - ds_to_f64(phi_ds))))
    print(f"  |phi_f64 - phi_ds|_inf = {dev:.3e}")


if __name__ == "__main__":
    main()
