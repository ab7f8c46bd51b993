"""Headline benchmark: the reference's strong-scaling protocol on one chip.

Protocol (``Convergence_and_Scaling/ss.cpp:90-93,254-286`` + ``ss.sh``):
10 RK4 steps = 40 Laplace solves on the periodic big wave tank, order 4,
partial assembly + Jacobi-CG (rtol^2 1e-8, maxit 300), warm-up step excluded,
wall time = max over ranks (here: one fused XLA program, `block_until_ready`).

Metric: DOF x Laplace-solves per second. The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` compares against the previous round's
recorded value when available (``BENCH_r*.json``), else 1.0.

Usage: python bench.py [--order 4] [--refs 1] [--steps 10] [--dtype float32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--refs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--ny", type=int, default=2)
    ap.add_argument("--nz", type=int, default=8)
    ap.add_argument("--precond", default="pmg", choices=["jacobi", "chebyshev", "pmg"])
    ap.add_argument("--cheb-degree", type=int, default=5,
                    help="smoother degree for chebyshev/pmg (swept on-chip: "
                         "deg 5 gives 3-4 CG iters and the best wall across "
                         "refs=1..2 with the fused-kernel apply)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timing repeats; median reported (tunnel variance)")
    args = ap.parse_args()

    import jax
    from lpfem.configs import preset
    from lpfem.problem import Problem

    cfg = preset("scaling_base", order=args.order, ref_levels=args.refs,
                 nx=args.nx, ny=args.ny, nz=args.nz, precond=args.precond,
                 cheb_degree=args.cheb_degree,
                 dtype=args.dtype, cg_rtol_sq=1e-8, cg_max_iter=300)
    prob = Problem(cfg)
    n_dofs = prob.space.n_dofs
    y0, phi0 = prob.initial_state()

    # warm-up (excluded, like ss.cpp:254); compiles via the cached,
    # params-threaded path (big buffers as jit arguments)
    (t, y, phi), _ = prob.run(n_steps=1, state=(y0, phi0))
    jax.block_until_ready(y)
    (t, y, phi), _ = prob.run(n_steps=args.steps, state=(y0, phi0))
    jax.block_until_ready(y)

    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        (t, y, phi), _ = prob.run(n_steps=args.steps, state=(y0, phi0))
        jax.block_until_ready(y)
        walls.append(time.perf_counter() - t0)
    import statistics
    dt_wall = statistics.median(walls)

    n_solves = 4 * args.steps
    value = n_dofs * n_solves / dt_wall

    prev = None
    for f in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(f))
            rec = rec.get("parsed", rec)   # driver wraps the bench line
            if rec.get("metric") == "laplace_dof_throughput":
                prev = rec.get("value")
        except Exception:
            pass
    vs = (value / prev) if prev else 1.0

    print(json.dumps({
        "metric": "laplace_dof_throughput",
        "value": round(value, 1),
        "unit": "dof*solves/s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "n_dofs": int(n_dofs), "order": args.order, "refs": args.refs,
            "steps": args.steps, "laplace_solves": n_solves,
            "wall_s": round(dt_wall, 4), "dtype": args.dtype,
            "precond": args.precond,
            "walls": [round(w, 4) for w in walls],
            "backend": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
