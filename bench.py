"""Headline benchmark: the reference's strong-scaling protocol on one chip.

Protocol (``Convergence_and_Scaling/ss.cpp:90-93,254-286`` + ``ss.sh``):
10 RK4 steps = 40 Laplace solves on the periodic big wave tank, order 4,
partial assembly + CG with ``SetRelTol(1e-8)`` / maxit 300 — which in MFEM's
CGSolver semantics is convergence on ``r.z <= rz0 * 1e-16`` (the rel-tol is
squared; see ``lpfem/solvers.py``). Warm-up step excluded, wall time = max
over ranks (here: one fused XLA program, ``block_until_ready``).

An f32 solve cannot reach a 1e-16 relative floor, so the faithful run is
``dtype=mixed`` (f64 state + true residuals, exact-f32 inner operator) — the
default. The f32 @ rtol_sq 1e-8 configuration benched in earlier rounds is
reported as a clearly-labeled secondary metric in ``detail``.

Metric: DOF x Laplace-solves per second. The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` compares against the previous round's
recorded value when available (``BENCH_r*.json``), else 1.0.

Robustness: a previous process SIGKILLed mid-program can wedge the TPU for
the next one (CLAUDE.md gotcha; lost the round-3 capture) — on an
UNAVAILABLE/backend-init failure the script re-execs itself once after a
pause. Test hook: ``LPFEM_BENCH_FAIL_ONCE=1`` injects one such failure.

Usage:
  python bench.py [--order 4] [--refs 2] [--dtype mixed] [--rtol-sq 1e-16]
  python bench.py --scales 1,2,3     # protocol table -> data/bench-scales.txt
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics
import sys
import time

_RETRY_MARKER = "LPFEM_BENCH_RETRY"


def bench_once(args, refs: int, dtype: str | None = None,
               rtol_sq: float | None = None) -> dict:
    """One protocol measurement at ``refs`` refinements. Returns wall, CG
    iteration count of the cold solve, and the chained apply time."""
    import jax
    import jax.numpy as jnp
    from lpfem.configs import preset
    from lpfem.params import jit_with_params
    from lpfem.problem import Problem

    dtype = dtype or args.dtype
    rtol_sq = rtol_sq if rtol_sq is not None else args.rtol_sq
    cfg = preset("scaling_base", order=args.order, ref_levels=refs,
                 nx=args.nx, ny=args.ny, nz=args.nz, precond=args.precond,
                 cheb_degree=args.cheb_degree,
                 dtype=dtype, cg_rtol_sq=rtol_sq, cg_max_iter=300)
    prob = Problem(cfg)
    n_dofs = prob.space.n_dofs
    ns = prob.surf.n_dofs
    y0, phi0 = prob.initial_state()

    # host-side chunking: a single on-device program running >~5 min trips
    # the TPU watchdog (CLAUDE.md); mixed at refs>=3 crosses it for a
    # 10-step program. Chunks reuse one cached executable; the ~30 ms
    # dispatch latency per extra chunk is <1% of the walls it applies to.
    chunk = args.chunk or (2 if (dtype == "mixed" and refs >= 3)
                           else args.steps)

    def run_steps(n_total):
        t, y, phi, left = 0.0, y0, phi0, n_total
        while left > 0:
            n = min(chunk, left)
            (t, y, phi), _ = prob.run(n_steps=n, t0=float(t), state=(y, phi))
            jax.block_until_ready(y)
            left -= n
        return t, y, phi

    # warm-up (excluded, like ss.cpp:254); compiles via the cached,
    # params-threaded path (big buffers as jit arguments)
    run_steps(min(chunk, args.steps))
    run_steps(args.steps)

    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        t, y, phi = run_steps(args.steps)
        walls.append(time.perf_counter() - t0)
    dt_wall = statistics.median(walls)
    n_solves = 4 * args.steps

    # CG iterations of a cold solve (zero warm start) at the protocol
    # tolerance — the per-solve iteration count ss.cpp reports (for
    # dtype=mixed this is the TOTAL inner f32 iteration count of pcg_ir)
    solve = jit_with_params(
        lambda y_, p_: prob.fso.solve_laplace(y_[ns:], p_), prob.params)
    _, info = solve(y0, phi0)
    iters = int(info.iters)
    if not bool(info.converged):
        print(f"[bench] WARNING: cold solve unconverged at refs={refs} "
              f"(rz={float(info.rz):.3e} rz0={float(info.rz0):.3e})",
              file=sys.stderr)

    # chained constrained-apply time (the CG hot op)
    ess = prob.fso.ess
    n_ap = 30
    ap = jit_with_params(
        lambda x: jax.lax.fori_loop(
            0, n_ap, lambda i, v: prob.op.constrained_apply(v, ess), x),
        prob.params)
    x = jnp.asarray(phi0, dtype=prob.op.dtype)
    jax.block_until_ready(ap(x))
    ap_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(ap(x))
        ap_walls.append(time.perf_counter() - t0)
    apply_ms = statistics.median(ap_walls) / n_ap * 1e3

    return dict(refs=refs, n_dofs=int(n_dofs), wall_s=dt_wall,
                value=n_dofs * n_solves / dt_wall, n_solves=n_solves,
                cg_iters=iters, apply_ms=apply_ms, dtype=dtype,
                rtol_sq=rtol_sq,
                walls=[round(w, 4) for w in walls])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--refs", type=int, default=2,
                    help="2 = 2.18M dofs, the ss.cpp big-tank + 1 parallel "
                         "refinement protocol scale")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="mixed",
                    help="mixed (faithful: f64 residuals + exact-f32 inner "
                         "operator, reaches the rz0*1e-16 floor) | float32 "
                         "| float64")
    ap.add_argument("--rtol-sq", type=float, default=1e-16,
                    help="CG convergence threshold on r.z relative to rz0 "
                         "(MFEM SetRelTol(t) == t^2 here; ss.cpp's "
                         "SetRelTol(1e-8) -> 1e-16)")
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--ny", type=int, default=2)
    ap.add_argument("--nz", type=int, default=8)
    ap.add_argument("--precond", default="pmg", choices=["jacobi", "chebyshev", "pmg"])
    ap.add_argument("--cheb-degree", type=int, default=4,
                    help="smoother degree for chebyshev/pmg")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timing repeats; median reported (tunnel variance)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="max RK4 steps per dispatched program (0 = auto: "
                         "whole run, except mixed at refs>=3 where a "
                         "10-step program trips the ~5-min device watchdog)")
    ap.add_argument("--no-secondary", action="store_true",
                    help="skip the f32 @ rtol_sq=1e-8 secondary measurement")
    ap.add_argument("--scales", default=None,
                    help="comma list of refs (e.g. 1,2,3): run the protocol "
                         "at each scale and write data/bench-scales.txt "
                         "(the ss.cpp / strongscaling.cpp problem sizes)")
    args = ap.parse_args()

    if os.environ.get("LPFEM_BENCH_FAIL_ONCE") and not os.environ.get(_RETRY_MARKER):
        raise RuntimeError("UNAVAILABLE: injected test failure "
                           "(LPFEM_BENCH_FAIL_ONCE)")

    import jax

    if args.scales:
        from lpfem.io import DataFile
        out = "data/bench-scales.txt"
        if os.path.exists(out):
            os.remove(out)
        df = DataFile(out, "refs dofs dtype rtol_sq wall_s dof_solves_per_s "
                           "cg_iters apply_ms")
        for refs in [int(s) for s in args.scales.split(",")]:
            r = bench_once(args, refs)
            df.append(r["refs"], r["n_dofs"], r["dtype"], r["rtol_sq"],
                      round(r["wall_s"], 4), round(r["value"], 1),
                      r["cg_iters"], round(r["apply_ms"], 4))
            print(f"refs={refs} dofs={r['n_dofs']} wall={r['wall_s']:.3f}s "
                  f"-> {r['value'] / 1e6:.1f}M dof*solves/s "
                  f"iters={r['cg_iters']} apply={r['apply_ms']:.3f}ms")
        return

    r = bench_once(args, args.refs)
    sec = None
    if not args.no_secondary:
        s = bench_once(args, args.refs, dtype="float32", rtol_sq=1e-8)
        sec = {"value": round(s["value"], 1), "wall_s": round(s["wall_s"], 4),
               "cg_iters": s["cg_iters"], "dtype": "float32",
               "rtol_sq": 1e-8,
               "note": "non-faithful softened protocol (rounds 1-3 headline)"}
    prev, prev_detail = None, {}

    def round_no(path):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    for f in sorted(glob.glob("BENCH_r*.json"), key=round_no):
        try:
            rec = json.load(open(f))
            rec = rec.get("parsed", rec)   # driver wraps the bench line
            if rec and rec.get("metric") == "laplace_dof_throughput":
                prev = rec.get("value")
                prev_detail = rec.get("detail", {}) or {}
        except Exception:
            pass
    # protocol-matched comparison: rounds 1-3 recorded the softened
    # f32/rtol_sq=1e-8 configuration; comparing the faithful mixed/1e-16
    # number against it would conflate a protocol change with a perf
    # change, so match via the secondary f32 measurement in that case
    this_proto = (args.dtype, args.rtol_sq)
    prev_proto = (prev_detail.get("dtype", "float32"),
                  prev_detail.get("rtol_sq", 1e-8))
    if prev and prev_proto == this_proto:
        vs, vs_basis = r["value"] / prev, "same protocol"
    elif prev and sec and prev_proto == ("float32", 1e-8):
        vs = sec["value"] / prev
        vs_basis = "protocol-matched via secondary f32/1e-8 measurement"
    else:
        vs, vs_basis = 1.0, "no comparable prior record"

    print(json.dumps({
        "metric": "laplace_dof_throughput",
        "value": round(r["value"], 1),
        "unit": "dof*solves/s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "vs_baseline_basis": vs_basis,
            "protocol": "ss.cpp faithful: SetRelTol(1e-8) -> r.z<=rz0*1e-16"
                        if (args.rtol_sq == 1e-16 and args.dtype == "mixed")
                        else f"dtype={args.dtype} rtol_sq={args.rtol_sq}",
            "n_dofs": r["n_dofs"], "order": args.order, "refs": args.refs,
            "steps": args.steps, "laplace_solves": r["n_solves"],
            "wall_s": round(r["wall_s"], 4), "dtype": r["dtype"],
            "rtol_sq": r["rtol_sq"],
            "precond": args.precond,
            "cg_iters": r["cg_iters"],
            "apply_ms": round(r["apply_ms"], 4),
            "walls": r["walls"],
            "secondary_f32": sec,
            "backend": jax.devices()[0].platform,
        },
    }))


def _is_transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return ("UNAVAILABLE" in msg or "backend" in msg.lower()
            or "DEADLINE_EXCEEDED" in msg)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:       # noqa: BLE001 — retry gate below
        # a wedged chip can stay UNAVAILABLE for minutes (round 3 lost its
        # capture to one that outlived 3 driver attempts) — re-exec with
        # exponential backoff, up to 4 times (30+60+120+240 s ≈ 7.5 min)
        attempt = int(os.environ.get(_RETRY_MARKER, "0"))
        if _is_transient(e) and attempt < 4:
            pause = float(os.environ.get("LPFEM_BENCH_RETRY_SLEEP",
                                         str(30 * 2 ** attempt)))
            print(f"[bench] transient backend failure (attempt "
                  f"{attempt + 1}/4), re-exec in {pause:g}s:"
                  f" {str(e).splitlines()[0] if str(e) else type(e).__name__}",
                  file=sys.stderr)
            sys.stderr.flush()
            time.sleep(pause)
            env = dict(os.environ)
            env[_RETRY_MARKER] = str(attempt + 1)
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        raise
