"""Profile the 17M V-cycle: where does a solve's 472ms go?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from lpfem.configs import preset
from lpfem.problem import Problem
from lpfem.params import jit_with_params, BigParams

cfg = preset("scaling_base", order=4, ref_levels=3, nx=32, ny=2, nz=8,
             precond="pmg", cheb_degree=3, dtype="float32",
             cg_rtol_sq=1e-8, cg_max_iter=300)
t0 = time.perf_counter()
prob = Problem(cfg)
print(f"setup {time.perf_counter()-t0:.0f}s n_dofs={prob.space.n_dofs} "
      f"orders={prob.fso._precond.orders}", flush=True)
pmg = prob.fso._precond
for li, lv in enumerate(pmg.levels):
    print(f"  level {li}: p={lv.op.space.p} n={lv.op.n_dofs} mode={lv.op.mode} "
          f"fusedlat={lv.op.C6r is not None} affine={lv.op.C6 is not None}", flush=True)
bp = prob.params
ess = prob.fso.ess
x = jnp.asarray(np.random.default_rng(0).standard_normal(prob.space.n_dofs),
                dtype=jnp.float32)

N = 20
def timeit(name, f, arg):
    def go(a):
        out = a
        for _ in range(N):
            out = f(out)
        return out
    g = jit_with_params(go, bp)
    y = g(arg); jax.block_until_ready(y)
    t0 = time.perf_counter(); y = g(arg); jax.block_until_ready(y)
    print(f"{name:28s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms", flush=True)

timeit("fine constrained_apply", lambda v: prob.op.constrained_apply(v, ess), x)
timeit("V-cycle", lambda v: pmg(v), x)
timeit("fine smoother (cheb3)", lambda v: pmg.smoothers[0](v), x)
for li in range(1, len(pmg.levels)):
    lv = pmg.levels[li]
    xs = jnp.asarray(np.random.default_rng(1).standard_normal(lv.op.n_dofs),
                     dtype=jnp.float32)
    timeit(f"level {li} apply (p={lv.op.space.p}, n={lv.op.n_dofs})",
           lv.apply_c, xs)
# one full solve for iteration count
y0, phi0 = prob.initial_state()
pfs = y0[prob.surf.n_dofs:]
solve = jit_with_params(lambda p_, w_: prob.fso.solve_laplace(p_, w_), bp)
phi, it = solve(pfs, phi0); jax.block_until_ready(phi)
t0 = time.perf_counter(); phi, it = solve(pfs, phi0); jax.block_until_ready(phi)
print(f"cold solve {time.perf_counter()-t0:.3f}s iters={int(it)}", flush=True)
