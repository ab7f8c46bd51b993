"""Profile the 17M-dof bench configuration: where does a solve's time go?"""
import sys, time
import numpy as np

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 3

import jax
import jax.numpy as jnp
from lpfem.configs import preset
from lpfem.problem import Problem
from lpfem.params import jit_with_params

cfg = preset("scaling_base", order=4, ref_levels=REFS, nx=32, ny=2, nz=8,
             precond="pmg", cheb_degree=DEG, dtype="float32",
             cg_rtol_sq=1e-8, cg_max_iter=300)
t0 = time.perf_counter()
prob = Problem(cfg)
print(f"setup {time.perf_counter()-t0:.1f}s  n_dofs={prob.space.n_dofs} "
      f"levels={prob.fso._precond.orders if hasattr(prob.fso._precond,'orders') else '-'}")
fso = prob.op
ess = prob.fso.ess
pmg = prob.fso._precond
bp = prob.params

N = 10

def chain(f, x0):
    def go(x):
        for _ in range(N):
            x = f(x)
        return x
    return jit_with_params(lambda x: go(x), bp)

x = jnp.asarray(np.random.rand(prob.space.n_dofs), dtype=jnp.float32)

for name, f in [("fine apply", lambda v: prob.op.constrained_apply(v, ess)),
                ("V-cycle", lambda v: pmg(v))]:
    g = chain(f, x)
    y = g(x); jax.block_until_ready(y)
    t0 = time.perf_counter(); y = g(x); jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:12s} {dt*1e3:8.2f} ms/call")

# single Laplace solve incl iters
solve = jit_with_params(lambda pf, ph: prob.fso.solve_laplace(pf, ph), bp)
y0, phi0 = prob.initial_state()
pfs = y0[prob.surf.n_dofs:]
phi, iters = solve(pfs, phi0); jax.block_until_ready(phi)
t0 = time.perf_counter()
phi, iters = solve(pfs, phi0); jax.block_until_ready(phi)
print(f"laplace solve {time.perf_counter()-t0:.3f} s  iters={int(iters)} (cold-start CG)")

# bench protocol: 10 steps / 40 warm solves
(t, y, ph), _ = prob.run(n_steps=10, state=(y0, phi0)); jax.block_until_ready(y)
t0 = time.perf_counter()
(t, y, ph), _ = prob.run(n_steps=10, state=(y0, phi0)); jax.block_until_ready(y)
wall = time.perf_counter() - t0
print(f"10 steps: {wall:.2f} s -> {prob.space.n_dofs*40/wall/1e6:.1f}M dof*solves/s")
