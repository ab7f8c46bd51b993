"""On-chip validation + timing of the DS apply tiers.

The CPU test suite cannot validate the f32 error-free transforms through
XLA:CPU (its fusion pass fma-contracts them — see kernels/sep_apply_ds.py
docstring), so the accuracy proof for the production DS paths runs HERE,
on the real TPU, against the emulated-f64 operator:

  1. XLA SeparableDS (the round-5 committed outer path)    -> rel vs f64
  2. Pallas DS sep kernel (kernels/sep_apply_ds)           -> rel vs f64
  3. chained-apply timings of both + the emulated-f64 apply

Pass = both rels <= 1e-13 (the VERDICT round-4 contract). A contracted
(mul+add -> fma) stream shows up as ~4e-8 instead — unmissable.

Usage: python scripts/ds_kernel_chipcheck.py [refs]   (default 1 = 283k)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from lpfem.configs import preset
from lpfem.ds import SeparableDS, ds_from_f64, ds_to_f64
from lpfem.problem import Problem

refs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
cfg = preset("scaling_base", order=4, ref_levels=refs, dtype="mixed")
t0 = time.perf_counter()
prob = Problem(cfg)
sep64 = prob.fso.op_hi.sep
assert sep64 is not None
print(f"setup {time.perf_counter()-t0:.1f}s  n={prob.space.n_dofs} "
      f"platform={jax.devices()[0].platform}", flush=True)

ds_xla = SeparableDS(sep64)                      # no kernel
ds_krn = SeparableDS(sep64, q=prob.fso.op_hi.q)  # kernel on TPU
print("kernel built:", ds_krn._kern is not None, flush=True)

rng = np.random.default_rng(0)
x64 = jnp.asarray(rng.standard_normal(prob.space.n_dofs), jnp.float64)
xds = ds_from_f64(x64)

t0 = time.perf_counter()
y64 = jax.block_until_ready(sep64.constrained_apply_top(x64))
print(f"f64 emulated apply (eager, incl compile) "
      f"{time.perf_counter()-t0:.1f}s", flush=True)
nrm = float(jnp.linalg.norm(y64))

for name, op in (("xla_ds", ds_xla), ("pallas_ds", ds_krn)):
    y = ds_to_f64(op.constrained_apply_top(xds))
    rel = float(jnp.linalg.norm(y - y64)) / nrm
    ok = "OK" if rel <= 1e-13 else "FAIL (fma-contracted?)"
    print(f"{name}: rel vs f64 = {rel:.3e}  [{ok}]", flush=True)

# ---- timings: n-apply fori_loop chains ----
n = 50
def chain(op):
    return jax.jit(lambda v: jax.lax.fori_loop(
        0, n, lambda i, u: op.constrained_apply_top(u), v))

results = {}
for name, op, v0 in (("xla_ds", ds_xla, xds), ("pallas_ds", ds_krn, xds)):
    f = chain(op)
    t0 = time.perf_counter()
    jax.block_until_ready(f(v0))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(v0))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    results[name] = min(ts)
    print(f"refs={refs} {name}: {min(ts):.4f} ms/apply (runs: "
          + " ".join(f"{t:.4f}" for t in ts) + ")", flush=True)

# emulated f64 apply chain for the same contract
f64c = jax.jit(lambda v: jax.lax.fori_loop(
    0, n, lambda i, u: sep64.constrained_apply_top(u), v))
t0 = time.perf_counter()
jax.block_until_ready(f64c(x64))
print(f"[f64] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(f64c(x64))
    ts.append((time.perf_counter() - t0) / n * 1e3)
results["f64_xla"] = min(ts)
print(f"refs={refs} f64_xla: {min(ts):.4f} ms/apply", flush=True)
print(results, flush=True)
