"""Chip probe: sep-kernel default (VPU roll-FMA y-band) vs the opt-in
MXU y-contraction variant (LPFEM_SEP_Y_MXU=1, exact-f32), timing the
constrained apply via a 50-apply fori_loop chain (single dispatches are
meaningless through the ~30 ms tunnel).

Usage: python scripts/sepvar_probe.py [refs]
"""
import os, sys, time
import numpy as np

refs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
variants = [("default", "0"), ("y_mxu", "1")]
res = {}
for name, env in variants:
    os.environ["LPFEM_SEP_Y_MXU"] = env
    import jax, jax.numpy as jnp
    from lpfem.configs import preset
    from lpfem.problem import Problem
    t0 = time.perf_counter()
    cfg = preset("scaling_base", order=4, ref_levels=refs, dtype="float32")
    prob = Problem(cfg)
    op = prob.op
    ess = prob.fso.ess
    print(f"[{name}] setup {time.perf_counter()-t0:.1f}s", flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(prob.space.n_dofs),
        jnp.float32)
    n = 50
    f = jax.jit(lambda v: jax.lax.fori_loop(
        0, n, lambda i, u: op.constrained_apply(u, ess), v))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    res[name] = min(ts)
    print(f"refs={refs} {name}: {min(ts):.4f} ms/apply (runs: "
          + " ".join(f"{t:.4f}" for t in ts) + ")", flush=True)
print(res, flush=True)
