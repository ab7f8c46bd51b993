"""lpfem — TPU-native linear potential-flow FEM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``hirschjulien/Master-Thesis-LPF-in-MFEM`` (an MFEM/hypre/MPI linear
potential-flow free-surface wave solver): high-order spectral elements,
matrix-free partial assembly, jitted preconditioned CG, free-surface RK4
time stepping, relaxation zones, wave-cylinder diffraction, and
device-mesh sharding over ICI collectives in place of MPI.

Layering (see SURVEY.md §7):
    mesh      host NumPy hex meshes (Cartesian, periodic, refine, parsers)
    elements  GLL Lagrange basis / quadrature tables
    space     topological H1 dof numbering, boundary + surface trace maps
    operators matrix-free Laplace PA (sum-factorized & MXU-fused), norms
    solvers   jitted PCG + preconditioners
    surface   free-surface RHS, relaxation zones (the reference's rhs_linear)
    timestep  RK4 via lax.scan
    shard     device-mesh domain decomposition (shard_map + psum)
    analytic  Airy waves, dispersion, McCamy-Fuchs
    io        ParaView VTU writer, data files, checkpoints
    configs   presets reproducing each reference program
"""

import os

import jax

# Backend selection. NOTE: in this environment the JAX_PLATFORMS env var is
# overridden by the axon TPU plugin; only jax.config reliably wins. Set
# LPFEM_PLATFORM=cpu (or tpu) to pin the backend for library entry points.
_plat = os.environ.get("LPFEM_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

# MFEM runs double precision throughout; CG tolerances down to 1e-24 (on the
# squared residual) require f64 scalars. Opt out with LPFEM_X64=0 (the TPU
# benchmark path uses explicit f32 arrays either way).
if os.environ.get("LPFEM_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: RK4-scan programs take minutes to compile
# on TPU; caching makes reruns (bench, experiments, resumed jobs) start in
# seconds. Opt out with LPFEM_NO_COMPILE_CACHE=1.
if not os.environ.get("LPFEM_NO_COMPILE_CACHE"):
    _cache = os.environ.get("LPFEM_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/lpfem-jax"))
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

from . import analytic, elements, mesh, operators, solvers, space, surface, timestep  # noqa: E402,F401

__version__ = "0.1.0"
