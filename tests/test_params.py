"""Big-array jit-argument threading (lpfem.params) + CG atol floor."""

import jax
import jax.numpy as jnp
import numpy as np

from lpfem.params import BigParams, jit_with_params
from lpfem.solvers import pcg


class _Holder:
    def __init__(self, arr):
        self.big = arr


def test_bind_restore_and_equivalence():
    h = _Holder(jnp.arange(2 ** 19, dtype=jnp.float32))  # 2 MiB > 256 KiB threshold
    bp = BigParams()
    bp.register(h, "big")
    assert len(bp.slots) == 1

    def f(x):
        return (h.big * x).sum()

    wrapped = jit_with_params(f, bp)
    x = jnp.float32(2.0)
    assert np.isclose(float(wrapped(x)), float(f(x)))
    # attribute restored after tracing
    assert isinstance(h.big, jax.Array) and h.big.shape == (2 ** 19,)
    # updated buffer flows through without retrace
    h.big = h.big * 0 + 1.0
    assert np.isclose(float(wrapped(x)), 2.0 * 2 ** 19)


def test_small_arrays_not_registered():
    h = _Holder(jnp.ones(10))  # tiny, below threshold
    bp = BigParams()
    bp.register(h, "big")
    assert len(bp.slots) == 0
    bp.register(h, "big", force=True)
    assert len(bp.slots) == 1


def test_problem_registers_big_buffers():
    from lpfem.configs import preset
    from lpfem.problem import Problem
    prob = Problem(preset("pf_linear_periodic", nx=16, nz=8, order=4,
                          precond="pmg"))
    import numpy as _np
    names = {a for _, a in prob.params.slots}
    # HBM frugality on affine meshes: the [ne,Q,6] G stream stays HOST
    # NumPy (the compact C6 metric drives every device path) so it must be
    # neither on device nor threaded as a jit argument; likewise the
    # [ne,L,3] Jinv_z is never materialized (compact Jz3 instead)
    assert "G" not in names, names
    assert isinstance(prob.op.G, _np.ndarray)
    assert prob.op.C6 is not None
    assert prob.fso.zderiv.Jinv_z is None
    assert prob.fso.zderiv.Jz3 is not None
    # dof-index tables still thread
    assert "elem_dofs" in names or prob.op.lattice is not None


def test_pcg_atol_floor():
    rng = np.random.default_rng(0)
    n = 50
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = jnp.asarray(rng.standard_normal(n))
    Aj = jnp.asarray(A)
    apply_fn = lambda v: Aj @ v
    # pure relative: converges tightly
    r1 = pcg(apply_fn, b, jnp.zeros(n), rtol_sq=1e-28, max_iter=500)
    # absolute floor stops earlier
    r2 = pcg(apply_fn, b, jnp.zeros(n), rtol_sq=1e-28, atol_sq=1e-6,
             max_iter=500)
    assert int(r2.iters) < int(r1.iters)
    assert float(r2.rz) <= 1e-6 + 1e-12
