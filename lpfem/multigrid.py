"""p-multigrid preconditioner with Chebyshev-Jacobi smoothing.

TPU-native replacement for the reference's strong preconditioner,
``HypreBoomerAMG`` + CG (``Solvers/laplace_solver_parallel.cpp:134-146``).
Algebraic multigrid is host-sequential and pointer-chasing — the opposite of
what a TPU wants. The TPU-first equivalent for spectral elements is
**p-coarsening**: the same mesh discretized at decreasing order
(p -> p/2 -> ... -> 1), embedded-interpolation transfers, Chebyshev(degree-k)
Jacobi smoothing on every level (pure operator applies — all MXU/VPU work),
and a dense Cholesky (or Chebyshev) coarse solve. Iteration counts stay
O(1) in both h and p, matching BoomerAMG-CG's role at the 10M-DOF scale
(SURVEY.md §7 step 7).

Everything is jit-compatible: the V-cycle is a fixed unrolled recursion over
a static level list; eigenvalue estimates are computed once at setup.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .elements import basis_1d, lagrange_eval
from .operators import LaplacePA
from .space import H1Space

__all__ = ["ChebyshevSmoother", "PMultigrid", "estimate_lmax"]


def estimate_lmax(apply_fn, inv_diag, n: int, iters: int = 20,
                  dtype=jnp.float64, safety: float = 1.1,
                  params=None) -> float:
    """Power-iteration estimate of lambda_max(D^-1 A) (MFEM's
    ``OperatorChebyshevSmoother`` does the same with 10 power iterations).

    ``params`` (a :class:`lpfem.params.BigParams`) threads the operator's
    large buffers as jit arguments instead of HLO constants."""
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n,), dtype=dtype)

    def it(v, invd):
        w = invd * apply_fn(v)
        lam = jnp.linalg.norm(w)
        return w / lam, lam

    if params is not None:
        from .params import jit_with_params
        itj = jit_with_params(it, params)
    else:
        itj = jax.jit(it)

    lam = 1.0
    for _ in range(iters):
        v, lam = itj(v, inv_diag)
    return float(lam) * safety


class ChebyshevSmoother:
    """Fixed-degree Chebyshev acceleration of Jacobi: z ~= A^-1 r.

    A *linear, symmetric positive* operation (a fixed polynomial in D^-1 A),
    hence valid both as a CG preconditioner and as an MG smoother. Classic
    three-term recurrence on [lmax/30, lmax] (hypre's default window).
    """

    def __init__(self, apply_fn, inv_diag, lmax: float, degree: int = 3,
                 lmin_frac: float = 1.0 / 30.0):
        self.apply_fn = apply_fn
        self.inv_diag = inv_diag
        self.degree = degree
        lmin = lmin_frac * lmax
        self.theta = (lmax + lmin) / 2.0
        self.delta = (lmax - lmin) / 2.0

    def __call__(self, r, z0=None):
        """Return z ~= A^-1 r (z0 optional initial guess, used by MG)."""
        A, invD = self.apply_fn, self.inv_diag
        theta, delta = self.theta, self.delta
        if z0 is None:
            res = r
            z = jnp.zeros_like(r)
        else:
            z = z0
            res = r - A(z)
        sigma = theta / delta
        rho = 1.0 / sigma
        d = invD * res / theta
        z = z + d
        for _ in range(self.degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (invD * (r - A(z)))
            z = z + d
            rho = rho_new
        return z


def _interp_1d(p_coarse: int, p_fine: int) -> np.ndarray:
    """[pf+1, pc+1] interpolation from coarse GLL nodes to fine GLL nodes."""
    Bc, _ = lagrange_eval(basis_1d(p_coarse).nodes, basis_1d(p_fine).nodes)
    return Bc


class _Level:
    def __init__(self, op: LaplacePA, ess: np.ndarray):
        self.op = op
        self.ess = jnp.asarray(ess.astype(np.int32))
        n = op.n_dofs
        free = np.ones(n)
        free[ess] = 0.0
        self.free = jnp.asarray(free, dtype=op.dtype)
        diag_c = op.diag.at[self.ess].set(1.0)
        self.inv_diag = 1.0 / diag_c
        self.inv_mult = jnp.asarray(1.0 / op.space.node_mult, dtype=op.dtype)

    def apply_c(self, x):
        y = self.op.apply(x * self.free)
        return y * self.free + x * (1.0 - self.free)

    def register_params(self, bp) -> None:
        self.op.register_params(bp)
        bp.register(self, "free", "inv_diag", "inv_mult")


class PMultigrid:
    """V-cycle p-multigrid preconditioner for the essential-dof-constrained
    Laplace operator.

    ``precond(r)`` assumes ``r`` vanishes on essential dofs (true inside CG on
    the constrained system) and returns an SPD-consistent approximation to
    ``A_c^{-1} r``.
    """

    def __init__(self, fine_op: LaplacePA, ess_attr: int = 2,
                 levels: list[int] | None = None, smooth_degree: int = 3,
                 coarse_dense_limit: int = 6000, coarse_cheb_degree: int = 16,
                 ess_dofs: np.ndarray | None = None):
        space = fine_op.space
        mesh = space.mesh
        p = space.p
        if levels is None:
            levels = []
            q = p
            while q > 1:
                levels.append(q)
                q = max(1, q // 2)
            levels.append(1)
        assert levels[0] == p
        self.orders = levels

        self.levels: list[_Level] = []
        for li, pl in enumerate(levels):
            if li == 0:
                op = fine_op
                sp = space
                ess = (np.asarray(ess_dofs) if ess_dofs is not None
                       else sp.boundary_dofs(ess_attr))
            else:
                sp = H1Space(mesh, pl)
                op = LaplacePA(sp, dtype=fine_op.dtype, mode=fine_op.mode)
                ess = sp.boundary_dofs(ess_attr)
            self.levels.append(_Level(op, ess))

        # transfers: per-level-pair embedded interpolation matrices [Lf, Lc]
        self.I3 = []
        for li in range(len(levels) - 1):
            pf, pc = levels[li], levels[li + 1]
            I1 = _interp_1d(pc, pf)
            I3 = np.einsum("cz,by,ax->cbazyx", I1, I1, I1).reshape(
                (pf + 1) ** 3, (pc + 1) ** 3)
            self.I3.append(jnp.asarray(I3, dtype=fine_op.dtype))

        # smoothers (need lmax of D^-1 A_c per level); thread each level's
        # big buffers as jit arguments (lpfem.params)
        from .params import BigParams
        self.smoothers = []
        for lv in self.levels:
            bp = BigParams()
            lv.register_params(bp)
            lmax = estimate_lmax(lv.apply_c, lv.inv_diag, lv.op.n_dofs,
                                 dtype=fine_op.dtype, params=bp)
            self.smoothers.append(ChebyshevSmoother(
                lv.apply_c, lv.inv_diag, lmax, degree=smooth_degree))

        # coarse solver
        cl = self.levels[-1]
        nC = cl.op.n_dofs
        if nC <= coarse_dense_limit:
            A = cl.op.assemble_scipy().toarray()
            ess = np.asarray(cl.ess)
            A[ess, :] = 0.0
            A[:, ess] = 0.0
            A[ess, ess] = 1.0
            # factor once on host (f64 for stability), apply on device
            self._coarse_inv = jnp.asarray(np.linalg.inv(A), dtype=fine_op.dtype)
            self.coarse_solve = lambda r: self._coarse_inv @ r
        else:
            bp = BigParams()
            cl.register_params(bp)
            lmax = estimate_lmax(cl.apply_c, cl.inv_diag, nC,
                                 dtype=fine_op.dtype, params=bp)
            cheb = ChebyshevSmoother(cl.apply_c, cl.inv_diag, lmax,
                                     degree=coarse_cheb_degree)
            self.coarse_solve = lambda r: cheb(r)

    # ------------------------------------------------------------ transfers
    def prolong(self, li: int, xc):
        """coarse level li+1 -> fine level li."""
        fine, coarse = self.levels[li], self.levels[li + 1]
        uc = coarse.op.gather_E(xc)
        uf = jnp.einsum("fc,ec->ef", self.I3[li], uc)
        xf = fine.op.assemble(uf) * fine.inv_mult
        return xf * fine.free

    def restrict(self, li: int, rf):
        """fine level li -> coarse level li+1 (transpose of prolong)."""
        fine, coarse = self.levels[li], self.levels[li + 1]
        uf = fine.op.gather_E(rf * fine.inv_mult)
        uc = jnp.einsum("fc,ef->ec", self.I3[li], uf)
        rc = coarse.op.assemble(uc)
        return rc * coarse.free

    # -------------------------------------------------------------- V-cycle
    def _vcycle(self, li: int, r):
        if li == len(self.levels) - 1:
            return self.coarse_solve(r)
        sm = self.smoothers[li]
        lv = self.levels[li]
        z = sm(r)                                   # pre-smooth from zero
        rc = self.restrict(li, r - lv.apply_c(z))
        zc = self._vcycle(li + 1, rc)
        z = z + self.prolong(li, zc)
        z = sm(r, z0=z)                             # post-smooth
        return z

    def __call__(self, r):
        return self._vcycle(0, r)

    def register_params(self, bp) -> None:
        for lv in self.levels:
            lv.register_params(bp)
        for sm in self.smoothers:
            bp.register(sm, "inv_diag")
        bp.register(self, "_coarse_inv")
