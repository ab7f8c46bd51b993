"""Pallas TPU kernel: double-single (two-f32) banded Kronecker apply.

The DS twin of :mod:`lpfem.kernels.sep_apply` — same seven banded axis
contractions of the exactly-factorized stiffness

    A = Mz (x) My (x) Kx + Mz (x) Ky (x) Mx + Kz (x) My (x) Mx

but with every value carried as a two-float32 pair ``(hi, lo)`` and every
product/accumulation run as an error-free transformation (Dekker/Veltkamp
two_prod with hoisted splits, Knuth two_sum), reproducing the true f64
operator to ~2^-48 relative. This is the TPU fast path of
:class:`lpfem.ds.SeparableDS` (whose XLA formulation materializes every
rolled stream through HBM — measured ~5x slower at the 17M-dof scale): one
VMEM-resident pass with the same z-layer grid, window planes, and
sequential shared-plane carry as the f32 kernel.

Why it pays: the faithful-tolerance mixed solve (``solvers.pcg_ir_ds``)
spends its outer loop in 4-5 DS residual applies per Laplace solve
(``Convergence_and_Scaling/ss.cpp:90-93`` tolerance at f64 fidelity); the
apply is the only O(N p) component of that loop.

Arithmetic layout per banded term ``c * u`` (both DS):

    pr, e = two_prod(c.hi, u.hi)        # exact: pr + e = c.hi * u.hi
    e += c.hi*u.lo + c.lo*u.hi          # cross terms (~2^-24 each)
    acc_h, t = two_sum(acc_h, pr)       # exact running sum
    acc_l += t + e                      # error stream (plain f32)

dropping only ``c.lo * u.lo`` (~2^-48 relative). Veltkamp splits of the
rolled operand hoist above the roll (split commutes with data movement):
each band offset rolls 4 streams (hi, hi's split halves, lo) instead of
re-splitting 2p+1 shifted copies.

VMEM: the live set is ~4x the f32 kernel's (two streams per value plus the
split halves) — ~{p1 planes} x ~20 f32 buffers. The caller gates on an
estimate against the 96 MB scoped limit and falls back to the XLA form
(refs<=3 protocol scales fit; 137M-dof refs=4 does not).

Testability caveat (hard-won): XLA:CPU **breaks error-free transforms
under jit** — the fusion pass duplicates a cheap multiply into every
consumer fusion (erasing ``optimization_barrier`` and even
bitcast-roundtrip shields along the way), and LLVM then contracts the
fused ``add(x, mul(a, b))`` into an fma, so ``s = fl(x + fl(a*b))``
becomes ``fl(x + a*b)`` and the compensation stream no longer corrects
``s`` (measured: the whole DS apply degrades to plain-f32, ~4e-8 rel).
Pallas ``interpret=True`` compiles through that same path, so the CPU
test runs this kernel at ``dtype=float64`` — which validates everything
*structural* (window blocking, shared-plane fold, coefficient tables,
constraint handling) at 1e-14, while the EFT arithmetic itself is covered
by the eager primitive tests in ``tests/test_ds.py`` plus the on-chip
parity check (``scripts/ds_kernel_chipcheck.py``; XLA:TPU / Mosaic do not
contract — the committed bench converges at rz0*1e-16 through this DS
outer, which a contracted stream cannot do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_sep_apply_ds", "build_sep_tables_ds", "ds_vmem_estimate"]

_SPLIT = np.float32(4097.0)          # Veltkamp split factor for f32: 2^12+1
_SPLIT64 = np.float64(2.0 ** 27 + 1.0)   # f64 factor (interpret-test mode)


def build_sep_tables_ds(sep, basis, Dxp: int):
    """Kernel-ready DS coefficient tables from an f64
    :class:`~lpfem.operators.SeparableLattice` (host side).

    Returns ``(cx [4, 2p+1, 1, Dxp], cy [4, 2p+1, Dy, 1],
    ztab [nez, 4, p+1, p+1])`` — cx/cy rows = (K_hi, K_lo, M_hi, M_lo);
    ztab rows = DS pairs of the per-layer z factors
    ``zk = Khat[lz, mz] / hz[ez]`` and ``zm = Mhat[lz, mz] * hz[ez]``
    (the exact layer blocks of the assembled 1D Kz/Mz), as
    (zk_hi, zk_lo, zm_hi, zm_lo).
    """
    p = sep.p

    def ds_pair(a64):
        hi = a64.astype(np.float32)
        lo = (a64 - hi.astype(np.float64)).astype(np.float32)
        return hi, lo

    Kx = np.asarray(sep.Kx, np.float64)
    Mx = np.asarray(sep.Mx, np.float64)
    Ky = np.asarray(sep.Ky, np.float64)
    My = np.asarray(sep.My, np.float64)
    cx = np.zeros((4, 2 * p + 1, 1, Dxp), np.float32)
    cx[0, :, 0, : Kx.shape[1]], cx[1, :, 0, : Kx.shape[1]] = ds_pair(Kx)
    cx[2, :, 0, : Mx.shape[1]], cx[3, :, 0, : Mx.shape[1]] = ds_pair(Mx)
    kyh, kyl = ds_pair(Ky)
    myh, myl = ds_pair(My)
    cy = np.stack([kyh, kyl, myh, myl], axis=0)[..., None]
    W = basis.qwts
    Khat = (basis.D * W[:, None]).T @ basis.D          # f64 [p1, p1]
    Mhat = (basis.B * W[:, None]).T @ basis.B
    hz = np.asarray(sep.spacings[2], np.float64)       # [nez]
    zk = Khat[None] / hz[:, None, None]                # [nez, p1, p1]
    zm = Mhat[None] * hz[:, None, None]
    zkh, zkl = ds_pair(zk)
    zmh, zml = ds_pair(zm)
    ztab = np.stack([zkh, zkl, zmh, zml], axis=1)      # [nez, 4, p1, p1]
    return cx, cy, ztab


def ds_vmem_estimate(p: int, Dy: int, Dxp: int) -> int:
    """Rough live-set bound (bytes) per grid step: ~22 window-sized f32
    streams (two DS operand sets with split halves, two DS accumulator
    pairs, transient rolls)."""
    return 22 * (p + 1) * Dy * Dxp * 4


# ---------------------------------------------------------------- in-kernel
def _opaque(a, b):
    # identity. Mosaic has no optimization_barrier lowering — and none is
    # needed: the chip check (scripts/ds_kernel_chipcheck.py) verifies
    # Mosaic does not fma-contract the EFT adds (XLA:CPU does, which is
    # why interpret-mode accuracy tests run at f64 — module docstring).
    return a, b


def _two_sum(a, b):
    a, b = _opaque(a, b)
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):
    # requires |a| >= |b| (accumulator renormalization)
    a, b = _opaque(a, b)
    s = a + b
    return s, b - (s - a)


def _vsplit(a):
    c = (_SPLIT if a.dtype == jnp.float32 else _SPLIT64) * a
    t, a = _opaque(c, a)
    h = t - (t - a)
    return h, a - h


def _two_prod_ps(ah, u, ahh, ahl, uhh, uhl):
    """Dekker product with pre-split operands: exact pr + err = ah * u."""
    pr = ah * u
    err = (((ahh * uhh - pr) + ahh * uhl + ahl * uhh) + ahl * uhl)
    return pr, err


class _Acc:
    """Compensated accumulator: exact sum of ``pr`` terms via two_sum,
    error terms flow into the (plain f32) lo stream."""

    def __init__(self):
        self.h = None
        self.l = None

    def add(self, pr, err):
        if self.h is None:
            self.h, self.l = pr, err
        else:
            self.h, t = _two_sum(self.h, pr)
            self.l = self.l + (t + err)

    def norm(self):
        # renormalize so |lo| <= ulp(hi)/2 before the next split
        return _fast_two_sum(self.h, self.l)


def _kernel(ztab_ref, xah_ref, xal_ref, xbh_ref, xbl_ref, cx_ref, cy_ref,
            ymh_ref, yml_ref, yth_ref, ytl_ref, zch, zcl,
            *, p: int, Dy: int, Dxp: int, ess_top: bool, interpret: bool):
    p1 = p + 1
    ez = pl.program_id(0)
    nez = pl.num_programs(0)

    def rollx(v, shift):
        shift = shift % Dxp
        if shift == 0:
            return v
        return jnp.roll(v, shift, 2) if interpret \
            else pltpu.roll(v, shift, 2)

    def shifty(v, s):
        # cyclic stand-in for the banded y shift; wrap terms are killed by
        # the zero coefficients beyond the non-periodic ends
        s = s % Dy
        if s == 0:
            return v
        return jnp.concatenate([v[:, s:, :], v[:, :s, :]], axis=1)

    xbh = xbh_ref[:]
    xbl = xbl_ref[:]
    if ess_top:
        on_top = ez == nez - 1
        xbh_c = jnp.where(on_top, 0.0, xbh)
        xbl_c = jnp.where(on_top, 0.0, xbl)
    else:
        xbh_c, xbl_c = xbh, xbl
    xwh = jnp.concatenate([xah_ref[:], xbh_c], axis=0)   # [p1, Dy, Dxp]
    xwl = jnp.concatenate([xal_ref[:], xbl_c], axis=0)
    xhh, xhl = _vsplit(xwh)

    # ---- x band ops: t1 = Kx u, t2 = Mx u (DS) ----
    a1, a2 = _Acc(), _Acc()
    for s in range(-p, p + 1):
        u = rollx(xwh, -s)
        uhh = rollx(xhh, -s)
        uhl = rollx(xhl, -s)
        ulo = rollx(xwl, -s)
        for acc, row in ((a1, 0), (a2, 2)):
            ch = cx_ref[row, p + s]
            cl = cx_ref[row + 1, p + s]
            chh, chl = _vsplit(ch)
            pr, err = _two_prod_ps(ch, u, chh, chl, uhh, uhl)
            err = err + ch * ulo + cl * u
            acc.add(pr, err)
    t1h, t1l = a1.norm()
    t2h, t2l = a2.norm()
    t1hh, t1hl = _vsplit(t1h)
    t2hh, t2hl = _vsplit(t2h)

    # ---- y band ops: a = My t1 + Ky t2, b = My t2 (DS) ----
    aa, ab = _Acc(), _Acc()
    for s in range(-p, p + 1):
        s1 = [shifty(v, s) for v in (t1h, t1hh, t1hl, t1l)]
        s2 = [shifty(v, s) for v in (t2h, t2hh, t2hl, t2l)]
        for acc, row, sv in ((aa, 2, s1), (aa, 0, s2), (ab, 2, s2)):
            ch = cy_ref[row, p + s]
            cl = cy_ref[row + 1, p + s]
            chh, chl = _vsplit(ch)
            pr, err = _two_prod_ps(ch, sv[0], chh, chl, sv[1], sv[2])
            err = err + ch * sv[3] + cl * sv[0]
            acc.add(pr, err)
    ah, al = aa.norm()
    bh, bl = ab.norm()
    ahh, ahl = _vsplit(ah)
    bhh, bhl = _vsplit(bh)

    # ---- per-layer z contraction: y_l = (Khat/hz) b + (Mhat hz) a ----
    yl = []
    for lz in range(p1):
        acc = _Acc()
        for mz in range(p1):
            for row, vh, vl, vhh, vhl in (
                    (0, bh, bl, bhh, bhl), (2, ah, al, ahh, ahl)):
                fh = ztab_ref[ez, row, lz, mz]
                fl = ztab_ref[ez, row + 1, lz, mz]
                fhh, fhl = _vsplit(fh)
                u = vh[mz: mz + 1]
                pr = fh * u
                err = (((fhh * vhh[mz: mz + 1] - pr)
                        + fhh * vhl[mz: mz + 1]
                        + fhl * vhh[mz: mz + 1])
                       + fhl * vhl[mz: mz + 1])
                err = err + fh * vl[mz: mz + 1] + fl * u
                acc.add(pr, err)
        yl.append(acc.norm())

    # ---- z fold: plane p*ez is shared with the previous layer ----
    pzh = jnp.where(ez == 0, 0.0, zch[:])
    pzl = jnp.where(ez == 0, 0.0, zcl[:])
    r0h, t = _two_sum(yl[0][0], pzh)
    r0l = yl[0][1] + pzl + t
    ymh_ref[:] = (jnp.concatenate([r0h] + [yl[k][0] for k in range(1, p)],
                                  axis=0) if p > 1 else r0h)
    yml_ref[:] = (jnp.concatenate([r0l] + [yl[k][1] for k in range(1, p)],
                                  axis=0) if p > 1 else r0l)
    zch[:] = yl[p][0]
    zcl[:] = yl[p][1]

    @pl.when(ez == nez - 1)
    def _():
        if ess_top:
            # identity row of the Dirichlet plane (both streams)
            yth_ref[:] = xbh
            ytl_ref[:] = xbl
        else:
            yth_ref[:] = yl[p][0]
            ytl_ref[:] = yl[p][1]


@functools.partial(jax.jit, static_argnames=(
    "p", "dims", "periodic", "ess_top", "interpret", "dtype"))
def lattice_sep_apply_ds(xh: jax.Array, xl: jax.Array, cx: jax.Array,
                         cy: jax.Array, ztab: jax.Array, *, p: int,
                         dims: tuple[int, int, int],
                         periodic: tuple[bool, bool],
                         ess_top: bool = False,
                         interpret: bool = False,
                         dtype=jnp.float32):
    """DS pair ``(yh, yl) = A (xh, xl)`` via the banded Kronecker form.

    ``cx/cy/ztab`` from :func:`build_sep_tables_ds`. Same lattice contract
    as :func:`~lpfem.kernels.sep_apply.lattice_sep_apply`: periodic x
    requires unpadded lanes (Dxp == Dx), y/z non-periodic, ``ess_top``
    puts identity rows/columns on the top z-plane (the free-surface
    essential set, ``Solvers/PF_linear_par_partial.cpp:142-155``).
    ``dtype=float64`` is the interpret-mode structural-test hook (see
    module docstring); the production TPU path is float32 DS.
    """
    nex, ney, nez = dims
    px, py = periodic
    assert not py
    p1 = p + 1
    Dx = p * nex + (0 if px else 1)
    Dy = p * ney + 1
    Dz = p * nez + 1
    Dxp = cx.shape[3]
    assert not (px and Dxp != Dx), "periodic x needs unpadded lanes"
    xmh = xh.reshape(Dz, Dy, Dx)
    xml = xl.reshape(Dz, Dy, Dx)
    if Dxp != Dx:
        xmh = jnp.pad(xmh, ((0, 0), (0, 0), (0, Dxp - Dx)))
        xml = jnp.pad(xml, ((0, 0), (0, 0), (0, Dxp - Dx)))

    kern = functools.partial(_kernel, p=p, Dy=Dy, Dxp=Dxp, ess_top=ess_top,
                             interpret=interpret)
    cost = pl.CostEstimate(
        flops=2 * 7 * 20 * (2 * p + 1) * Dz * Dy * Dxp,
        bytes_accessed=4 * 4 * Dz * Dy * Dxp,
        transcendentals=0,
    )
    win = lambda i: (i, 0, 0)
    top = lambda i: (i * p + p, 0, 0)
    fix = lambda i: (0, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # ztab
        pl.BlockSpec((p, Dy, Dxp), win, memory_space=pltpu.VMEM),  # xah
        pl.BlockSpec((p, Dy, Dxp), win, memory_space=pltpu.VMEM),  # xal
        pl.BlockSpec((1, Dy, Dxp), top, memory_space=pltpu.VMEM),  # xbh
        pl.BlockSpec((1, Dy, Dxp), top, memory_space=pltpu.VMEM),  # xbl
        pl.BlockSpec((4, 2 * p + 1, 1, Dxp), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                     # cx
        pl.BlockSpec((4, 2 * p + 1, Dy, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                     # cy
    ]
    out_specs = [
        pl.BlockSpec((p, Dy, Dxp), win, memory_space=pltpu.VMEM),
        pl.BlockSpec((p, Dy, Dxp), win, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dy, Dxp), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dy, Dxp), fix, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p * nez, Dy, Dxp), dtype),
        jax.ShapeDtypeStruct((p * nez, Dy, Dxp), dtype),
        jax.ShapeDtypeStruct((1, Dy, Dxp), dtype),
        jax.ShapeDtypeStruct((1, Dy, Dxp), dtype),
    ]
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("arbitrary",))
    import contextlib
    x64_ctx = (jax.enable_x64(False) if dtype == jnp.float32
               else contextlib.nullcontext())
    with x64_ctx:
        ymh, yml, yth, ytl = pl.pallas_call(
            kern, grid=(nez,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((1, Dy, Dxp), dtype),
                            pltpu.VMEM((1, Dy, Dxp), dtype)],
            cost_estimate=cost, interpret=interpret,
            compiler_params=cparams,
        )(ztab.astype(dtype), xmh.astype(dtype), xml.astype(dtype),
          xmh.astype(dtype), xml.astype(dtype),
          cx.astype(dtype), cy.astype(dtype))
    yh = jnp.concatenate([ymh, yth], axis=0)
    yl = jnp.concatenate([yml, ytl], axis=0)
    if Dxp != Dx:
        yh = yh[:, :, :Dx]
        yl = yl[:, :, :Dx]
    return yh.reshape(-1), yl.reshape(-1)
