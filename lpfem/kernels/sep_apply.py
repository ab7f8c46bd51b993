"""Pallas TPU kernel: banded Kronecker (separable) Laplace apply.

Companion to :class:`lpfem.operators.SeparableLattice`: on axis-aligned
tensor-product grids the assembled stiffness is exactly

    A = Mz (x) My (x) Kx + Mz (x) Ky (x) Mx + Kz (x) My (x) Mx

with bandwidth-p 1D factors, so y = A x is seven banded axis contractions
— ~(p+1)^3 q^3 / (7(2p+1)/3)-fold fewer flops than the element-local PA
form (~100x at p=4). XLA lowers the banded rolls poorly (measured 8.5 ms
at 17M dofs vs the fused element kernel's 6.3 ms); this kernel keeps the
whole chain in VMEM as pure VPU roll-FMA streaming:

- grid = one step per z element layer; each step reads the layer's p+1 dof
  planes (the shared plane rides the ``xa``/``xb`` two-view trick) and
  owns output planes [p*ez, p*ez + p); the shared top plane accumulates
  through a sequential-grid carry, exactly like ``lattice_apply``.
- x band ops: (2p+1) lane rolls (``pltpu.roll``), one per offset, each
  feeding both the Kx and Mx FMAs. Out-of-range / padded-lane terms are
  killed by the *coefficient* arrays (zero where the column index would
  leave [0, Dx)), so no masking passes are needed. Periodic x requires
  Dxp == Dx (true for all bench tanks: p * nex is a 128 multiple);
  otherwise the caller falls back.
- y band ops: (2p+1) sublane shifts built as two-slice concats (y is never
  periodic here), again with zero coefficients beyond the ends.
- z: the per-layer local contraction y_l = (Khat/hz) b + (Mhat hz) a with
  Khat/Mhat static Python constants and the per-layer (1/hz, hz) scalars
  read from SMEM.

HBM traffic: ~(p+1)/p reads of x, one write of y, coefficients ~KB — the
roofline the element-kernel's p-fold redundant MXU formulation could not
reach. Replaces the hot loop of MFEM's partial assembly for separable tank
meshes (``Solvers/PF_linear_par_partial.cpp:118-124``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_sep_apply", "build_sep_tables"]


def build_sep_tables(sep, basis, Dxp: int):
    """Kernel-ready coefficient tables from a
    :class:`~lpfem.operators.SeparableLattice` (host side, float32).

    Returns ``(cx [2, 2p+1, 1, Dxp], cy [2, 2p+1, Dy, 1], zfac [nez, 2],
    Khat [p1, p1], Mhat [p1, p1])`` — cx/cy index 0 = stiffness, 1 = mass;
    zfac columns = (1/hz, hz) per element layer.
    """
    p = sep.p
    Kx, Mx = np.asarray(sep.Kx, np.float32), np.asarray(sep.Mx, np.float32)
    Ky, My = np.asarray(sep.Ky, np.float32), np.asarray(sep.My, np.float32)
    cx = np.zeros((2, 2 * p + 1, 1, Dxp), np.float32)
    cx[0, :, 0, : Kx.shape[1]] = Kx
    cx[1, :, 0, : Mx.shape[1]] = Mx
    cy = np.stack([Ky, My], axis=0)[..., None]           # [2, 2p+1, Dy, 1]
    W = basis.qwts
    Khat = ((basis.D * W[:, None]).T @ basis.D).astype(np.float32)
    Mhat = ((basis.B * W[:, None]).T @ basis.B).astype(np.float32)
    # per-layer z scale: Kz block = Khat / hz, Mz block = Mhat * hz
    hz = np.asarray(sep.spacings[2], np.float64)
    zfac = np.stack([1.0 / hz, hz], axis=1).astype(np.float32)
    return cx, cy, zfac, Khat, Mhat


def band_to_dense(band: np.ndarray) -> np.ndarray:
    """Diagonal-offset banded [2p+1, D] -> dense [D, D]
    (``M[i, i+s] = band[p+s, i]``) for the MXU y-contraction variant."""
    twop1, D = band.shape
    p = (twop1 - 1) // 2
    M = np.zeros((D, D), band.dtype)
    for s in range(-p, p + 1):
        idx = np.arange(max(0, -s), min(D, D - s))
        M[idx, idx + s] = band[p + s, idx]
    return M


def _kernel(*refs, p: int, Dy: int, Dxp: int, ess_top: bool, shard: bool,
            Khat, Mhat, y_mxu: bool, interpret: bool):
    kyd_ref = myd_ref = None
    if shard:
        # shard mode (one z-slab of the global lattice per device, same
        # contract as lattice_apply's shard mode): scal = [topb, own0] —
        # topb the local block whose upper plane is the global Dirichlet
        # plane (-1: unconstrained on this device), own0 whether this
        # device owns its window's plane 0 (else plane 0 is the lower
        # neighbor's halo, injected from p0_ref; its contributions are
        # emitted to yhalo_ref for the neighbor-owner to assemble).
        if y_mxu:
            (scal_ref, zfac_ref, xa_ref, xb_ref, cx_ref, cy_ref, kyd_ref,
             myd_ref, p0_ref, ymain_ref, ytop_ref, yhalo_ref, zcarry) = refs
        else:
            (scal_ref, zfac_ref, xa_ref, xb_ref, cx_ref, cy_ref, p0_ref,
             ymain_ref, ytop_ref, yhalo_ref, zcarry) = refs
        topb = scal_ref[0]
        own0 = scal_ref[1]
    elif y_mxu:
        (zfac_ref, xa_ref, xb_ref, cx_ref, cy_ref, kyd_ref, myd_ref,
         ymain_ref, ytop_ref, zcarry) = refs
    else:
        (zfac_ref, xa_ref, xb_ref, cx_ref, cy_ref, ymain_ref, ytop_ref,
         zcarry) = refs
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
        # v[:, y + s, :] cyclically (wrap terms are killed by the zero
        # coefficients beyond the non-periodic ends)
        s = s % Dy
        if s == 0:
            return v
        return jnp.concatenate([v[:, s:, :], v[:, :s, :]], axis=1)

    xb = xb_ref[:]
    if shard:
        xb_c = jnp.where(ez == topb, 0.0, xb)
    elif ess_top:
        xb_c = jnp.where(ez == nez - 1, 0.0, xb)
    else:
        xb_c = xb
    xa = xa_ref[:]
    if shard:
        first = jnp.where((ez == 0) & (own0 == 0), p0_ref[:], xa[0:1])
        xa = jnp.concatenate([first, xa[1:]], axis=0) if p > 1 else first
    xw = jnp.concatenate([xa, xb_c], axis=0)             # [p1, Dy, Dxp]

    # ---- x band ops: t1 = Kx u, t2 = Mx u ----
    t1 = jnp.zeros_like(xw)
    t2 = jnp.zeros_like(xw)
    for s in range(-p, p + 1):
        u_s = rollx(xw, -s)
        t1 = t1 + cx_ref[0, p + s] * u_s
        t2 = t2 + cx_ref[1, p + s] * u_s

    # ---- y band ops: a = My t1 + Ky t2, b = My t2 ----
    if y_mxu:
        # MXU variant: the 27 sublane-shift VPU passes become three small
        # [Dy, Dy] matmuls per window plane (exact-f32 products via
        # precision HIGHEST — same accuracy contract as the VPU form)
        kyd = kyd_ref[:]
        myd = myd_ref[:]
        hp = jax.lax.Precision.HIGHEST
        av, bv = [], []
        for z in range(p + 1):
            t1z = t1[z]                                   # [Dy, Dxp]
            t2z = t2[z]
            m1 = jax.lax.dot(myd, t1z, precision=hp,
                             preferred_element_type=jnp.float32)
            k2 = jax.lax.dot(kyd, t2z, precision=hp,
                             preferred_element_type=jnp.float32)
            m2 = jax.lax.dot(myd, t2z, precision=hp,
                             preferred_element_type=jnp.float32)
            av.append((m1 + k2)[None])
            bv.append(m2[None])
        a = jnp.concatenate(av, axis=0)
        b = jnp.concatenate(bv, axis=0)
    else:
        a = jnp.zeros_like(xw)
        b = jnp.zeros_like(xw)
        for s in range(-p, p + 1):
            t1s = shifty(t1, s)
            t2s = shifty(t2, s)
            cK = cy_ref[0, p + s]
            cM = cy_ref[1, p + s]
            a = a + cM * t1s + cK * t2s
            b = b + cM * t2s

    # ---- per-layer z contraction: y_l = (Khat/hz) b + (Mhat hz) a ----
    kf = zfac_ref[ez, 0]
    mf = zfac_ref[ez, 1]
    yl = []
    for lz in range(p1):
        acc = jnp.zeros((1, Dy, Dxp), dtype=jnp.float32)
        for mz in range(p1):
            c_k = float(Khat[lz, mz])
            c_m = float(Mhat[lz, mz])
            acc = acc + (c_k * kf) * b[mz: mz + 1] \
                      + (c_m * mf) * a[mz: mz + 1]
        yl.append(acc)

    # ---- z fold: plane p*ez is shared with the previous layer ----
    zc = jnp.where(ez == 0, 0.0, zcarry[:])
    r0 = yl[0] + zc
    if shard:
        # plane-0 contributions route to the halo output when not owned
        r0_main = jnp.where((ez == 0) & (own0 == 0), 0.0, r0)

        @pl.when(ez == 0)
        def _():
            yhalo_ref[:] = jnp.where(own0 == 0, r0, 0.0)
    else:
        r0_main = r0
    ymain_ref[:] = (jnp.concatenate([r0_main] + yl[1:p], axis=0) if p > 1
                    else r0_main)
    zc_next = yl[p]
    if shard:
        # identity row of the global Dirichlet plane rides the carry
        # through the zero-metric pad blocks above (zfac = 0 there)
        zc_next = jnp.where(ez == topb, xb, zc_next)
    zcarry[:] = zc_next

    @pl.when(ez == nez - 1)
    def _():
        if shard:
            ytop_ref[:] = jnp.where(topb == nez - 1, xb, yl[p])
        elif ess_top:
            ytop_ref[:] = xb
        else:
            ytop_ref[:] = yl[p]


@functools.partial(jax.jit, static_argnames=(
    "p", "dims", "periodic", "ess_top", "Khat", "Mhat", "y_mxu",
    "interpret"))
def lattice_sep_apply(x: jax.Array, cx: jax.Array, cy: jax.Array,
                      zfac: jax.Array, *, p: int,
                      dims: tuple[int, int, int],
                      periodic: tuple[bool, bool],
                      ess_top: bool = False,
                      Khat=None, Mhat=None,
                      y_mxu: bool = False,
                      interpret: bool = False,
                      shard_scal: jax.Array | None = None,
                      p0: jax.Array | None = None):
    """y = A x via the banded Kronecker form (see module docstring).

    ``cx [2, 2p+1, 1, Dxp]`` / ``cy [2, 2p+1, Dy, 1]`` / ``zfac [nez, 2]``
    from :func:`build_sep_tables`; ``Khat``/``Mhat`` the static reference
    1D element matrices as hashable tuples-of-tuples. Periodic x requires
    the padded lane count to equal Dx (the caller checks).

    Shard mode (``shard_scal``/``p0`` given): one z-slab of a sharded
    lattice, same contract as ``lattice_affine_apply`` shard mode —
    ``shard_scal = [topb, own0]`` int32, ``p0 [1, Dy, Dx]`` the exchanged
    halo plane; returns ``(y, yhalo [Dy*Dx])`` with plane-0 contributions
    in ``yhalo`` (zeroed inside ``y``). ``zfac`` rows of padded slab
    layers must be zero (their contributions vanish; the Dirichlet
    identity row rides the carry through them).
    """
    nex, ney, nez = dims
    px, py = periodic
    assert not py
    shard = shard_scal is not None
    p1 = p + 1
    Dx = p * nex + (0 if px else 1)
    Dy = p * ney + 1
    Dz = p * nez + 1
    Dxp = cx.shape[3]
    assert not (px and Dxp != Dx), "periodic x needs unpadded lanes"
    Khat = np.asarray(Khat, dtype=np.float64)
    Mhat = np.asarray(Mhat, dtype=np.float64)
    xm = x.reshape(Dz, Dy, Dx)
    if Dxp != Dx:
        xm = jnp.pad(xm, ((0, 0), (0, 0), (0, Dxp - Dx)))
        if shard:
            p0 = jnp.pad(p0, ((0, 0), (0, 0), (0, Dxp - Dx)))

    kern = functools.partial(_kernel, p=p, Dy=Dy, Dxp=Dxp, ess_top=ess_top,
                             shard=shard, Khat=Khat, Mhat=Mhat,
                             y_mxu=y_mxu, interpret=interpret)
    cost = pl.CostEstimate(
        flops=2 * 7 * (2 * p + 1) * Dz * Dy * Dxp,
        bytes_accessed=4 * 2 * Dz * Dy * Dxp,
        transcendentals=0,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # zfac
        pl.BlockSpec((p, Dy, Dxp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),            # xa
        pl.BlockSpec((1, Dy, Dxp), lambda i: (i * p + p, 0, 0),
                     memory_space=pltpu.VMEM),            # xb
        pl.BlockSpec((2, 2 * p + 1, 1, Dxp), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # cx
        pl.BlockSpec((2, 2 * p + 1, Dy, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # cy
    ]
    out_specs = [
        pl.BlockSpec((p, Dy, Dxp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dy, Dxp), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p * nez, Dy, Dxp), jnp.float32),
        jax.ShapeDtypeStruct((1, Dy, Dxp), jnp.float32),
    ]
    args = [zfac, xm.astype(jnp.float32), xm.astype(jnp.float32),
            cx.astype(jnp.float32), cy.astype(jnp.float32)]
    if y_mxu:
        # dense [Dy, Dy] y factors, scattered from the bands under trace
        # (static index ranges; a one-time setup cost XLA folds away)
        kyd = jnp.zeros((Dy, Dy), jnp.float32)
        myd = jnp.zeros((Dy, Dy), jnp.float32)
        for s in range(-p, p + 1):
            idx = np.arange(max(0, -s), min(Dy, Dy - s))
            kyd = kyd.at[idx, idx + s].set(
                cy[0, p + s, idx, 0].astype(jnp.float32))
            myd = myd.at[idx, idx + s].set(
                cy[1, p + s, idx, 0].astype(jnp.float32))
        in_specs += [pl.BlockSpec((Dy, Dy), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((Dy, Dy), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [kyd, myd]
    if shard:
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]   # scal
                    + in_specs
                    + [pl.BlockSpec((1, Dy, Dxp), lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)])  # p0
        out_specs.append(pl.BlockSpec((1, Dy, Dxp), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, Dy, Dxp), jnp.float32))
        args = [shard_scal.astype(jnp.int32)] + args \
            + [p0.astype(jnp.float32)]
    # live set per grid step ~ 5 windows of p1 planes (xw, t1, t2, a, b)
    # plus shift temporaries: past the default 16 MB scoped-vmem limit at
    # the 17M-dof scale (measured 26 MB; v5e has 128 MB physical VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024,
        dimension_semantics=("arbitrary",))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern, grid=(nez,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((1, Dy, Dxp), jnp.float32)],
            cost_estimate=cost, interpret=interpret,
            compiler_params=cparams,
        )(*args)
    if shard:
        ymain, ytop, yhalo = outs
    else:
        ymain, ytop = outs
    y = jnp.concatenate([ymain, ytop], axis=0)
    if Dxp != Dx:
        y = y[:, :, :Dx]
        if shard:
            yhalo = yhalo[:, :, :Dx]
    if shard:
        return y.reshape(-1), yhalo.reshape(-1)
    return y.reshape(-1)
