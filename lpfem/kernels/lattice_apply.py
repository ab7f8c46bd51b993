"""Pallas TPU kernel: fully-fused structured-lattice Laplace apply.

The complete matrix-free operator y = A x in ONE kernel — E-vector unfold,
gradient interpolation (MXU), affine metric scaling (VPU), gradient
transpose (MXU), and assembly fold all happen in VMEM. The XLA formulation
(:class:`lpfem.operators.StructuredLattice` + per-element kernel) pays four
HBM round-trips for the [ne, L] E-vectors plus a global 6D transpose whose
small minor dimensions tile catastrophically on TPU; measured at 17M dofs
it runs ~14x off the HBM roofline. Here HBM traffic is exactly one read of
x, one write of y, and the compact affine metric.

Layout strategy (the part that makes this TPU-fast): Mosaic supports lane
ROLLS, 128-aligned lane splits/merges, and major-dim reshapes — but not
the stride-p lane deinterleave a compact E-vector needs. So the kernel
keeps the full lattice width as MXU columns: column m is the element
window starting at lattice lane m, built with p+1 lane rolls of the
x-window. Only columns m = p*e are real elements; the fold masks each
node-class row to its lane residue (lane % p == lx) and rolls it back, so
the redundant columns never reach memory. That spends p-fold extra MXU
FLOPs to stay perfectly tiled — the MXU has the headroom (the op is
bandwidth-bound by an order of magnitude), and every vector op runs at
full 128-lane occupancy.

One grid step per z-layer of elements; y-rows are processed in
lane-budgeted chunks batched into single [3Q, L] x [L, cb*Dx] matmuls.
Face dofs shared between neighboring rows/layers ride single-row adds in
VMEM (y) and a carry across sequential grid steps (z) — the TPU grid is
sequential, which makes cross-block accumulation safe.

Replaces the hot loop of MFEM's partial assembly
(``Solvers/PF_linear_par_partial.cpp:118-124``) for structured tank meshes;
curved meshes fall back to the general element kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_affine_apply", "build_c6w"]


def aligned_lanes(Dx: int) -> int:
    """Lane count padded to the vreg width — Mosaic minor-dim splits and
    merges require 128-multiple minors."""
    return max(128, -(-Dx // 128) * 128)


def build_c6w(C6: np.ndarray, p: int, dims: tuple[int, int, int],
              Dxp: int) -> np.ndarray:
    """Host-side metric layout for the fused kernel: [nez, 6*ney, Dxp]
    with each element's 6 constants repeated over its p lanes (column
    m = p*e + r, r < p carries C6[e]; pad lanes carry the last value)."""
    nex, ney, nez = dims
    C = np.asarray(C6, dtype=np.float32).reshape(nez, ney, nex, 6)
    Cw = np.repeat(C, p, axis=2)                       # [nez, ney, p*nex, 6]
    pad = Dxp - p * nex
    if pad:
        Cw = np.concatenate([Cw, np.repeat(Cw[:, :, -1:, :], pad, axis=2)],
                            axis=2)
    return np.ascontiguousarray(
        Cw.transpose(0, 1, 3, 2).reshape(nez, 6 * ney, Dxp))


def _kernel(*refs, p: int, Q: int, nex: int, ney: int, cb: int,
            Dx: int, Dxp: int, px: bool, ess_top: bool, shard: bool,
            precision: str | None, interpret: bool):
    # MXU product precision: None = backend default (bf16 inputs on TPU —
    # right for the bandwidth-bound solve path), 'high'/'highest' = 3/6-pass
    # f32 schemes for accuracy-critical uses (mixed-precision inner applies)
    from ..operators import _matmul_precision
    prec = _matmul_precision(precision)
    if shard:
        # shard mode (one z-slab of the global lattice per device; see
        # lpfem.shard): scal = [topb, own0] — topb is the local block index
        # whose upper plane is the global Dirichlet top plane (-1: no
        # constraint on this device / unconstrained apply), own0 whether
        # this device owns its window's plane 0 (device 0 of the slab
        # decomposition; otherwise plane 0 is the lower neighbor's halo,
        # injected from p0_ref and emitted to yhalo_ref).
        (scal_ref, xa_ref, xb_ref, c_ref, w_ref, jr_ref, p0_ref,
         ymain_ref, ytop_ref, yhalo_ref, zcarry) = refs
        topb = scal_ref[0]
        own0 = scal_ref[1]
    else:
        (xa_ref, xb_ref, c_ref, w_ref, jr_ref,
         ymain_ref, ytop_ref, zcarry) = refs
    p1 = p + 1
    L = p1 ** 3
    ez = pl.program_id(0)
    nez = pl.num_programs(0)

    def roll(v, shift, axis):
        shift = shift % Dxp
        if shift == 0:
            return v
        return jnp.roll(v, shift, axis) if interpret \
            else pltpu.roll(v, shift, axis)

    xb = xb_ref[:]
    if shard:
        xb_c = jnp.where(ez == topb, 0.0, xb)
    elif ess_top:
        # in-kernel essential-dof constraint (ess == the top z-plane, the
        # free surface): zero the Dirichlet row on input, write identity on
        # output — replaces two full masking passes over x and y in HBM
        xb_c = jnp.where(ez == nez - 1, 0.0, xb)
    else:
        xb_c = xb
    xa = xa_ref[:]
    if shard:
        # halo-plane injection: window plane 0 is a pad slot in the owned
        # vector for devices with a lower neighbor — read the exchanged
        # value instead (zero extra HBM passes vs. materializing the window)
        first = jnp.where((ez == 0) & (own0 == 0), p0_ref[:], xa[0:1])
        xa = jnp.concatenate([first, xa[1:]], axis=0) if p > 1 else first
    xwin = jnp.concatenate([xa, xb_c], axis=0)              # [p1, Dy, Dxp]
    Jr2 = jr_ref[:]                                          # [3Q, L]
    w3 = w_ref[:]                                            # [Q, 1]
    C = c_ref[0]                                             # [6*ney, Dxp]

    # fold source mask: only columns m = p*e are real elements; rolling the
    # masked row right by lx lands node-class lx on lattice lane p*e + lx
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, Dxp), 1)
    mask_src = (lane1 % p) == 0
    if not px:
        mask_src = jnp.logical_and(mask_src, lane1 <= p * (nex - 1))
    else:
        mask_src = jnp.logical_and(mask_src, lane1 < p * nex)

    nchunk = (ney + cb - 1) // cb
    out_rows = []                    # per y-row [p1(lz), Dxp] accumulators
    for _ in range(p * ney + 1):
        out_rows.append(jnp.zeros((p1, Dxp), dtype=jnp.float32))

    for ch in range(nchunk):
        e0 = ch * cb
        cw = min(cb, ney - e0)
        # ---- build u [L, cw*Dxp]: rows (lz, ly, lx), columns (ey, m) ----
        pieces = []
        for ly in range(p1):
            # y-window rows p*(e0+j)+ly for j < cw
            W = jnp.stack([xwin[:, p * (e0 + j) + ly, :]
                           for j in range(cw)], axis=1)      # [p1, cw, Dxp]
            for lx in range(p1):
                piece = roll(W, -lx, axis=2)
                if px and lx == p and Dxp != p * nex:
                    # padded periodic x: the last element's node p wraps to
                    # lattice lane 0, which the padded roll cannot supply
                    piece = jnp.where(lane1 == p * (nex - 1),
                                      W[:, :, 0:1], piece)
                pieces.append(piece)
        u5 = jnp.stack(pieces, axis=1)           # [p1, p1*p1, cw, Dxp]
        u2 = u5.reshape(L, cw * Dxp)

        g = jax.lax.dot_general(Jr2, u2, (((1,), (0,)), ((), ())),
                                precision=prec,
                                preferred_element_type=jnp.float32)
        gx, gy, gz = g[:Q], g[Q:2 * Q], g[2 * Q:]

        # ---- affine metric (VPU) ----
        cs = []
        for comp in range(6):
            cc = jnp.stack([C[6 * (e0 + j) + comp] for j in range(cw)],
                           axis=0)                           # [cw, Dxp]
            cs.append(cc.reshape(1, cw * Dxp))
        hx = (cs[0] * gx + cs[1] * gy + cs[2] * gz) * w3
        hy = (cs[1] * gx + cs[3] * gy + cs[4] * gz) * w3
        hz = (cs[2] * gx + cs[4] * gy + cs[5] * gz) * w3
        h = jnp.concatenate([hx, hy, hz], axis=0)            # [3Q, cw*Dxp]

        ye = jax.lax.dot_general(Jr2, h, (((0,), (0,)), ((), ())),
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        ye5 = ye.reshape(p1, p1 * p1, cw, Dxp)

        # ---- fold: mask to real columns, roll back, accumulate rows ----
        for ly in range(p1):
            for lx in range(p1):
                r = ye5[:, ly * p1 + lx, :, :]               # [p1, cw, Dxp]
                rm = jnp.where(mask_src[None], r, 0.0)
                r = roll(rm, lx, axis=2)
                if px and lx == p and Dxp != p * nex:
                    # padded periodic x: node p of the last element folds
                    # onto lattice lane 0 (lost to the pad by the roll)
                    r = jnp.where(
                        lane1 == 0,
                        r + rm[:, :, p * (nex - 1): p * (nex - 1) + 1], r)
                for j in range(cw):
                    gy_row = p * (e0 + j) + ly
                    out_rows[gy_row] = out_rows[gy_row] + r[:, j, :]

    yfull = jnp.stack(out_rows, axis=1)          # [p1, Dy, Dxp]

    # ---- z-fold: layer p of block ez lands on layer 0 of block ez+1 ----
    zc = jnp.where(ez == 0, 0.0, zcarry[:])
    r0z = yfull[0:1] + zc
    if shard:
        # plane-0 contributions route to the halo output when not owned
        # (the neighbor-owner assembles them); zeroed in the main output so
        # pad slots of the owned vector stay exactly zero
        r0z_main = jnp.where((ez == 0) & (own0 == 0), 0.0, r0z)

        @pl.when(ez == 0)
        def _():
            yhalo_ref[:] = jnp.where(own0 == 0, r0z, 0.0)
    else:
        r0z_main = r0z
    ymain_ref[:] = (jnp.concatenate([r0z_main, yfull[1:p]], axis=0)
                    if p > 1 else r0z_main)
    zc_next = yfull[p: p + 1]
    if shard:
        # constrained mode on a padded slab: the identity row of the global
        # top plane rides the carry — the (zero-metric) pad block above
        # flushes it into its plane 0 untouched
        zc_next = jnp.where(ez == topb, xb, zc_next)
    zcarry[:] = zc_next

    @pl.when(ez == nez - 1)
    def _():
        # identity row on the Dirichlet plane when the constraint is fused
        if shard:
            ytop_ref[:] = jnp.where(topb == nez - 1, xb, yfull[p: p + 1])
        elif ess_top:
            ytop_ref[:] = xb
        else:
            ytop_ref[:] = yfull[p: p + 1]


@functools.partial(jax.jit, static_argnames=(
    "p", "dims", "periodic", "ess_top", "precision", "interpret",
    "lane_budget"))
def lattice_affine_apply(x: jax.Array, C6w: jax.Array, w3col: jax.Array,
                         Jr2: jax.Array, *, p: int,
                         dims: tuple[int, int, int],
                         periodic: tuple[bool, bool],
                         ess_top: bool = False,
                         precision: str | None = None,
                         interpret: bool = False,
                         lane_budget: int | None = None,
                         shard_scal: jax.Array | None = None,
                         p0: jax.Array | None = None):
    """y = A x on the structured lattice, fully fused.

    x     [n_dofs]            lattice-major solution vector
    C6w   [nez, 6*ney, Dxp]   compact metric in kernel layout (build_c6w)
    w3col [Q, 1]              quadrature-weight products
    Jr2   [3Q, L]             stacked gradient interpolation
    p     polynomial order; dims = (nex, ney, nez) element lattice;
    periodic = (x, y) wrap flags. y and z must be non-periodic (callers
    fall back to the unfused path otherwise).

    Shard mode (``shard_scal``/``p0`` given): runs one z-slab of a sharded
    lattice (see :mod:`lpfem.shard`). ``shard_scal = [topb, own0]`` int32 —
    ``topb`` the local block whose upper plane is the global Dirichlet
    plane (-1 for an unconstrained apply), ``own0`` whether this device
    owns its window's plane 0. ``p0 [1, Dy, Dx]`` is the exchanged halo
    plane injected as window plane 0 when ``own0 == 0``. Returns
    ``(y [n], yhalo [Dy*Dx])`` where plane-0 contributions live in
    ``yhalo`` (zeroed inside ``y``) for the caller to assemble onto the
    lower neighbor.
    """
    nex, ney, nez = dims
    px, py = periodic
    assert not py, "fused lattice kernel requires non-periodic y"
    shard = shard_scal is not None
    p1 = p + 1
    Dx = p * nex + (0 if px else 1)
    Dy = p * ney + 1
    Dz = p * nez + 1
    Dxp = C6w.shape[2]
    Q = w3col.shape[0]
    L = p1 ** 3
    xm = x.reshape(Dz, Dy, Dx)
    if Dxp != Dx:
        xm = jnp.pad(xm, ((0, 0), (0, 0), (0, Dxp - Dx)))
        if shard:
            p0 = jnp.pad(p0, ((0, 0), (0, 0), (0, Dxp - Dx)))

    # lane budget per matmul chunk (columns per MXU call): bigger chunks
    # amortize the systolic-array fill over more columns but grow the VMEM
    # footprint (~4 KB/column at p=4; ~16 MB scoped limit). Swept on chip:
    # 2048 columns is ~9% faster at Dxp=512; at Dxp=1024 wider chunks are
    # neutral-to-slower and 4096 overflows VMEM, so stay at 1024.
    if lane_budget is None:
        lane_budget = 2048 if Dxp <= 512 else 1024
    cb = max(1, min(ney, lane_budget // Dxp))

    kern = functools.partial(_kernel, p=p, Q=Q, nex=nex, ney=ney, cb=cb,
                             Dx=Dx, Dxp=Dxp, px=px, ess_top=ess_top,
                             shard=shard, precision=precision,
                             interpret=interpret)
    cost = pl.CostEstimate(
        flops=2 * 2 * nez * ney * Dxp * L * 3 * Q,
        bytes_accessed=4 * (2 * Dz * Dy * Dxp + nez * ney * 6 * Dxp),
        transcendentals=0,
    )
    in_specs = [
        pl.BlockSpec((p, Dy, Dxp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dy, Dxp), lambda i: (i * p + p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 6 * ney, Dxp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Q, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * Q, L), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
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
    scratch = [pltpu.VMEM((1, Dy, Dxp), jnp.float32)]   # z carry
    args = (xm.astype(jnp.float32), xm.astype(jnp.float32),
            C6w.astype(jnp.float32), w3col.astype(jnp.float32),
            Jr2.astype(jnp.float32))
    with jax.enable_x64(False):
        if shard:
            # scalar-prefetch grid spec: index maps gain the scalar ref arg
            in_specs = ([pl.BlockSpec(s.block_shape,
                                      (lambda m: lambda i, _s: m(i))(
                                          s.index_map),
                                      memory_space=pltpu.VMEM)
                         for s in in_specs]
                        + [pl.BlockSpec((1, Dy, Dxp), lambda i, _s: (0, 0, 0),
                                        memory_space=pltpu.VMEM)])
            out_specs = [pl.BlockSpec(s.block_shape,
                                      (lambda m: lambda i, _s: m(i))(
                                          s.index_map),
                                      memory_space=pltpu.VMEM)
                         for s in out_specs]
            out_specs.append(pl.BlockSpec((1, Dy, Dxp),
                                          lambda i, _s: (0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, Dy, Dxp), jnp.float32))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nez,),
                in_specs=in_specs, out_specs=out_specs,
                scratch_shapes=scratch)
            ymain, ytop, yhalo = pl.pallas_call(
                kern, grid_spec=grid_spec, out_shape=out_shape,
                cost_estimate=cost, interpret=interpret,
            )(shard_scal.astype(jnp.int32), *args, p0.astype(jnp.float32))
        else:
            ymain, ytop = pl.pallas_call(
                kern, grid=(nez,), in_specs=in_specs, out_specs=out_specs,
                out_shape=out_shape, scratch_shapes=scratch,
                cost_estimate=cost, interpret=interpret,
            )(*args)
    y = jnp.concatenate([ymain, ytop], axis=0)
    if Dxp != Dx:
        y = y[:, :, :Dx]
        if shard:
            yhalo = yhalo[:, :, :Dx]
    if shard:
        return y.reshape(-1), yhalo.reshape(-1)
    return y.reshape(-1)
