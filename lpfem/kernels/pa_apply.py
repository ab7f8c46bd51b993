"""Pallas TPU kernel: fused partial-assembly Laplace element apply.

The hot op of the whole framework (SURVEY.md §3.1: the CG iteration's
operator apply). Computes, per element block resident in VMEM:

    g  = u @ Jr^T          [BE, L] @ [L, 3Q]   (MXU)
    h  = G6 . g            symmetric 3x3 metric per quad point (VPU)
    ye = h @ Jr            [BE, 3Q] @ [3Q, L]  (MXU)

in one kernel — no HBM round-trips for ``g``/``h`` and no layout
conversions between the matmuls and the elementwise metric scaling (which
is where the XLA-fused einsum version loses most of its time). The
E-vector gather/scatter stays outside (XLA unfold/fold on the structured
lattice, see :class:`lpfem.operators.StructuredLattice`).

Replaces the innermost compute of MFEM's sum-factorized PA kernels
(``AssemblyLevel::PARTIAL``, ``Solvers/PF_linear_par_partial.cpp:118-121``)
with an MXU-shaped formulation: at p=4, L=125 and 3Q=375 tile almost
perfectly onto the 128x128 systolic array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pa_apply_element_kernel", "pa_apply_affine_kernel"]


def _kernel(u_ref, g6_ref, jr_ref, out_ref, *, Q: int):
    u = u_ref[:]                      # [BE, L]
    Jr2 = jr_ref[:]                   # [3Q, L]
    g = jax.lax.dot_general(
        u, Jr2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BE, 3Q]
    gx, gy, gz = g[:, :Q], g[:, Q:2 * Q], g[:, 2 * Q:]
    G = g6_ref[:]                     # [BE, 6*Q] laid out (comp, q)
    Gxx, Gxy, Gxz = G[:, :Q], G[:, Q:2 * Q], G[:, 2 * Q:3 * Q]
    Gyy, Gyz, Gzz = G[:, 3 * Q:4 * Q], G[:, 4 * Q:5 * Q], G[:, 5 * Q:]
    hx = Gxx * gx + Gxy * gy + Gxz * gz
    hy = Gxy * gx + Gyy * gy + Gyz * gz
    hz = Gxz * gx + Gyz * gy + Gzz * gz
    h = jnp.concatenate([hx, hy, hz], axis=1)          # [BE, 3Q]
    out_ref[:] = jax.lax.dot_general(
        h, Jr2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BE, L]


def _affine_kernel(u_ref, c6_ref, w3_ref, jr_ref, out_ref, *, Q: int):
    u = u_ref[:]                      # [BE, L]
    Jr2 = jr_ref[:]                   # [3Q, L]
    g = jax.lax.dot_general(
        u, Jr2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BE, 3Q]
    gx, gy, gz = g[:, :Q], g[:, Q:2 * Q], g[:, 2 * Q:]
    C = c6_ref[:]                     # [BE, 6]
    w = w3_ref[:]                     # [1, Q]
    hx = (C[:, 0:1] * gx + C[:, 1:2] * gy + C[:, 2:3] * gz) * w
    hy = (C[:, 1:2] * gx + C[:, 3:4] * gy + C[:, 4:5] * gz) * w
    hz = (C[:, 2:3] * gx + C[:, 4:5] * gy + C[:, 5:6] * gz) * w
    h = jnp.concatenate([hx, hy, hz], axis=1)          # [BE, 3Q]
    out_ref[:] = jax.lax.dot_general(
        h, Jr2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BE, L]


@functools.partial(jax.jit, static_argnames=("Q", "block"))
def pa_apply_affine_kernel(u: jax.Array, C6: jax.Array, w3: jax.Array,
                           Jr2: jax.Array, Q: int,
                           block: int = 256) -> jax.Array:
    """Affine-metric variant: ye[e] = Jr^T diag(w3) C6[e] (Jr u[e]).

    u   [ne, L]   E-vector
    C6  [ne, 6]   per-element constant metric (xx,xy,xz,yy,yz,zz)
    w3  [Q]       quadrature-weight products
    Jr2 [3Q, L]   stacked gradient interpolation

    Same MXU structure as :func:`pa_apply_element_kernel` with the metric
    stream reduced Q-fold (the affine-element rank-1 factorization
    G[e,q] = w3[q] C6[e]).
    """
    ne, L = u.shape
    be = min(block, ne)
    pad = (-ne) % be
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
        C6 = jnp.pad(C6, ((0, pad), (0, 0)))
    npad = u.shape[0]
    w3r = w3.reshape(1, Q)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_affine_kernel, Q=Q),
            grid=(npad // be,),
            in_specs=[
                pl.BlockSpec((be, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((be, 6), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * Q, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((be, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad, L), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * npad * L * 3 * Q + 9 * npad * Q,
                bytes_accessed=4 * (npad * L * 2 + npad * 6 + 3 * Q * L),
                transcendentals=0,
            ),
        )(u.astype(jnp.float32), C6.astype(jnp.float32),
          w3r.astype(jnp.float32), Jr2.astype(jnp.float32))
    return out[:ne]


@functools.partial(jax.jit, static_argnames=("Q", "block"))
def pa_apply_element_kernel(u: jax.Array, G6q: jax.Array, Jr2: jax.Array,
                            Q: int, block: int = 256) -> jax.Array:
    """ye[e] = Jr^T (G6[e] . (Jr u[e])) for all elements, f32.

    u    [ne, L]     E-vector
    G6q  [ne, 6*Q]   symmetric metric, component-major layout
    Jr2  [3Q, L]     stacked gradient interpolation
    """
    ne, L = u.shape
    be = min(block, ne)
    pad = (-ne) % be
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
        G6q = jnp.pad(G6q, ((0, pad), (0, 0)))
    npad = u.shape[0]

    # Trace the pallas_call with x64 disabled: under jax_enable_x64 the
    # index-map literals become i64 and Mosaic rejects the mixed
    # (i32, i64) block-index tuple.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, Q=Q),
            grid=(npad // be,),
            in_specs=[
                pl.BlockSpec((be, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((be, 6 * Q), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * Q, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((be, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad, L), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * npad * L * 3 * Q + 9 * npad * Q,
                bytes_accessed=4 * (npad * L * 2 + npad * 6 * Q + 3 * Q * L),
                transcendentals=0,
            ),
        )(u.astype(jnp.float32), G6q.astype(jnp.float32),
          Jr2.astype(jnp.float32))
    return out[:ne]
