"""Explicit time integration: classic RK4 over the free-surface state.

TPU-native replacement for MFEM's ``RK4Solver::Step`` (used everywhere,
e.g. ``Solvers/PF_linear_serial.cpp:339,491``): four RHS evaluations per
step with stage times (t, t+dt/2, t+dt/2, t+dt) and the standard
``y += dt/6 (k1 + 2 k2 + 2 k3 + k4)`` update.

The RHS signature is ``f(t, y, aux) -> (dy, aux)`` — ``aux`` (the volume
potential) threads through the stages sequentially, mirroring MFEM's mutable
``GridFunction &phi`` warm start. ``run`` wraps the step in ``lax.scan`` so
an entire time loop is a single compiled XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["rk4_step", "rk4_run"]


def rk4_step(f: Callable, t, dt, y, aux):
    k1, aux = f(t, y, aux)
    k2, aux = f(t + dt / 2, y + (dt / 2) * k1, aux)
    k3, aux = f(t + dt / 2, y + (dt / 2) * k2, aux)
    k4, aux = f(t + dt, y + dt * k3, aux)
    y = y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return y, aux


def rk4_run(f: Callable, y0, aux0, t0: float, dt: float, n_steps: int,
            record: Callable | None = None):
    """Scan ``n_steps`` RK4 steps. If ``record(t, y, aux)`` is given its
    per-step outputs are stacked and returned as the second element."""

    def body(carry, _):
        t, y, aux = carry
        y, aux = rk4_step(f, t, dt, y, aux)
        t = t + dt
        out = record(t, y, aux) if record is not None else None
        return (t, y, aux), out

    (t, y, aux), outs = jax.lax.scan(body, (jnp.asarray(t0, dtype=y0.dtype), y0, aux0),
                                     None, length=n_steps)
    return (t, y, aux), outs
