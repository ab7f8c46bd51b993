"""Device-mesh domain decomposition: shard_map + ICI collectives replace MPI.

TPU-native equivalent of the reference's single parallelism strategy — MPI
domain decomposition via ``ParMesh(MPI_COMM_WORLD, serial_mesh)`` with
hypre/MFEM shared-dof communication (``Solvers/laplace_solver_parallel.cpp:76-78``,
SURVEY.md §2 'Parallelism strategies', §5 'Distributed communication backend').

Design (maps the MPI inventory 1:1 onto XLA collectives over a 1-axis mesh):

- Elements are partitioned into contiguous slabs by centroid (x-major), one
  per device; every per-element table is padded to ``E_max`` and stacked
  ``[ndev, E_max, ...]`` so the whole state is SPMD.
- Each dof is owned by the lowest-id device touching it; global dofs are
  renumbered owner-major so each device holds a contiguous owned block,
  padded to ``N_max``.
- Partition-interface dofs form a small global set S (``O(N^(2/3))``). A
  single ``lax.psum`` of an ``|S|+1`` buffer implements both directions of
  hypre's ParCSR assemble: value broadcast (owner sets, others read their
  halo) and contribution reduction (neighbors add, owner accumulates).
  This is the ICI analogue of MFEM's T-dof <-> L-dof exchange.
- CG dot products: local dot + ``lax.psum`` — the reference's
  ``MPI_Allreduce`` (``Convergence_and_Scaling/ss.cpp:271-276``).
- The free-surface state (a 2D trace, asymptotically negligible) is
  replicated; surface gathers ride the same psum buffer — the analogue of
  the diffraction driver's ``MPI_Allgatherv`` (``cylinder-diffraction.cpp:537-560``).

Everything — halo exchange, CG, RK4 — runs inside ONE ``shard_map``-ed jit,
so ICI latency overlaps compute and there are no host round-trips
(the MPI build pays a host-side Allreduce per CG dot).

Padding conventions: local trash lane = ``N_max`` (vectors are length
``N_max+1``; slice it off at the end), interface trash slot = ``NS``
(buffers are ``NS+1``), surface trash = ``NSurf``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .operators import LaplacePA, _nodal_geom_basis, _LEX_OF_VERT
from .problem import Problem
from .solvers import pcg
from .timestep import rk4_run

__all__ = ["Partition", "ShardedProblem", "make_device_mesh"]


def make_device_mesh(n_dev: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_dev or len(jax.devices())]
    return Mesh(np.array(devices), ("shard",))


class Partition:
    """Host-side partition tables for an :class:`H1Space` over ``ndev`` shards."""

    def __init__(self, space, ndev: int):
        self.ndev = ndev
        ed = space.elem_dofs
        ne, L = ed.shape
        n = space.n_dofs

        # --- contiguous slabs by element centroid (x, y, z)-major ---
        cen = space.mesh.corner_coords.mean(axis=1)
        order = np.lexsort((cen[:, 2], cen[:, 1], cen[:, 0]))
        part = np.zeros(ne, dtype=np.int64)
        splits = np.array_split(order, ndev)
        for d, idx in enumerate(splits):
            part[idx] = d
        self.part = part

        # --- dof ownership: min / max device touching each dof ---
        pmin = np.full(n, ndev, dtype=np.int64)
        pmax = np.full(n, -1, dtype=np.int64)
        pe = np.repeat(part, L)
        np.minimum.at(pmin, ed.ravel(), pe)
        np.maximum.at(pmax, ed.ravel(), pe)
        owner = pmin
        self.owner = owner
        iface = pmin != pmax                      # interface dofs
        self.n_iface = int(iface.sum())

        # owner-major renumbering; local index within owner block
        new_of_old = np.argsort(np.argsort(owner, kind="stable"), kind="stable")
        # offsets per device
        n_own = np.bincount(owner, minlength=ndev)
        self.n_own = n_own
        offs = np.concatenate([[0], np.cumsum(n_own)])
        loc_of_dof = new_of_old - offs[owner]     # local index in its owner
        self.N_max = int(n_own.max())
        self.loc_of_dof = loc_of_dof
        self.offs = offs

        # interface set S (order: by dof id)
        s_ids = np.where(iface)[0]
        NS = len(s_ids)
        self.NS = NS
        s_pos = np.full(n, -1, dtype=np.int64)
        s_pos[s_ids] = np.arange(NS)

        # --- per-device tables ---
        N_max, TR = self.N_max, self.N_max       # TR: local trash lane
        elems_of = [np.where(part == d)[0] for d in range(ndev)]
        self.elems_of = elems_of
        E_max = max(len(e) for e in elems_of)
        self.E_max = E_max

        led = np.full((ndev, E_max, L), 0, dtype=np.int64)
        halo_pos_l, own_if_pos_l, own_if_loc_l = [], [], []
        H_counts = []
        halo_of = []
        for d in range(ndev):
            es = elems_of[d]
            dofs = ed[es]                         # [Ed, L]
            own_mask = owner[dofs] == d
            halo_ids = np.unique(dofs[~own_mask])
            h_idx = {g: i for i, g in enumerate(halo_ids)}
            H_counts.append(len(halo_ids))
            halo_of.append(halo_ids)
        H_max = max(H_counts) if H_counts else 0
        self.H_max = H_max

        halo_pos = np.full((ndev, max(H_max, 1)), NS, dtype=np.int64)
        for d in range(ndev):
            es = elems_of[d]
            dofs = ed[es]
            own_mask = owner[dofs] == d
            halo_ids = halo_of[d]
            h_idx = np.full(n, -1, dtype=np.int64)
            h_idx[halo_ids] = np.arange(len(halo_ids))
            local = np.where(own_mask, loc_of_dof[dofs], N_max + 1 + h_idx[dofs])
            led[d, : len(es)] = local
            led[d, len(es):] = N_max              # padded elements -> trash lane
            # halo dofs must all be interface dofs
            assert np.all(s_pos[halo_ids] >= 0)
            halo_pos[d, : len(halo_ids)] = s_pos[halo_ids]
            # owned interface dofs
            o_ids = np.where((owner == d) & iface)[0]
            own_if_pos_l.append(s_pos[o_ids])
            own_if_loc_l.append(loc_of_dof[o_ids])

        # note: local layout is [own (N_max), trash (1), halo (H_max), htrash(1)]
        # -> x_loc length N_max + 1 + H_max + 1; trash lane N_max absorbs
        # padded-element writes; halo slot addresses are N_max+1+h.
        self.local_elem_dofs = led.astype(np.int32)

        NIo_max = max(len(a) for a in own_if_pos_l) if ndev > 1 else 1
        NIo_max = max(NIo_max, 1)
        oip = np.full((ndev, NIo_max), NS, dtype=np.int64)
        oil = np.full((ndev, NIo_max), N_max, dtype=np.int64)
        for d in range(ndev):
            k = len(own_if_pos_l[d])
            oip[d, :k] = own_if_pos_l[d]
            oil[d, :k] = own_if_loc_l[d]
        self.own_if_pos = oip.astype(np.int32)
        self.own_if_loc = oil.astype(np.int32)
        self.halo_pos = halo_pos.astype(np.int32)

    # ------------------------------------------------------------- helpers
    def stack_elem(self, arr: np.ndarray, fill=0.0) -> np.ndarray:
        """Stack a per-element array [ne, ...] into [ndev, E_max, ...]."""
        out_shape = (self.ndev, self.E_max) + arr.shape[1:]
        out = np.full(out_shape, fill, dtype=arr.dtype)
        for d, es in enumerate(self.elems_of):
            out[d, : len(es)] = arr[es]
        return out

    def stack_dof(self, vec: np.ndarray, fill=0.0) -> np.ndarray:
        """Distribute a global dof vector [n, ...] into [ndev, N_max+1, ...]
        (owner lanes; trash lane at N_max)."""
        out_shape = (self.ndev, self.N_max + 1) + vec.shape[1:]
        out = np.full(out_shape, fill, dtype=vec.dtype)
        for d in range(self.ndev):
            ids = np.where(self.owner == d)[0]
            out[d, self.loc_of_dof[ids]] = vec[ids]
        return out

    def unstack_dof(self, stacked: np.ndarray) -> np.ndarray:
        """Gather [ndev, N_max(+1), ...] back to a global dof vector."""
        n = len(self.owner)
        out = np.zeros((n,) + stacked.shape[2:], dtype=stacked.dtype)
        for d in range(self.ndev):
            ids = np.where(self.owner == d)[0]
            out[ids] = stacked[d, self.loc_of_dof[ids]]
        return out


class ShardedProblem:
    """SPMD form of :class:`~lpfem.problem.Problem` over a device mesh axis.

    The surface state is replicated; the volume potential and all element
    data are sharded. ``run`` executes the full RK4 loop inside a single
    ``shard_map``-ed jit.
    """

    def __init__(self, prob: Problem, mesh: Mesh | None = None,
                 n_dev: int | None = None):
        self.prob = prob
        self.mesh = mesh if mesh is not None else make_device_mesh(n_dev)
        ndev = self.mesh.devices.size
        self.ndev = ndev
        op = prob.op
        sp = prob.space
        pt = Partition(sp, ndev)
        self.pt = pt
        dtype = op.dtype

        # ---- sharded static tables ----
        self.led = jnp.asarray(pt.local_elem_dofs)               # [ndev,E_max,L]
        self.G = jnp.asarray(pt.stack_elem(np.asarray(op.G)), dtype=dtype)
        self.own_if_pos = jnp.asarray(pt.own_if_pos)
        self.own_if_loc = jnp.asarray(pt.own_if_loc)
        self.halo_pos = jnp.asarray(pt.halo_pos)
        self.Jr = op.Jr

        # diagonal (with essential lanes = 1) distributed to owners
        ess_global = np.zeros(sp.n_dofs)
        ess_global[np.asarray(prob.surf.surf_to_vol)] = 1.0
        diag = np.asarray(op.diag)
        diag_c = np.where(ess_global > 0, 1.0, diag)
        dstack = pt.stack_dof(diag_c, fill=1.0)
        dstack[:, pt.N_max] = 1.0
        self.inv_diag = jnp.asarray(1.0 / dstack, dtype=dtype)   # [ndev,N_max+1]
        self.ess_mask = jnp.asarray(pt.stack_dof(ess_global), dtype=dtype)

        # ---- z-derivative tables ----
        zd = prob.fso.zderiv
        self.Jinv_z = jnp.asarray(pt.stack_elem(np.asarray(zd.Jinv_z)), dtype=dtype)
        self.Dn = zd.Dn
        mult = sp.node_mult
        mstack = pt.stack_dof(mult, fill=1.0)
        mstack[:, pt.N_max] = 1.0
        self.inv_mult = jnp.asarray(1.0 / mstack, dtype=dtype)

        # ---- surface <-> volume (surface state replicated) ----
        s2v = np.asarray(prob.surf.surf_to_vol)
        NSurf = len(s2v)
        self.NSurf = NSurf
        sp_owner = pt.owner[s2v]
        spos_l, sloc_l = [], []
        for d in range(ndev):
            sel = np.where(sp_owner == d)[0]
            spos_l.append(sel)
            sloc_l.append(pt.loc_of_dof[s2v[sel]])
        NSo_max = max(max(len(a) for a in spos_l), 1)
        spos = np.full((ndev, NSo_max), NSurf, dtype=np.int64)
        sloc = np.full((ndev, NSo_max), pt.N_max, dtype=np.int64)
        for d in range(ndev):
            spos[d, : len(spos_l[d])] = spos_l[d]
            sloc[d, : len(sloc_l[d])] = sloc_l[d]
        self.surf_pos = jnp.asarray(spos.astype(np.int32))
        self.surf_loc = jnp.asarray(sloc.astype(np.int32))

        self.p1 = sp.p + 1
        self.NS = pt.NS
        self.N_max = pt.N_max
        self.H_max = pt.H_max
        self.dtype = dtype

    # ================= device-side SPMD pieces (run inside shard_map) =====
    # All methods below take PER-DEVICE slices (no leading ndev axis).

    def _psum(self, x):
        return jax.lax.psum(x, "shard")

    def _gather_loc(self, x_own, tables):
        """own [N_max+1] -> local [N_max+1+H_max+1] with halo filled via psum."""
        led, G, oip, oil, hp = tables
        buf = jnp.zeros(self.NS + 1, dtype=x_own.dtype)
        buf = buf.at[oip].set(x_own[oil])
        buf = self._psum(buf)
        halo = buf[hp]                                    # [H_max]
        return jnp.concatenate([x_own, halo, jnp.zeros(1, dtype=x_own.dtype)])

    def _assemble_own(self, y_loc, tables):
        """local contributions [N_max+1+H_max+1] -> assembled own [N_max+1].

        The trash lane (N_max) is zeroed on return so padded scatter targets
        never leak into CG dot products."""
        led, G, oip, oil, hp = tables
        y_own = y_loc[: self.N_max + 1]
        y_halo = y_loc[self.N_max + 1: self.N_max + 1 + self.H_max]
        buf = jnp.zeros(self.NS + 1, dtype=y_loc.dtype)
        buf = buf.at[hp].add(y_halo)
        buf = self._psum(buf)
        return y_own.at[oil].add(buf[oip]).at[self.N_max].set(0.0)

    def _apply_own(self, x_own, tables):
        """Sharded PA apply on owned lanes: A x (no BC)."""
        from .operators import _apply_G6
        led, G, oip, oil, hp = tables
        x_loc = self._gather_loc(x_own, tables)
        u = x_loc[led]                                    # [E_max, L]
        Q = self.Jr.shape[1]
        Jr2 = self.Jr.reshape(3 * Q, -1)
        g = jnp.einsum("gl,el->eg", Jr2, u).reshape(-1, 3, Q)
        h = _apply_G6(G, g[:, 0], g[:, 1], g[:, 2])
        ye = jnp.einsum("gl,eg->el", Jr2, h.reshape(h.shape[0], -1))
        y_loc = jnp.zeros(self.N_max + 1 + self.H_max + 1, dtype=x_own.dtype
                          ).at[led].add(ye)
        return self._assemble_own(y_loc, tables)

    def _zderiv_own(self, phi_own, tables, Jinv_z, inv_mult):
        led, G, oip, oil, hp = tables
        p1 = self.p1
        x_loc = self._gather_loc(phi_own, tables)
        u = x_loc[led].reshape(-1, p1, p1, p1)
        Bn = jnp.eye(p1, dtype=phi_own.dtype)
        Dn = self.Dn

        def t3(v, Az, Ay, Ax):
            return jnp.einsum("cz,by,ax,ezyx->ecba", Az, Ay, Ax, v)

        ne = u.shape[0]
        gx = t3(u, Bn, Bn, Dn).reshape(ne, p1 ** 3)
        gy = t3(u, Bn, Dn, Bn).reshape(ne, p1 ** 3)
        gz = t3(u, Dn, Bn, Bn).reshape(ne, p1 ** 3)
        ghat = jnp.stack([gx, gy, gz], axis=-1)
        w_e = jnp.einsum("eli,eli->el", Jinv_z, ghat)
        w_loc = jnp.zeros(self.N_max + 1 + self.H_max + 1, dtype=phi_own.dtype
                          ).at[led].add(w_e)
        w_own = self._assemble_own(w_loc, tables)
        return w_own * inv_mult

    def _make_spmd_rhs(self):
        """Build the per-device RHS closure f(t, y_rep, phi_own) -> (dy, phi)."""
        prob = self.prob
        fso = prob.fso
        NSurf = self.NSurf
        g_const = fso.g
        relax = fso.relax
        rtol_sq, max_iter = fso.cg_rtol_sq, fso.cg_max_iter

        def rhs(t, y, phi_own, tables, ess_mask, inv_diag, inv_mult, surf_pos,
                surf_loc, Jinv_z):
            eta, phi_fs = y[:NSurf], y[NSurf:]
            free = 1.0 - ess_mask

            # Dirichlet values scattered to owned lanes (surface -> volume)
            pfs_pad = jnp.concatenate([phi_fs, jnp.zeros(1, dtype=phi_fs.dtype)])
            x_bc = jnp.zeros(self.N_max + 1, dtype=phi_fs.dtype
                             ).at[surf_loc].set(pfs_pad[surf_pos])

            def apply_c(v):
                y_ = self._apply_own(v * free, tables)
                return y_ * free + v * ess_mask

            B = -self._apply_own(x_bc, tables) * free + x_bc
            x0 = phi_own * free + x_bc

            def pdot(a, b):
                return self._psum(jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST))

            res = pcg(apply_c, B, x0,
                      precond_fn=lambda r: r * inv_diag,
                      rtol_sq=rtol_sq, max_iter=max_iter, dot_fn=pdot)
            phi_new = res.x

            w_own = self._zderiv_own(phi_new, tables, Jinv_z, inv_mult)
            sbuf = jnp.zeros(NSurf + 1, dtype=phi_fs.dtype
                             ).at[surf_pos].set(w_own[surf_loc])
            sbuf = self._psum(sbuf)
            w_tilde = sbuf[:NSurf]

            deta = w_tilde
            dpfs = -g_const * eta
            if relax is not None:
                eta_e, phi_e = relax.targets(t)
                alpha_gen = jnp.clip(t / (relax.n_ramp * relax.T), 0.0, 1.0)
                inv_tau = 1.0 / relax.tau
                gen_w = alpha_gen * relax.cgen * inv_tau
                deta = deta + gen_w * (eta_e - eta) - relax.cabs * inv_tau * eta
                dpfs = dpfs + gen_w * (phi_e - phi_fs) - relax.cabs * inv_tau * phi_fs
            return jnp.concatenate([deta, dpfs]), phi_new

        return rhs

    # ------------------------------------------------------------------ API
    def run(self, n_steps: int | None = None, t0: float = 0.0, state=None):
        """Full sharded RK4 run. Returns (t, y_replicated, phi_global).

        Compiled programs are cached per (n_steps, t0)."""
        prob = self.prob
        if n_steps is None:
            n_steps = prob.cfg.nsteps
        if state is None:
            y0, phi0_g = prob.initial_state(t0)
        else:
            y0, phi0_g = state
        phi0 = jnp.asarray(self.pt.stack_dof(np.asarray(phi0_g)), dtype=self.dtype)
        if not hasattr(self, "_compiled"):
            self._compiled = {}
        key = (n_steps, float(t0))
        if key in self._compiled:
            t, y, phi = self._compiled[key](y0, phi0)
            return t, y, phi
        rhs = self._make_spmd_rhs()
        dt = prob.dt

        def device_fn(y0, phi0, led, G, oip, oil, hp, ess_mask, inv_diag,
                      inv_mult, surf_pos, surf_loc, Jinv_z):
            # shard_map keeps rank: sharded inputs arrive as [1, ...]
            (phi0, led, G, oip, oil, hp, ess_mask, inv_diag, inv_mult,
             surf_pos, surf_loc, Jinv_z) = (
                a[0] for a in (phi0, led, G, oip, oil, hp, ess_mask, inv_diag,
                               inv_mult, surf_pos, surf_loc, Jinv_z))
            tables = (led, G, oip, oil, hp)

            def f(t, y, phi_own):
                return rhs(t, y, phi_own, tables, ess_mask, inv_diag, inv_mult,
                           surf_pos, surf_loc, Jinv_z)

            (t, y, phi), _ = rk4_run(f, y0, phi0, t0, dt, n_steps)
            return t, y, phi[None]

        sharded = P("shard")
        rep = P()
        fn = jax.shard_map(
            device_fn, mesh=self.mesh,
            in_specs=(rep, sharded, sharded, sharded, sharded, sharded, sharded,
                      sharded, sharded, sharded, sharded, sharded, sharded),
            out_specs=(rep, rep, sharded),
            check_vma=False,
        )
        fn = jax.jit(fn)

        def call(y0, phi0):
            return fn(y0, phi0, self.led, self.G, self.own_if_pos,
                      self.own_if_loc, self.halo_pos, self.ess_mask,
                      self.inv_diag, self.inv_mult, self.surf_pos,
                      self.surf_loc, self.Jinv_z)

        self._compiled[key] = call
        return call(y0, phi0)

    def phi_global(self, phi_stacked) -> np.ndarray:
        return self.pt.unstack_dof(np.asarray(phi_stacked))
