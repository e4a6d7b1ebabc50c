"""Sharded periodic-x fused stepping: the Bloch wrap as a ring.

Single-device, the x wrap is driven through a dead ghost plane + a
redundantly recomputed wrap carry (ops/pallas/periodicx.PeriodicXKernel).
Sharded, the wrap is just ONE MORE shard boundary: the ppermute
topology closes into a ring (shard n-1's right neighbor is shard 0) and
every wrap-crossing quantity carries the Bloch phase — the reference's
per-chunk kernels + boundary connections with CONNECT_PHASE on the
wrapped connection (step.cpp:226-288, boundaries.cpp:347), here over
ICI instead of MPI.

Three deltas vs the aperiodic ShardedFdtd3d (all under its `_ring`
attribute):
  * shard n-1's dead plane (global x = num0) is refreshed each step
    with phase * shard 0's plane-0 raw storage (ring bwd ppermute), and
    u(num0) := u(0) is pinned so the in-kernel E_eff assembly of the
    ghost equals phase * E_eff(0);
  * the right-going boundary package of shard n-1 ships its last LIVE
    plane (num0 - 1), and shard 0's carry recompute closes the wrap:
    forward neighbor = phase * own plane 0, result scaled by 1/phase;
  * no physical-wall zeroing on the wrapped exchanges.

Envelope: periodic_supported (real +-1 phase, x-periodic only) x the
sharded envelope with allow_periodic_x, linear media (first landing:
no dispersive window), and the last live plane resident on the last
shard.  Equivalence vs the jnp SPMD stepper: test_periodic_ring.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.pallas import fdtd3d as F1
from ..ops.pallas.periodicx import periodic_supported
from .fused_mesh import ShardedFdtd3d, _fit_bx, sharded_supported


def sharded_periodic_supported(plan, n_shards: int,
                               bx: Optional[int] = None) -> bool:
    """Envelope for the ring driver."""
    if not plan.periodic[0] or any(plan.periodic[1:]):
        return False
    if F1._has_disp(plan):
        return False
    if not periodic_supported(plan, bx):
        return False
    if not sharded_supported(plan, n_shards, bx, allow_periodic_x=True):
        return False
    bxx = _fit_bx(plan, n_shards, allow_periodic_x=True) \
        if bx is None else bx
    if bxx is None:
        return False
    S = tuple(plan.storage_shape or plan.gv.shape)
    span = S[0] // n_shards
    num0 = plan.gv.num[0]
    # the last live plane (num0-1) and the dead plane (num0) must both
    # live on the LAST shard
    if num0 - 1 < (n_shards - 1) * span:
        return False
    return True


class ShardedPeriodicX(ShardedFdtd3d):
    """Ring-topology shard_map driver for x-periodic plans."""

    def __init__(self, plan, mesh: Mesh, bx: Optional[int] = None):
        n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if not sharded_periodic_supported(plan, n, bx):
            raise ValueError("plan outside the sharded periodic envelope")
        super().__init__(plan, mesh, bx, allow_periodic_x=True)
        L = self.Lg
        num0 = plan.gv.num[0]
        self.num0 = num0
        self._ring = True
        self._ph = float(np.real(plan.bloch_phase[0]))
        self._xbl = num0 - 1 - (self.n - 1) * self.span
        self._deadl = num0 - (self.n - 1) * self.span
        # dead-plane refresh keys (cf. PeriodicXKernel.make_step)
        self._ghost_dc = [L.eh_by_ec[ec].dc for ec in self.halo_keys]
        self._ghost_wst = []
        for ec in self.halo_keys:
            if ec in L.eh_store:
                ax, lor, hir = L.eh_store[ec]
                if ax != 0:
                    self._ghost_wst += [
                        L.key("eh", ec, side)
                        for side, (a, b) in (("lo", lor), ("hi", hir))
                        if b > a]
        # shard 0's boundary-coef entry = the wrap plane num0 - 1
        for k in list(self.bcoef):
            arr = plan.coefs[k]
            if getattr(arr, "ndim", 0) == 3 and arr.shape[0] == L.S[0]:
                self.bcoef[k] = self.bcoef[k].at[0].set(
                    jnp.asarray(arr[num0 - 1:num0]))
        # pin u(num0) := u(0): the ghost's in-kernel E_eff assembly then
        # yields phase * E_eff(0) (the dead plane is masked on output)
        for s in L.ehs:
            if s.has_u:
                k = f"{s.ec}:u"
                arr = plan.coefs[k]
                if getattr(arr, "ndim", 0) == 3 \
                        and arr.shape[0] == L.S[0]:
                    plan.coefs[k] = arr.at[num0].set(arr[0])

    def to_full(self, state, C=None):
        """jnp-state parity: kill the wrap-ghost residue on the dead x
        planes (the jnp path masks them every step)."""
        full = super().to_full(state, C)
        num0 = self.num0
        for fam in ("f", "f_u", "f_w"):
            d = full.get(fam)
            if not d:
                continue
            full[fam] = {k: v.at[num0:].set(0.0) if v.shape[0] > num0
                         else v for k, v in d.items()}
        return full


# ---------------------------------------------------------------------------
# arbitrary-k_x Bloch: the pair-channel ring
# ---------------------------------------------------------------------------


def sharded_pair_periodic_supported(plan, n_shards: int,
                                    bx: Optional[int] = None) -> bool:
    """Envelope: real-pair plan whose ONLY complex coupling is the x
    Bloch phase (ops/pallas/periodicx.pair_periodic_supported), with the
    neutral-phase real view inside the ring envelope."""
    from ..ops.pallas.periodicx import _real_view
    if not (getattr(plan, "real_pair", False) and plan.complex_fields):
        return False
    if not plan.periodic[0] or any(plan.periodic[1:]):
        return False
    ph = complex(plan.bloch_phase[0])
    if abs(abs(ph) - 1.0) > 1e-9:
        return False
    return sharded_periodic_supported(_real_view(plan), n_shards, bx)


class ShardedPairPeriodicX(ShardedPeriodicX):
    """Arbitrary-k_x Bloch stepping over the shard ring: two real
    channels (re, im) advanced by the SAME per-shard kernel; every
    wrap-crossing exchange (dead-plane refresh, boundary carry, its
    forward-neighbor plane) rotates the channels by the 2x2 of the
    complex phase — the sharded composition of
    ops/pallas/periodicx.PairPeriodicXKernel and ShardedPeriodicX."""

    def __init__(self, plan, mesh: Mesh, bx: Optional[int] = None):
        from ..ops.pallas.periodicx import _real_view
        n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if not sharded_pair_periodic_supported(plan, n, bx):
            raise ValueError("plan outside the sharded pair-ring envelope")
        self.cplan = plan
        super().__init__(_real_view(plan), mesh, bx)
        ph = complex(plan.bloch_phase[0])
        self._a, self._b = float(ph.real), float(ph.imag)

    # ---- channel-stacked state ------------------------------------------
    def init_state(self):
        return {"re": super().init_state(), "im": super().init_state()}

    @staticmethod
    def _split(full, i):
        def leaf(v):
            if hasattr(v, "ndim") and v.ndim == 4 and v.shape[0] == 2:
                return v[i]
            return v
        return jax.tree.map(leaf, {k: v for k, v in full.items()
                                   if k != "dft"})

    def from_full(self, full):
        return {"re": super().from_full(self._split(full, 0)),
                "im": super().from_full(self._split(full, 1))}

    def to_full(self, state, C=None):
        fr = super().to_full(state["re"], C)
        fi = super().to_full(state["im"], C)

        def leaf(x, y):
            if hasattr(x, "ndim") and x.ndim >= 3:
                return jnp.stack([x, y])
            return x
        return jax.tree.map(leaf, fr, fi)

    # ---- the pair step ----------------------------------------------------
    def make_step(self):
        plan, Lg, Ll = self.plan, self.Lg, self.Ll
        bx, span, n, axis = self.bx, self.span, self.n, self.axis
        Y, Z = Lg.S[1], Lg.S[2]
        dtype = plan.dtype
        call = self.call
        a, b = self._a, self._b
        xbl, deadl = self._xbl, self._deadl
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [((i + 1) % n, i) for i in range(n)]
        from .fused_mesh import compute_halos, compute_nl_halos

        def pkg_of(state_l, C_l, x):
            p = {}
            for ecn in self.e_need:
                p[f"e:{ecn}"] = self._e_eff_plane(state_l, C_l, ecn, x)
            for c in self.pkg_b:
                p[f"b:{c}"] = state_l[c][x:x + 1]
            for (c, side, fax, aa, bb) in self.pkg_fu:
                p[f"fu:{c}:{side}"] = state_l[Lg.key("fu", c, side)][
                    x:x + 1]
            for (ec, side, ax, aa, bb) in self.pkg_wst:
                p[f"w:{ec}:{side}"] = state_l[Lg.key("eh", ec, side)][
                    x:x + 1]
            return p

        def local_step(st_re, st_im, xs_re, xs_im, C_l, bc):
            idx = jax.lax.axis_index(axis)
            st_re, st_im = dict(st_re), dict(st_im)
            # ---- dead-plane refresh, channel-mixed -----------------------
            keys0 = self._ghost_dc + self._ghost_wst
            ship = {f"r:{k}": st_re[k][0:1] for k in keys0}
            ship.update({f"i:{k}": st_im[k][0:1] for k in keys0})
            recv0 = {k: jax.lax.ppermute(v, axis, bwd)
                     for k, v in ship.items()}
            for k in keys0:
                r0, i0 = recv0[f"r:{k}"], recv0[f"i:{k}"]
                cr = st_re[k][deadl:deadl + 1]
                ci = st_im[k][deadl:deadl + 1]
                st_re[k] = st_re[k].at[deadl:deadl + 1].set(
                    jnp.where(idx == n - 1, a * r0 - b * i0, cr))
                st_im[k] = st_im[k].at[deadl:deadl + 1].set(
                    jnp.where(idx == n - 1, b * r0 + a * i0, ci))

            # ---- boundary packages (fwd ring, unmixed) -------------------
            def ring_pkg(st):
                pkg = pkg_of(st, C_l, span - 1)
                if xbl != span - 1:
                    live = pkg_of(st, C_l, xbl)
                    pkg = {k: jnp.where(idx == n - 1, live[k], v)
                           for k, v in pkg.items()}
                return {k: jax.lax.ppermute(v, axis, fwd)
                        for k, v in pkg.items()}

            recv_re = ring_pkg(st_re)
            recv_im = ring_pkg(st_im)

            e0r = {ecn: self._e_eff_plane(st_re, C_l, ecn, 0)
                   for ecn in self.e_need}
            e0i = {ecn: self._e_eff_plane(st_im, C_l, ecn, 0)
                   for ecn in self.e_need}
            # carry recompute's forward neighbor: ph * plane 0 at the
            # wrap (shard 0), the plain plane 0 elsewhere
            ef_re = {g: jnp.where(idx == 0, a * e0r[g] - b * e0i[g],
                                  e0r[g]) for g in self.e_need}
            ef_im = {g: jnp.where(idx == 0, b * e0r[g] + a * e0i[g],
                                  e0i[g]) for g in self.e_need}
            h_re = self._carry_plane(recv_re, ef_re, bc, C_l)
            h_im = self._carry_plane(recv_im, ef_im, bc, C_l)
            carry_re, carry_im = {}, {}
            for g in self.carry_keys:
                if g not in h_re:
                    carry_re[g] = jnp.zeros((1, Y, Z), dtype)
                    carry_im[g] = jnp.zeros((1, Y, Z), dtype)
                    continue
                # ph^-1 rotation at the wrap only
                carry_re[g] = jnp.where(
                    idx == 0, a * h_re[g] + b * h_im[g],
                    h_re[g]).astype(dtype)
                carry_im[g] = jnp.where(
                    idx == 0, a * h_im[g] - b * h_re[g],
                    h_im[g]).astype(dtype)

            # ---- halos (channel-diagonal; ring bwd of plane-0 E_eff) -----
            def halos_of(st, e0):
                hl = compute_halos(Ll, bx, self.halo_keys, st, C_l)
                er = {ecn: jax.lax.ppermute(e0[ecn], axis, bwd)
                      for ecn in self.halo_keys}
                for ecn in self.halo_keys:
                    hl[ecn] = hl[ecn].at[-1:].set(
                        jnp.where(idx == n - 1, 0.0,
                                  er[ecn]).astype(dtype))
                if call.nlh_keys:
                    hl = {**hl, **compute_nl_halos(Ll, bx, call.nlh_keys,
                                                   st, C_l)}
                return hl

            st_re, _ = call(st_re, halos_of(st_re, e0r), carry_re, C_l,
                            xs_re)
            st_im, _ = call(st_im, halos_of(st_im, e0i), carry_im, C_l,
                            xs_im)
            return st_re, st_im

        try:
            from jax import shard_map as _sm

            def shard_map(f, mesh, in_specs, out_specs, **_):
                return _sm(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map

        csh = self.coef_sharding()
        cspecs = {k: s.spec for k, s in csh.items()}
        from jax.sharding import PartitionSpec as P
        bspecs = {k: (P(axis) if v.ndim == 4 else P())
                  for k, v in self.bcoef.items()}

        def step(state2, x_t, C):
            ssh = self.state_sharding(state2["re"])
            sspecs = jax.tree.map(lambda s: s.spec, ssh)
            xs = {k: jnp.asarray(x_t[k], dtype).reshape(1, 1)
                  for k in call.xs_keys if k != "xoff"}

            def wrapped(st_re, st_im, C_l, bc_l):
                i = jax.lax.axis_index(axis)
                xoff = (i * span).reshape(1, 1).astype(jnp.int32)
                xs2 = {**xs, "xoff": xoff}
                return local_step(st_re, st_im, xs2, xs2, C_l, bc_l)

            sm = shard_map(
                wrapped, mesh=self.mesh,
                in_specs=(sspecs, sspecs, cspecs, bspecs),
                out_specs=(sspecs, sspecs),
                check_rep=False)
            new_re, new_im = sm(state2["re"], state2["im"], C, self.bcoef)
            # post-kernel scatter: Re[w a] into the re channel,
            # Im[w a] into the im channel (the complex current split)
            self._scatter_sources(new_re, x_t, C)
            self._scatter_sources(new_im, x_t, C, imag=True)
            new_re["t"] = state2["re"]["t"] + 1
            new_im["t"] = state2["im"]["t"] + 1
            return {"re": new_re, "im": new_im}

        return step

    def run(self, state, nsteps: int, t0: int = 0):
        from ..stepper.step import build_xs
        step = self.make_step()
        xs_all = build_xs(self.plan, nsteps, t0)
        csh = self.coef_sharding()
        C = {k: jax.device_put(v, csh[k])
             for k, v in self.plan.coefs.items()}
        ssh = self.state_sharding(state["re"])
        state = {c: jax.tree.map(jax.device_put, state[c], ssh)
                 for c in ("re", "im")}

        def runner(state, xs, C):
            def body(carry, x):
                return step(carry, x, C), None
            state, _ = jax.lax.scan(body, state, xs, length=nsteps)
            return state

        return jax.jit(runner)(state, xs_all, C)
