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
