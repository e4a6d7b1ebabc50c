"""Sharded fused FDTD stepping: the Mosaic kernel inside shard_map.

The jnp sharded path (parallel/mesh.py) relies on XLA's SPMD partitioner
to insert halo exchanges around shifted slices — correct, but it runs the
~10x-slower jnp stepper per chip.  This module runs the production fused
kernel (ops/pallas/fdtd3d.py) PER SHARD with explicit width-1 halo
exchange over the mesh, the analog of the reference's per-chunk kernels +
comms (src/step.cpp:226-288, boundaries.cpp:581-622):

  * the grid is sharded along x (the kernel's sweep axis) into equal
    block-aligned spans; every shard runs the SAME uniform call
    (_Layout(x_uniform=True): x-compact PML aux widened to full-x so the
    lo/mid/hi structural split disappears — identity chains keep the
    invariants, SPMD requires one program);
  * per step, one ppermute each way: the right-going package carries the
    shard's LAST planes of (E_eff, B, fu, H W-store) — everything the
    right neighbor needs to redundantly recompute H_eff^{new} at its
    left boundary plane (the D half's backward-difference carry, i.e.
    the kernel's carry_in); the left-going message is the shard's first
    E_eff plane (the B half's forward-halo terminator);
  * x-plane masks take the shard's global offset as a scalar kernel
    input; sources (E-family, outside the PML slabs) are scattered into
    D after the kernel — exact, since E outside the W slabs is virtual
    (recomputed from D next step).

Supported envelope: the linear fdtd3d envelope (no dispersive window),
E-family non-integrated sources clear of every PML slab range.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas import fdtd3d as F1
from ..ops.pallas.fdtd3d import (_Layout, _build_call, compute_halos,
                                 compute_nl_halos)
from ..stepper.step import build_xs


def _fit_bx(plan, n_shards: int, allow_periodic_x: bool = False
            ) -> Optional[int]:
    """Largest kernel block depth that divides the per-shard span with
    >= 2 blocks per shard (halving down from the single-device pick:
    per-shard spans are n times narrower than the full grid)."""
    cand = F1._pick_bx(plan, None)
    S = tuple(plan.storage_shape or plan.gv.shape)
    if S[0] % n_shards:
        return None
    span = S[0] // n_shards
    while cand >= 2:
        if span % cand == 0 and span >= 2 * cand \
                and F1.supported(plan, cand,
                                 allow_periodic_x=allow_periodic_x):
            return cand
        cand //= 2
    return None


def _nl_clear_of_boundaries(plan, n_shards: int) -> bool:
    """NL (chi3/chi2-NR) support must stay clear of every interior shard
    boundary: the cross-block NL halo/carry planes are local zero-padded
    at shard edges, which is exact only when no NL stencil column
    consumes them (pol ADEs are pointwise — they shard anywhere)."""
    boxes = getattr(plan, "support_boxes", None) or {}
    S = tuple(plan.storage_shape or plan.gv.shape)
    span = S[0] // n_shards
    for s in plan.eh_specs_e:
        keys = []
        if s.has_chi3:
            keys += [f"{s.ec}:chi3", f"{s.ec}:chi2"]
        if s.has_nr:
            keys += [f"{s.ec}:nrchi2"]
        for key in keys:
            b = boxes.get(key)
            if b is None:
                continue
            x0, x1 = b[0]
            for g in range(span, S[0], span):
                if x0 - 3 <= g <= x1 + 3:
                    return False
    return True


def sharded_supported(plan, n_shards: int, bx: Optional[int] = None,
                      allow_periodic_x: bool = False) -> bool:
    """Envelope check for the shard_map fused path.  With bx=None the
    block depth is auto-fitted to the per-shard span (_fit_bx)."""
    if bx is None:
        bx = _fit_bx(plan, n_shards, allow_periodic_x=allow_periodic_x)
        if bx is None:
            return False
    if not F1.supported(plan, bx, allow_periodic_x=allow_periodic_x):
        return False
    if getattr(plan, "mirror_node", ()):
        # the boundary-strip recompute primitives (ops/pallas/strip.py)
        # have no node-mirror ghost support yet; mirrored plans shard on
        # the jnp SPMD path
        return False
    S = tuple(plan.storage_shape or plan.gv.shape)
    span = S[0] // n_shards
    if S[0] % n_shards or span % bx or span < 2 * bx:
        return False
    if F1._has_disp(plan) and not _nl_clear_of_boundaries(plan, n_shards):
        return False
    # sources: E-family only, outside every true PML slab range (the
    # post-kernel scatter is exact only where E is virtual)
    slab_lo = [0, 0, 0]
    slab_hi = [0, 0, 0]

    def claim(ax, slabs):
        if ax is not None and slabs is not None:
            slab_lo[ax] = max(slab_lo[ax], slabs[0])
            slab_hi[ax] = max(slab_hi[ax], slabs[1])

    for s in plan.curl_specs_d + plan.curl_specs_b:
        claim(s.dsig_axis, s.dsig_slabs)
        claim(s.dsigu_axis, s.dsigu_slabs)
    for s in plan.eh_specs_e + plan.eh_specs_h:
        claim(s.dsigw_axis, s.dsigw_slabs)
    n_sites = [plan.gv.num[a] + 1 for a in range(3)]
    for s in plan.sources:
        if s.component[0] != "e":
            return False
        for pt in np.asarray(s.indices):
            for ax in range(3):
                if pt[ax] < slab_lo[ax] or pt[ax] >= n_sites[ax] - slab_hi[ax]:
                    return False
    try:
        _Layout(plan, bx, x_uniform=True)
    except ValueError:
        return False
    return True


def boundary_statics(plan, L, carry_keys):
    """Static description of a width-1 x-boundary's right-going package
    (which comps/arrays the left side must ship so the right side can
    redundantly recompute H_eff^new at the boundary plane).  Shared by
    the sharded driver below and the periodic-x wrap driver
    (ops/pallas/periodicx.py).  Returns (b_specs, e_need, pkg_b, pkg_fu,
    pkg_wst, bcoef_keys)."""
    b_specs = [s for s in plan.curl_specs_b if s.ec in carry_keys]
    e_need: List[str] = []
    for s in b_specs:
        for g in (s.g_plus, s.g_minus):
            if g is not None and g not in e_need:
                e_need.append(g)
    pkg_b = [s.c for s in b_specs]
    pkg_fu = []
    for s in b_specs:
        if s.c in L.fu:
            ax, lor, hir = L.fu[s.c]
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    pkg_fu.append((s.c, side, ax, a, b))
    pkg_wst = []
    for ec in carry_keys:
        if ec in L.eh_store:
            ax, lor, hir = L.eh_store[ec]
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    pkg_wst.append((ec, side, ax, a, b))
    keys: List[str] = []
    for s in b_specs:
        c = s.c
        if s.dsig_axis is not None:
            keys += [f"{c}:sig", f"{c}:kap", f"{c}:siginv"]
        if s.dsigu_axis is not None:
            keys += [f"{c}:sigu", f"{c}:kapu", f"{c}:siginvu"]
    for ec in carry_keys:
        if f"{ec}:u" in plan.coefs:
            keys.append(f"{ec}:u")
        if f"{ec}:kapw" in plan.coefs:
            keys += [f"{ec}:kapw", f"{ec}:sigw"]
    return (b_specs, e_need, pkg_b, pkg_fu, pkg_wst,
            list(dict.fromkeys(keys)))


def e_eff_plane(plan, L, state, C, ec, x):
    """Assembled E_eff at one x plane (overlays included, in to_full's
    order: stored-E dispersive window first, W-store on top — identity
    rows agree, true rows never overlap)."""
    spec = L.eh_by_ec[ec]
    d = state[spec.dc][x:x + 1]
    lin = d * C[f"{ec}:u"][x:x + 1] if spec.has_u else d
    if L.disp is not None and ec in L.de_comps:
        a, b = L.disp_range()
        if a <= x < b:
            wy0, wy1 = L.win_y
            lin = lin.at[:, wy0:wy1, :].set(state[f"de:{ec}"][x - a:x - a + 1])
    if ec in L.eh_store:
        ax, lor, hir = L.eh_store[ec]
        if ax == 0:
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if a <= x < b:
                    lin = state[L.key("eh", ec, side)][x - a:x - a + 1]
        else:
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    sl = [slice(None)] * 3
                    sl[ax] = slice(a, b)
                    lin = lin.at[tuple(sl)].set(
                        state[L.key("eh", ec, side)][x:x + 1])
    return lin


def carry_plane(plan, L, b_specs, pkg_fu, recv, e_first, bplane):
    """Redundantly recompute H_eff^{new} at an x-boundary plane from the
    received package — the full B-half update (curl + dsig/dsigu chains
    + W chain) on one plane; mirrors the kernel's half(is_d=False).
    `bplane(key)` returns the boundary plane of coefficient `key`."""
    dtdx = plan.courant

    def shift_yz(a, axis, by):
        pad = [(0, 0)] * 3
        slc = [slice(None)] * 3
        if by > 0:
            pad[axis] = (0, by)
            slc[axis] = slice(by, None)
        else:
            pad[axis] = (-by, 0)
            slc[axis] = slice(None, by)
        return jnp.pad(a[tuple(slc)], pad)

    h_eff = {}
    for s in b_specs:
        def diff(gname, axis):
            if axis == 0:
                return e_first[gname] - recv[f"e:{gname}"]
            g = recv[f"e:{gname}"]
            return shift_yz(g, axis, +1) - g
        total = None
        if s.g_plus is not None:
            total = diff(s.g_plus, s.plus_axis)
        if s.g_minus is not None:
            t2 = diff(s.g_minus, s.minus_axis)
            total = -t2 if total is None else total - t2
        dfl = -dtdx * total
        c = s.c
        f_old = recv[f"b:{c}"]

        def chain1(gval, dflv):
            if s.dsig_axis is None:
                return gval + dflv
            return ((bplane(f"{c}:kap") - bplane(f"{c}:sig")) * gval
                    + dflv) * bplane(f"{c}:siginv")

        if s.dsigu_axis is None:
            b_new = chain1(f_old, dfl)
        else:
            # reconstruct the full-plane fu from the slab pieces
            # (fu == f on the identity rows)
            fu_old = f_old
            for (cc, side, fax, a, b) in pkg_fu:
                if cc != c:
                    continue
                if fax == 0:
                    fu_old = recv[f"fu:{c}:{side}"]
                else:
                    sl = [slice(None)] * 3
                    sl[fax] = slice(a, b)
                    fu_old = fu_old.at[tuple(sl)].set(
                        recv[f"fu:{c}:{side}"])
            fu_new = chain1(fu_old, dfl)
            b_new = bplane(f"{c}:siginvu") * (
                (bplane(f"{c}:kapu") - bplane(f"{c}:sigu")) * f_old
                + fu_new - fu_old)
        # y/z plane masks at the boundary plane
        for ax, i in plan.mask_planes.get(c, []):
            if ax == 0:
                continue       # x-boundary planes are x-interior/wrap
            nax = b_new.shape[ax]
            io = jax.lax.iota(jnp.int32, nax)
            shp = [1, 1, 1]
            shp[ax] = nax
            b_new = b_new * (io != i).reshape(shp).astype(b_new.dtype)
        ec = s.ec
        u = bplane(f"{ec}:u") if f"{ec}:u" in plan.coefs else None
        lin_new = b_new * u if u is not None else b_new
        lin_old = f_old * u if u is not None else f_old
        h = lin_new
        if ec in L.eh_store:
            ax, lor, hir = L.eh_store[ec]
            kw = bplane(f"{ec}:kapw")
            sw = bplane(f"{ec}:sigw")
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b <= a or ax == 0:
                    continue
                sl = [slice(None)] * 3
                sl[ax] = slice(a, b)
                sl = tuple(sl)
                ksl = tuple(
                    s_ if kw.shape[i_] > 1 else slice(None)
                    for i_, s_ in enumerate(sl))
                e_old = recv[f"w:{ec}:{side}"]
                e_new = e_old + (kw[ksl] + sw[ksl]) * lin_new[sl] \
                    - (kw[ksl] - sw[ksl]) * lin_old[sl]
                h = h.at[sl].set(e_new)
        h_eff[ec] = h
    return h_eff


def sharded_hybrid_run(plan, mesh: Mesh, state: Dict[str, Any],
                       nsteps: int, t0: int) -> Optional[Dict[str, Any]]:
    """Monitored sharded run: the per-shard fused kernel between DFT
    sample steps, with the sample step's DTFT accumulated from the
    read-only to_full view — the ops/pallas/hybrid.py cycle pattern
    under SPMD (field leaves sharded along x, DFT accumulators
    replicated; the accumulator reduction is the sum_to_all analog,
    dft.cpp:543).  Returns the advanced FULL state, or None when the
    sampling isn't uniformly spaced (caller falls back to jnp SPMD)."""
    from ..ops.pallas.hybrid import cycle_structure
    from ..stepper.step import _dft_update
    from . import mesh as PM

    cs = cycle_structure(plan, t0, nsteps)
    if cs is None:
        return None
    prefix, d, ncyc, suffix = cs
    # to_full/from_full produce slab-semantic aux state; any jnp
    # prefix/suffix steps must use the slab-local path (see hybrid.py)
    plan.slab_opt = True
    sk = ShardedFdtd3d(plan, mesh)
    step = sk.make_step()
    # depth-2 halo-in-time pairs inside each cycle when the plan fits
    # (the single-device hybrid's 2/1-step mix under SPMD)
    step2 = None
    npair2 = 0
    if d >= 2:
        try:
            from .fused_mesh_t2 import (ShardedFdtd3dT2,
                                        sharded_t2_supported)
            if sharded_t2_supported(plan, sk.n, sk.bx):
                sk2 = ShardedFdtd3dT2(plan, mesh, bx=sk.bx)
                step2 = sk2.make_step()
                npair2 = d // 2
        except Exception:                  # noqa: BLE001
            step2 = None
            npair2 = 0

    t = t0
    if prefix:
        state = PM.sharded_run(plan, mesh, state, prefix,
                               prefer_fused=False)
        t += prefix

    xs_full = build_xs(plan, ncyc * d, t)
    xs_cyc = {k: np.asarray(v).reshape((ncyc, d) + np.asarray(v).shape[1:])
              for k, v in xs_full.items()}

    def runner(full_state, xs, C):
        comp0 = sk.from_full(full_state)

        def body(carry, xc):
            comp, dft = carry
            if step2 is not None:
                for q in range(npair2):
                    comp = step2(comp,
                                 {k: xc[k][2 * q:2 * q + 2] for k in xc},
                                 C)
                for j in range(2 * npair2, d):
                    comp = step(comp, {k: xc[k][j] for k in xc}, C)
            else:
                for j in range(d):
                    comp = step(comp, {k: xc[k][j] for k in xc}, C)
            # DFT-only sample from the read-only full view (E at
            # (t+1)dt, H at (t+1/2)dt == the jnp in-step sampling)
            full = sk.to_full(comp, C)
            x_last = {k: xc[k][d - 1] for k in xc}
            dft = _dft_update(plan, C, {"f": full["f"], "dft": dft},
                              x_last)["dft"]
            return (comp, dft), None

        (comp, dft), _ = jax.lax.scan(body, (comp0, full_state["dft"]),
                                      xs, length=ncyc)
        full = sk.to_full(comp, C)
        full["dft"] = dft
        return full

    csh = sk.coef_sharding()
    C = {k: jax.device_put(v, csh[k]) for k, v in plan.coefs.items()}
    ssh = PM.state_shardings(plan, mesh, state)
    state = jax.tree.map(jax.device_put, state, ssh)
    out = jax.jit(runner)(state, xs_cyc, C)
    keep = ["f", "f_u", "f_w", "dft"] + (["pol"] if out.get("pol") else [])
    state = {**state, **{k: out[k] for k in keep}, "t": out["t"]}
    t += ncyc * d
    if suffix:
        state = PM.sharded_run(plan, mesh, state, suffix,
                               prefer_fused=False)
    return state


class ShardedFdtd3d:
    """shard_map driver for the fused kernel over a 1-d x mesh."""

    def __init__(self, plan, mesh: Mesh, bx: Optional[int] = None,
                 z_full: bool = None, allow_periodic_x: bool = False):
        n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if len(mesh.axis_names) != 1:
            raise ValueError("sharded fused kernel: 1-d mesh along x")
        self.axis = mesh.axis_names[0]
        bx = _fit_bx(plan, n, allow_periodic_x=allow_periodic_x) \
            if bx is None else F1._pick_bx(plan, bx)
        if bx is None or not sharded_supported(
                plan, n, bx, allow_periodic_x=allow_periodic_x):
            raise ValueError("plan outside the sharded fused envelope")
        if z_full is None:
            z_full = True
        self.plan = plan
        self.mesh = mesh
        self.n = n
        self.bx = bx
        # global layout (state construction / conversions) and the local
        # per-shard layout the uniform call is built against
        self.Lg = _Layout(plan, bx, z_full=z_full, x_uniform=True)
        S = self.Lg.S
        self.span = S[0] // n
        # local coef SHAPE views: the call builder specializes BlockSpecs
        # on coef shapes, which are per-shard blocks under shard_map
        lcoefs = {}
        for k, v in plan.coefs.items():
            shp = tuple(v.shape)
            if len(shp) == 3 and shp[0] == S[0]:
                shp = (self.span,) + shp[1:]
            lcoefs[k] = jax.ShapeDtypeStruct(shp, v.dtype)
        lplan = dataclasses.replace(
            plan, storage_shape=(self.span,) + tuple(S[1:]), coefs=lcoefs)
        self.Ll = _Layout(lplan, bx, z_full=z_full, x_uniform=True)
        nblk_l = self.span // bx
        self.call = _build_call(self.Ll, 0, nblk_l,
                                "lo" if self.Ll.lo_blocks else "",
                                disp=self.Ll.disp is not None,
                                dyn_xoff=True, with_sources=False)
        self.halo_keys = list(self.call.halo_keys)
        self.carry_keys = list(self.call.carry_keys)
        self._prep_boundary_statics()

    # ------------------------------------------------------------------
    def init_state(self):
        return self.Lg.init_state(self.plan.dtype)

    def state_sharding(self, state):
        spec = P(self.axis)
        fs = NamedSharding(self.mesh, spec)
        rep = NamedSharding(self.mesh, P())
        S0 = self.Lg.S[0]

        def assign(arr):
            shape = tuple(getattr(arr, "shape", ()))
            if shape and shape[0] == S0:
                return fs
            return rep
        return jax.tree.map(assign, state)

    def coef_sharding(self):
        fs = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())
        S0 = self.Lg.S[0]
        return {k: (fs if getattr(v, "ndim", 0) == 3 and v.shape[0] == S0
                    else rep)
                for k, v in self.plan.coefs.items()}

    # ------------------------------------------------------------------
    def _prep_boundary_statics(self):
        """Which comps/arrays ride in the right-going boundary package,
        and the per-shard boundary-plane coefficient stacks."""
        plan, Lg = self.plan, self.Lg
        # carry H comps and the B curls that produce them
        self.b_specs = [s for s in plan.curl_specs_b
                        if s.ec in self.carry_keys]
        self.e_need: List[str] = []          # E_eff comps the B curls read
        for s in self.b_specs:
            for g in (s.g_plus, s.g_minus):
                if g is not None and g not in self.e_need:
                    self.e_need.append(g)
        # package keys: E_eff planes, B planes, fu planes, H W-store rows
        self.pkg_b = [s.c for s in self.b_specs]
        # fu planes: (comp, side, axis, lo, hi); y/z-compact slabs are
        # reconstructed onto the full plane via fu == f outside
        self.pkg_fu = []
        for s in self.b_specs:
            if s.c in Lg.fu:
                ax, lor, hir = Lg.fu[s.c]
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        self.pkg_fu.append((s.c, side, ax, a, b))
        self.pkg_wst = []                    # (ec, side) H store arrays
        for ec in self.carry_keys:
            if ec in Lg.eh_store:
                ax, lor, hir = Lg.eh_store[ec]
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        self.pkg_wst.append((ec, side, ax, a, b))
        # boundary coef planes: stacked (n, ...) per shard; entry s holds
        # the plane at global x = s*span - 1 (entry 0 unused)
        keys = []
        for s in self.b_specs:
            c = s.c
            if s.dsig_axis is not None:
                keys += [f"{c}:sig", f"{c}:kap", f"{c}:siginv"]
            if s.dsigu_axis is not None:
                keys += [f"{c}:sigu", f"{c}:kapu", f"{c}:siginvu"]
        for ec in self.carry_keys:
            if f"{ec}:u" in plan.coefs:
                keys.append(f"{ec}:u")
            if f"{ec}:kapw" in plan.coefs:
                keys += [f"{ec}:kapw", f"{ec}:sigw"]
        self.bcoef = {}
        for k in dict.fromkeys(keys):
            arr = np.asarray(plan.coefs[k])
            if arr.ndim == 3 and arr.shape[0] == self.Lg.S[0]:
                planes = [np.zeros_like(arr[0:1])]
                for s in range(1, self.n):
                    planes.append(arr[s * self.span - 1:s * self.span])
                self.bcoef[k] = jnp.asarray(np.stack(planes))  # (n,1,Y,Z)
            else:
                self.bcoef[k] = jnp.asarray(arr)               # replicated

    # ------------------------------------------------------------------
    def _e_eff_plane(self, state_l, C_l, ec, x):
        """Assembled E_eff at one local plane (overlays included, in
        to_full's order: stored-E dispersive window first, W-store on
        top — identity rows agree, true rows never overlap)."""
        spec = self.Lg.eh_by_ec[ec]
        d = state_l[spec.dc][x:x + 1]
        lin = d * C_l[f"{ec}:u"][x:x + 1] if spec.has_u else d
        if self.Lg.disp is not None and ec in self.Lg.de_comps:
            wy0, wy1 = self.Lg.win_y
            lin = lin.at[:, wy0:wy1, :].set(state_l[f"de:{ec}"][x:x + 1])
        if ec in self.Lg.eh_store:
            ax, lor, hir = self.Lg.eh_store[ec]
            if ax == 0:
                lin = state_l[self.Lg.key("eh", ec, "lo")][x:x + 1]
            else:
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        sl = [slice(None)] * 3
                        sl[ax] = slice(a, b)
                        lin = lin.at[tuple(sl)].set(
                            state_l[self.Lg.key("eh", ec, side)][x:x + 1])
        return lin

    def _carry_plane(self, recv, e_first, bc, C_l):
        """Redundantly recompute H_eff^{new} at the left boundary plane
        (global x = shard_start - 1) from the received package — the
        full B-half update (curl + dsig/dsigu chains + W chain) on one
        plane; mirrors the kernel's half(is_d=False)."""
        plan = self.plan
        dtdx = plan.courant

        def shift_yz(a, axis, by):
            pad = [(0, 0)] * 3
            slc = [slice(None)] * 3
            if by > 0:
                pad[axis] = (0, by)
                slc[axis] = slice(by, None)
            else:
                pad[axis] = (-by, 0)
                slc[axis] = slice(None, by)
            return jnp.pad(a[tuple(slc)], pad)

        def bplane(key):
            v = bc[key]
            return v if v.ndim == 3 else v[0]    # stacked entry -> (1,Y,Z)

        h_eff = {}
        for s in self.b_specs:
            def diff(gname, axis):
                if axis == 0:
                    return e_first[gname] - recv[f"e:{gname}"]
                g = recv[f"e:{gname}"]
                return shift_yz(g, axis, +1) - g
            total = None
            if s.g_plus is not None:
                total = diff(s.g_plus, s.plus_axis)
            if s.g_minus is not None:
                t2 = diff(s.g_minus, s.minus_axis)
                total = -t2 if total is None else total - t2
            dfl = -dtdx * total
            c = s.c
            f_old = recv[f"b:{c}"]

            def chain1(gval, dflv):
                if s.dsig_axis is None:
                    return gval + dflv
                return ((bplane(f"{c}:kap") - bplane(f"{c}:sig")) * gval
                        + dflv) * bplane(f"{c}:siginv")

            if s.dsigu_axis is None:
                b_new = chain1(f_old, dfl)
            else:
                # reconstruct the full-plane fu from the slab pieces
                # (fu == f on the identity rows)
                fu_old = f_old
                for (cc, side, fax, a, b) in self.pkg_fu:
                    if cc != c:
                        continue
                    if fax == 0:
                        fu_old = recv[f"fu:{c}:{side}"]
                    else:
                        sl = [slice(None)] * 3
                        sl[fax] = slice(a, b)
                        fu_old = fu_old.at[tuple(sl)].set(
                            recv[f"fu:{c}:{side}"])
                fu_new = chain1(fu_old, dfl)
                b_new = bplane(f"{c}:siginvu") * (
                    (bplane(f"{c}:kapu") - bplane(f"{c}:sigu")) * f_old
                    + fu_new - fu_old)
            # y/z plane masks at the boundary plane
            for ax, i in plan.mask_planes.get(c, []):
                if ax == 0:
                    continue       # shard boundaries are x-interior
                nax = b_new.shape[ax]
                io = jax.lax.iota(jnp.int32, nax)
                shp = [1, 1, 1]
                shp[ax] = nax
                b_new = b_new * (io != i).reshape(shp).astype(b_new.dtype)
            ec = s.ec
            u = bplane(f"{ec}:u") if f"{ec}:u" in bc else None
            lin_new = b_new * u if u is not None else b_new
            lin_old = f_old * u if u is not None else f_old
            h = lin_new
            if ec in self.Lg.eh_store:
                ax, lor, hir = self.Lg.eh_store[ec]
                kw = bplane(f"{ec}:kapw")
                sw = bplane(f"{ec}:sigw")
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b <= a or ax == 0:
                        continue
                    sl = [slice(None)] * 3
                    sl[ax] = slice(a, b)
                    sl = tuple(sl)
                    ksl = tuple(
                        s_ if kw.shape[i_] > 1 else slice(None)
                        for i_, s_ in enumerate(sl))
                    e_old = recv[f"w:{ec}:{side}"]
                    e_new = e_old + (kw[ksl] + sw[ksl]) * lin_new[sl] \
                        - (kw[ksl] - sw[ksl]) * lin_old[sl]
                    h = h.at[sl].set(e_new)
            h_eff[ec] = h
        return h_eff

    # ------------------------------------------------------------------
    def make_step(self):
        plan = self.plan
        Lg, Ll = self.Lg, self.Ll
        bx, span, n, axis = self.bx, self.span, self.n, self.axis
        Y, Z = Lg.S[1], Lg.S[2]
        dtype = plan.dtype
        call = self.call
        # ring topology (ShardedPeriodicX): the x wrap is one more shard
        # boundary — shard n-1's right neighbor is shard 0 with the
        # Bloch phase applied on every wrap-crossing quantity
        ring = getattr(self, "_ring", False)
        ph = getattr(self, "_ph", 1.0)
        phinv = 1.0 / ph if ring else 1.0
        xbl = getattr(self, "_xbl", span - 1)     # last LIVE plane, local
        deadl = getattr(self, "_deadl", None)     # dead plane, local
        if ring:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [((i + 1) % n, i) for i in range(n)]
        else:
            fwd = [(i, i + 1) for i in range(n - 1)]   # send right
            bwd = [(i + 1, i) for i in range(n - 1)]   # send left

        def local_step(state_l, xscal, C_l, bc):
            idx = jax.lax.axis_index(axis)
            if ring:
                # wrap ghost: shard n-1's dead plane (global x = num0) is
                # refreshed with phase * shard 0's plane-0 raw storage
                # (D and W-store; E_eff assembles in-kernel with the
                # pinned u(num0) := u(0))
                ship0 = {k: state_l[k][0:1]
                         for k in self._ghost_dc + self._ghost_wst}
                recv0 = {k: jax.lax.ppermute(v, axis, bwd)
                         for k, v in ship0.items()}
                state_l = dict(state_l)
                for k, v in recv0.items():
                    cur = state_l[k][deadl:deadl + 1]
                    state_l[k] = state_l[k].at[deadl:deadl + 1].set(
                        jnp.where(idx == n - 1, ph * v, cur))

            # ---- boundary exchange (prev-step data) -------------------
            def pkg_at(x):
                p = {}
                for ecn in self.e_need:
                    p[f"e:{ecn}"] = self._e_eff_plane(state_l, C_l, ecn, x)
                for c in self.pkg_b:
                    p[f"b:{c}"] = state_l[c][x:x + 1]
                for (c, side, fax, a, b) in self.pkg_fu:
                    p[f"fu:{c}:{side}"] = state_l[Lg.key("fu", c, side)][
                        x:x + 1]
                for (ec, side, ax, a, b) in self.pkg_wst:
                    p[f"w:{ec}:{side}"] = state_l[Lg.key("eh", ec, side)][
                        x:x + 1]
                return p

            pkg = pkg_at(span - 1)
            if ring and xbl != span - 1:
                # shard n-1 ships its last LIVE plane (global num0 - 1),
                # not its last storage plane (dead/padding)
                pkg_live = pkg_at(xbl)
                pkg = {k: jnp.where(idx == n - 1, pkg_live[k], v)
                       for k, v in pkg.items()}
            recv = {k: jax.lax.ppermute(v, axis, fwd)
                    for k, v in pkg.items()}
            e_first = {ecn: self._e_eff_plane(state_l, C_l, ecn, 0)
                       for ecn in self.e_need}
            e_right = {ecn: jax.lax.ppermute(e_first[ecn], axis, bwd)
                       for ecn in self.e_need}

            # ---- halos: local strided planes + the neighbor plane -----
            halos = compute_halos(Ll, bx, self.halo_keys, state_l, C_l)
            for ecn in self.halo_keys:
                v = e_right[ecn]
                if ring:
                    # past-the-end halo is dead for the last shard (the
                    # wrap rides the refreshed dead plane instead)
                    v = jnp.where(idx == n - 1, 0.0, v).astype(dtype)
                halos[ecn] = halos[ecn].at[-1:].set(v)
            if call.nlh_keys:
                # NL next-plane halos: local, zero-padded at the shard
                # edge (exact: the envelope keeps NL support >= 3 sites
                # clear of every shard boundary, _nl_clear_of_boundaries)
                halos = {**halos, **compute_nl_halos(
                    Ll, bx, call.nlh_keys, state_l, C_l)}

            # ---- carry: redundant left-plane H_eff --------------------
            if ring:
                # shard 0's boundary plane is the wrap: its forward
                # neighbor is phase * its OWN plane 0
                e_fc = {g: jnp.where(idx == 0, ph * v, v)
                        for g, v in e_first.items()}
            else:
                e_fc = e_first
            h_left = self._carry_plane(recv, e_fc, bc, C_l)
            if ring:
                carry = {g: jnp.where(idx == 0, phinv * h_left[g],
                                      h_left[g]).astype(dtype)
                         for g in self.carry_keys if g in h_left}
            else:
                carry = {g: jnp.where(idx == 0, 0.0,
                                      h_left[g]).astype(dtype)
                         for g in self.carry_keys if g in h_left}
            for g in self.carry_keys:
                if g not in h_left:
                    carry[g] = jnp.zeros((1, Y, Z), dtype)

            state_l, _ = call(state_l, halos, carry, C_l, xscal)
            return state_l

        csh = self.coef_sharding()
        cspecs = {k: s.spec for k, s in csh.items()}
        bspecs = {k: (P(axis) if v.ndim == 4 else P())
                  for k, v in self.bcoef.items()}
        try:
            from jax import shard_map as _sm

            def shard_map(f, mesh, in_specs, out_specs, **_):
                return _sm(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        except ImportError:                     # older jax
            from jax.experimental.shard_map import shard_map

        def step(state, x_t, C):
            ssh = self.state_sharding(state)
            sspecs = jax.tree.map(lambda s: s.spec, ssh)
            xscal = {k: jnp.asarray(x_t[k], dtype).reshape(1, 1)
                     for k in call.xs_keys if k != "xoff"}
            xoff = None   # provided inside shard_map per shard

            def wrapped(state_l, C_l, bc_l):
                i = jax.lax.axis_index(axis)
                xs2 = dict(xscal)
                xs2["xoff"] = (i * span).reshape(1, 1).astype(jnp.int32)
                return local_step(state_l, xs2, C_l, bc_l)

            sm = shard_map(
                wrapped, mesh=self.mesh,
                in_specs=(sspecs, cspecs, bspecs),
                out_specs=sspecs,
                check_rep=False)
            new_state = sm(state, C, self.bcoef)
            self._scatter_sources(new_state, x_t, C)
            new_state["t"] = state["t"] + 1
            return new_state

        return step

    def _scatter_sources(self, new_state, x_t, C, imag: bool = False):
        """Post-kernel source scatter into D (in place on the dict).

        Exact because E is virtual (recomputed from D) at the source
        sites — except where an eh store array COVERS the site
        (x_uniform/z_full widened identity regions, where
        e == lin == u*d holds): those move by u * dD too.  imag=True
        injects Im[w a] instead of Re[w a] (the pair-channel drivers'
        second channel)."""
        plan, Lg = self.plan, self.Lg
        dtype = plan.dtype
        for si, s in enumerate(plan.sources):
            ec = s.component
            dc = "d" + ec[1]
            if dc not in new_state:
                continue
            kre = f"src{si}:cur_re"
            if kre not in x_t:
                continue
            w_re = jnp.asarray(x_t[kre], dtype)
            w_im = jnp.asarray(x_t[f"src{si}:cur_im"], dtype)
            a_re = C[f"src{si}:amp_re"]
            a_im = C[f"src{si}:amp_im"]
            if imag:
                amp = (w_re * a_im + w_im * a_re) * plan.dt
            else:
                amp = (w_re * a_re - w_im * a_im) * plan.dt
            idxs = C[f"src{si}:idx"]
            new_state[dc] = new_state[dc].at[tuple(idxs.T)].add(-amp)
            spec = Lg.eh_by_ec.get(ec)
            if spec is None:
                continue
            pts = np.asarray(s.indices)
            if Lg.disp is not None and ec in Lg.de_comps:
                # stored-E window fixup: E is linear in D at source
                # sites (the envelope keeps sources out of NL stencil
                # reach; pol P is unchanged by injection), so the
                # stored value moves by u * dD exactly like E
                wy0, wy1 = Lg.win_y
                insw = (pts[:, 1] >= wy0) & (pts[:, 1] < wy1)
                if insw.any():
                    wpts = pts[insw].copy()
                    wpts[:, 1] -= wy0
                    uw = C[f"{ec}:u"][tuple(pts[insw].T)] \
                        if spec.has_u else 1.0
                    new_state[f"de:{ec}"] = new_state[f"de:{ec}"].at[
                        tuple(wpts.T)].add(-amp[insw] * uw)
            if ec not in Lg.eh_store:
                continue
            ax, lor, hir = Lg.eh_store[ec]
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b <= a:
                    continue
                inside = (pts[:, ax] >= a) & (pts[:, ax] < b)
                if not inside.any():
                    continue
                key = Lg.key("eh", ec, side)
                lpts = pts[inside].copy()
                lpts[:, ax] -= a
                ui = 1.0
                if spec.has_u:
                    ui = C[f"{ec}:u"][tuple(pts[inside].T)]
                new_state[key] = new_state[key].at[
                    tuple(lpts.T)].add(-amp[inside] * ui)

    def run(self, state, nsteps: int, t0: int = 0):
        xs_all = build_xs(self.plan, nsteps, t0)
        step = self.make_step()

        def runner(state, xs, C):
            def body(carry, x):
                return step(carry, x, C), None
            state, _ = jax.lax.scan(body, state, xs, length=nsteps)
            return state

        csh = self.coef_sharding()
        C = {k: jax.device_put(v, csh[k])
             for k, v in self.plan.coefs.items()}
        ssh = self.state_sharding(state)
        state = jax.tree.map(jax.device_put, state, ssh)
        return jax.jit(runner)(state, xs_all, C)

    def to_full(self, state, C=None):
        ker = F1.Fdtd3dKernel.__new__(F1.Fdtd3dKernel)
        ker.plan, ker.L, ker.bx = self.plan, self.Lg, self.bx
        return F1.Fdtd3dKernel.to_full(ker, state, C)

    def from_full(self, full):
        ker = F1.Fdtd3dKernel.__new__(F1.Fdtd3dKernel)
        ker.plan, ker.L, ker.bx = self.plan, self.Lg, self.bx
        return F1.Fdtd3dKernel.from_full(ker, full)
