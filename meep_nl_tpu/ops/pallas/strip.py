"""Single-plane FDTD half-steps on full (1, Y, Z) x-planes — the
"halo-in-time" recompute primitives.

The temporally-fused kernel advances K steps per sweep; at a periodic
wrap (or, later, a shard boundary) the stage-s D-half at plane 0 needs
H^new_s at the far plane — data from the SAME call's future iterations.
The cyclic dependency is broken by redundantly recomputing the few
boundary planes' updates from the old state, one half-step at a time,
exactly as the width-1 sharded carry does for depth 1
(parallel/fused_mesh.carry_plane — these functions generalize it to
return the updated auxiliaries so a SECOND step can be chained).

Everything here mirrors the jnp stepper's update forms
(stepper/step.py `_curl_update` / `_eh_update`, i.e.
step_generic.cpp:89-253 and update_eh.cpp) restricted to one x-plane:
the x-derivative neighbors arrive as explicit ghost planes, y/z
derivatives are in-plane shifts.  Dispersive windows and NL stencils
are excluded by the callers' envelopes (their support must stay clear
of the recomputed planes).

Conventions: `bp(key, x)` returns coefficient `key`'s plane at x
(broadcast vectors pass through); `st` maps "b:{c}" / "d:{c}" /
"fu:{c}:{side}" / "w:{ec}:{side}" to the plane's old values (W/fu
pieces in their slab-compact shapes, L.fu / L.eh_store ranges).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _shift_yz(a, axis, by):
    pad = [(0, 0)] * 3
    slc = [slice(None)] * 3
    if by > 0:
        pad[axis] = (0, by)
        slc[axis] = slice(by, None)
    else:
        pad[axis] = (-by, 0)
        slc[axis] = slice(None, by)
    return jnp.pad(a[tuple(slc)], pad)


def _apply_masks(plan, c, x, val):
    """y/z plane masks + the x mask when this plane is itself dead."""
    for ax, i in plan.mask_planes.get(c, []):
        if ax == 0:
            if i == x:
                return jnp.zeros_like(val)
            continue
        nax = val.shape[ax]
        io = jax.lax.iota(jnp.int32, nax)
        shp = [1, 1, 1]
        shp[ax] = nax
        val = val * (io != i).reshape(shp).astype(val.dtype)
    return val


def _curl_chain(plan, L, spec, x, dfl, st, bp, pref):
    """The PML chain around one curl delta at plane x (the B/D common
    part of step_generic.cpp:89-253): returns (f_new, new) where `new`
    carries the updated f and fu pieces keyed '{pref}:{c}' /
    'fu:{c}:{side}'."""
    c = spec.c
    f_old = st[f"{pref}:{c}"]
    new: Dict[str, Any] = {}

    def chain1(gval, dflv):
        if spec.dsig_axis is None:
            return gval + dflv
        return ((bp(f"{c}:kap", x) - bp(f"{c}:sig", x)) * gval + dflv) \
            * bp(f"{c}:siginv", x)

    if spec.dsigu_axis is None:
        f_new = chain1(f_old, dfl)
    else:
        # reconstruct the full-plane fu from the slab pieces
        # (fu == f on the identity rows)
        fu_old = f_old
        fu_map = L.fu.get(c)
        pieces = []
        if fu_map is not None:
            fax, lor, hir = fu_map
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    pieces.append((side, fax, a, b))
        for (side, fax, a, b) in pieces:
            if fax == 0:
                if a <= x < b:      # x-compact piece covers this plane
                    fu_old = st[f"fu:{c}:{side}"]
            else:
                sl = [slice(None)] * 3
                sl[fax] = slice(a, b)
                fu_old = fu_old.at[tuple(sl)].set(st[f"fu:{c}:{side}"])
        fu_new = chain1(fu_old, dfl)
        f_new = bp(f"{c}:siginvu", x) * (
            (bp(f"{c}:kapu", x) - bp(f"{c}:sigu", x)) * f_old
            + fu_new - fu_old)
        for (side, fax, a, b) in pieces:
            if fax == 0:
                if a <= x < b:
                    new[f"fu:{c}:{side}"] = fu_new
            else:
                sl = [slice(None)] * 3
                sl[fax] = slice(a, b)
                new[f"fu:{c}:{side}"] = fu_new[tuple(sl)]
    f_new = _apply_masks(plan, c, x, f_new)
    new[f"{pref}:{c}"] = f_new
    return f_new, new


def _w_chain(plan, L, ec, x, lin_new, lin_old, st, bp, new):
    """Stored-field W chain rows at plane x (update_eh.cpp sigma_w):
    overlays the updated stored values onto lin_new, records the new
    store pieces in `new`, returns the effective field plane."""
    h = lin_new
    if ec not in L.eh_store:
        return h
    ax, lor, hir = L.eh_store[ec]
    for side, (a, b) in (("lo", lor), ("hi", hir)):
        if b <= a:
            continue
        if ax == 0:
            # x-compact store: this whole plane is stored iff a <= x < b
            if a <= x < b:
                e_old = st[f"w:{ec}:{side}"]
                kw = bp(f"{ec}:kapw", x)
                sw = bp(f"{ec}:sigw", x)
                e_new = e_old + (kw + sw) * lin_new - (kw - sw) * lin_old
                new[f"w:{ec}:{side}"] = e_new
                h = e_new
            continue
        sl = [slice(None)] * 3
        sl[ax] = slice(a, b)
        sl = tuple(sl)
        kw = bp(f"{ec}:kapw", x)
        sw = bp(f"{ec}:sigw", x)
        ksl = tuple(s_ if getattr(kw, "ndim", 0) == 3
                    and kw.shape[i_] > 1 else slice(None)
                    for i_, s_ in enumerate(sl))
        e_old = st[f"w:{ec}:{side}"]
        e_new = e_old + (kw[ksl] + sw[ksl]) * lin_new[sl] \
            - (kw[ksl] - sw[ksl]) * lin_old[sl]
        new[f"w:{ec}:{side}"] = e_new
        h = h.at[sl].set(e_new)
    return h


def b_half_plane(plan, L, x, e_at, e_next, st, bp):
    """Full B-half at plane x: curl from E_eff, PML chains, u multiply,
    W chain.  e_at/e_next: E_eff planes at x / x+1.  Returns
    (h_eff, new) with `new` carrying 'b:{c}', 'fu:{c}:{side}',
    'w:{ec}:{side}' updates (matches the kernel's half(is_d=False) and
    fused_mesh.carry_plane, which it generalizes)."""
    dtdx = plan.courant
    h_eff: Dict[str, Any] = {}
    new: Dict[str, Any] = {}
    for s in plan.curl_specs_b:
        def diff(gname, axis):
            if axis == 0:
                return e_next[gname] - e_at[gname]
            g = e_at[gname]
            return _shift_yz(g, axis, +1) - g
        total = None
        if s.g_plus is not None:
            total = diff(s.g_plus, s.plus_axis)
        if s.g_minus is not None:
            t2 = diff(s.g_minus, s.minus_axis)
            total = -t2 if total is None else total - t2
        dfl = -dtdx * total
        b_new, upd = _curl_chain(plan, L, s, x, dfl, st, bp, "b")
        new.update(upd)
        ec = s.ec
        has_u = f"{ec}:u" in plan.coefs
        u = bp(f"{ec}:u", x) if has_u else None
        lin_new = b_new * u if u is not None else b_new
        lin_old = st[f"b:{s.c}"] * u if u is not None \
            else st[f"b:{s.c}"]
        h_eff[ec] = _w_chain(plan, L, ec, x, lin_new, lin_old, st, bp, new)
    return h_eff, new


def d_half_plane(plan, L, x, h_at, h_prev, st, bp):
    """Full D-half at plane x: curl from H_eff^new, PML chains.
    h_at/h_prev: H_eff planes at x / x-1.  Returns (d_new, new)."""
    dtdx = plan.courant
    d_new: Dict[str, Any] = {}
    new: Dict[str, Any] = {}
    for s in plan.curl_specs_d:
        def diff(gname, axis):
            if axis == 0:
                return h_at[gname] - h_prev[gname]
            g = h_at[gname]
            return g - _shift_yz(g, axis, -1)
        total = None
        if s.g_plus is not None:
            total = diff(s.g_plus, s.plus_axis)
        if s.g_minus is not None:
            t2 = diff(s.g_minus, s.minus_axis)
            total = -t2 if total is None else total - t2
        dfl = dtdx * total
        dn, upd = _curl_chain(plan, L, s, x, dfl, st, bp, "d")
        new.update(upd)
        d_new[s.c] = dn
    return d_new, new


def e_assemble_plane(plan, L, x, d_new, d_old, st, bp, new):
    """E_eff at plane x after the D-half: lin = u * D_new plus the
    stored-E W-chain rows (updated into `new`).  `d_old` forms lin_old
    (the virtual stored lin of the previous step).

    Dispersive (pure-ADE) window rows: when the caller ships the plane's
    polarization state ('p:{pi}:{ec}' entries in `st`), the window rows
    carry E = u * (D_new - sum P) — the update_eh subtract_P step
    (update_eh.cpp:122).  No ADE arithmetic crosses the boundary: the
    pol update itself is pointwise and owned by each shard's kernel, so
    exchanging P planes is all a straddling Lorentz window needs (the
    reference's PE/PH internal-data halos, boundaries.cpp:530-573).
    NL (chi3/chi2-NR) windows still require boundary clearance (their
    stencils reach across planes).

    `lin_old` window rows subtract the PREVIOUS step's polarization
    ('pp:{pi}:{ec}' entries, = the reference's pp array): the previous
    E-assembly used the then-current P (now pp), so a stored-E
    (sigma_w) row inside the window reconstructs its virtual old lin as
    u * (D_old - sum pp) — without this, a straddling window that
    overlaps an eh_store row at a boundary plane would feed the W chain
    an un-subtracted old lin."""
    e_eff: Dict[str, Any] = {}
    wy = L.win_y if L.disp is not None else None
    for s in plan.eh_specs_e:
        ec = s.ec
        u = bp(f"{ec}:u", x) if s.has_u else None
        lin_new = d_new[s.dc] * u if u is not None else d_new[s.dc]
        lin_old = d_old[s.dc] * u if u is not None else d_old[s.dc]
        if wy is not None and ec in L.de_comps:
            wy0, wy1 = wy
            if u is not None:
                u_w = u[:, wy0:wy1, :] \
                    if getattr(u, "ndim", 0) == 3 and u.shape[1] > 1 \
                    else u
            gs = d_new[s.dc][:, wy0:wy1, :]
            gs_old = d_old[s.dc][:, wy0:wy1, :]
            have_p = have_pp = False
            for (pi, _p, comps) in L.pol_entries:
                if ec in comps and f"p:{pi}:{ec}" in st:
                    gs = gs - st[f"p:{pi}:{ec}"]
                    have_p = True
                if ec in comps and f"pp:{pi}:{ec}" in st:
                    gs_old = gs_old - st[f"pp:{pi}:{ec}"]
                    have_pp = True
            if have_p:
                lin_sub = gs * u_w if u is not None else gs
                lin_new = lin_new.at[:, wy0:wy1, :].set(lin_sub)
            if have_pp:
                lin_sub_old = gs_old * u_w if u is not None else gs_old
                lin_old = lin_old.at[:, wy0:wy1, :].set(lin_sub_old)
        e_eff[ec] = _w_chain(plan, L, ec, x, lin_new, lin_old, st, bp,
                             new)
    return e_eff
