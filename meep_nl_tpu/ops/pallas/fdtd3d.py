"""Fully-fused single-kernel FDTD step for 3D uPML grids (Mosaic/Pallas).

The round-1 finding (README "performance state of play") was that the jnp
stepper is HBM-bound: XLA already fuses it down to ~22 array traversals per
step, but the fused *stencil* loops achieve only ~100 GB/s on this TPU while
plain streaming achieves ~330 GB/s — the shifted reads break sequential DMA.
This kernel restores streaming-rate HBM access by loading each (bx, Y, Z)
x-slab into VMEM exactly once per step and doing every neighbor shift
in-register, and it cuts traversals to ~15 by storing the auxiliary PML
state *slab-compactly*:

  * D, B are the only full-grid arrays (the reference's primary fields,
    step.cpp:35-140 ordering: B<-curl E, H<-B, D<-curl H, E<-D).
  * E (and H) are stored ONLY on their sigma_w slabs (update_eh W chain,
    step_generic.cpp:576): outside, E == chi1inv * D identically (the
    W chain is the identity there), so E is recomputed in-register.
  * f_w is never stored at all: fw == chi1inv * D after every step
    (fw_new = lin in step_generic.cpp:720), so the W update uses
    u*D_old / u*D_new directly.
  * f_u (sigma_u chain aux, step_generic.cpp:89-253) is stored only on its
    sigma_u slabs (fu == f outside, inductively — the same invariant the
    jnp stepper's slab_opt path relies on).

Cross-block data flow (sequential TPU grid):
  * forward x-differences (B half) read E_eff at the next block's first
    plane from per-step halo arrays precomputed with strided slices;
  * backward x-differences (D half) read H_eff^{new} at the previous
    block's last plane from a VMEM scratch carried across grid steps.

The grid is split into lo-edge / interior / hi-edge pallas calls so that
x-axis-compact aux arrays (components whose sigma_u or sigma_w axis is x)
are only ever touched by the edge calls; H_eff carry planes are threaded
between the calls as (1, Y, Z) outputs.  All x-compact arrays are padded to
a COMMON block-aligned extent (identity-chain rows preserve the inductive
invariants, so the padding is harmless).

Masking note: D and its paired E share the same Yee site, hence the same
dead-plane mask, so masking the curl outputs (as the jnp path does) already
makes every virtual E = u*D correctly masked; the eh writes need no second
mask pass.

Supported envelope (everything else falls back to the jnp stepper): 3D
cartesian, real fields, vacuum or diagonal isotropic chi1inv, uPML on any
subset of axes, point/volume current sources, no conductivity / dispersion /
nonlinearity / BFAST / Bloch periodicity / in-scan monitors.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pick_bx(plan, requested=None) -> int:
    """Largest power-of-2 block depth that keeps the worst call's VMEM
    (~24 live full tiles x 2 revolving buffers) under ~85 MB of the v5e's
    128 MB."""
    S = tuple(plan.storage_shape or plan.gv.shape)
    if requested:
        return requested
    plane = S[1] * S[2] * 4
    bx = 16
    while bx > 1 and (48 * bx * plane > 85 * 2 ** 20 or S[0] % bx):
        bx //= 2
    return bx


def supported(plan, bx: int = None) -> bool:
    """Static envelope check (the analog of step_generic.cpp:82's case
    split: this kernel is the fully-specialized hot case)."""
    bx = _pick_bx(plan, bx)
    gv = plan.gv
    if gv.dim != "3d" or plan.complex_fields or plan.bfast_k is not None:
        return False
    if plan.pol_specs_e or plan.pol_specs_h:
        return False
    if getattr(plan, "have_fmp_e", False) or getattr(plan, "have_fmp_h", False):
        return False
    if any(plan.periodic):
        return False
    if plan.m:
        return False
    for s in plan.curl_specs_d + plan.curl_specs_b:
        if s.has_cond:
            return False
    for s in plan.eh_specs_e + plan.eh_specs_h:
        if s.has_u1 or s.has_u2 or s.has_chi3 or s.has_nr:
            return False
    for c, planes in (plan.mask_planes or {}).items():
        if planes is None:
            return False
    for s in plan.sources:
        if s.is_integrated:
            return False
    S = plan.storage_shape or gv.shape
    if S[0] % bx or S[0] < 2 * bx:
        return False
    if S[1] * S[2] * 4 * bx > 4 * 1024 * 1024:   # tile must fit VMEM budget
        return False
    try:
        _Layout(plan, bx)
    except ValueError:
        return False
    return True


def _full_slice(ax, sl):
    out = [slice(None)] * 3
    out[ax] = sl
    return tuple(out)


def _bc_slice(arr, ax, sl):
    """Slice a broadcast coefficient along `ax` only if it extends there."""
    out = [slice(None)] * 3
    if arr.shape[ax] > 1:
        out[ax] = sl
    return tuple(out)


# ---------------------------------------------------------------------------
# static layout
# ---------------------------------------------------------------------------


class _Layout:
    """Static description of the compact-state layout for one plan.

    z_full: store LANE-axis (z) aux arrays full-width instead of
    slab-compact.  Sub-tile lane slices and concatenates trigger Mosaic
    vector relayouts that dominate the z-PML cost (README perf notes);
    full-width z-aux trades ~14 B/cell/step of HBM traffic for
    relayout-free lane arithmetic (identity-region rows keep the
    inductive invariants fu == f and E == lin, so the widened ranges are
    exact)."""

    def __init__(self, plan, bx: int, z_full: bool = False):
        gv = plan.gv
        self.plan = plan
        self.bx = bx
        self.z_full = z_full
        self.S = tuple(plan.storage_shape or gv.shape)
        self.nblk = self.S[0] // bx
        self.n_sites = tuple(gv.num[a] + 1 for a in range(3))
        self.curls = list(plan.curl_specs_d) + list(plan.curl_specs_b)
        self.ehs = list(plan.eh_specs_e) + list(plan.eh_specs_h)
        self.eh_by_dc = {s.dc: s for s in self.ehs}
        self.eh_by_ec = {s.ec: s for s in self.ehs}

        # pass 1: raw slab site ranges per compact array
        raw: Dict[Tuple[str, str], Tuple[int, Tuple[int, int], Tuple[int, int]]] = {}
        for s in self.curls:
            if s.dsigu_axis is not None:
                raw[("fu", s.c)] = (s.dsigu_axis,) + self._raw_ranges(
                    s.dsigu_axis, *s.dsigu_slabs)
        for s in self.ehs:
            if s.dsigw_axis is not None:
                raw[("eh", s.ec)] = (s.dsigw_axis,) + self._raw_ranges(
                    s.dsigw_axis, *s.dsigw_slabs)

        # pass 2: unify x-axis extents to block-aligned call ranges
        lo_blocks = 0
        hi_start = self.S[0]
        for (ax, lor, hir) in raw.values():
            if ax != 0:
                continue
            if lor[1] > lor[0]:
                lo_blocks = max(lo_blocks, _cdiv(lor[1], bx))
            if hir[1] > hir[0]:
                hi_start = min(hi_start, (hir[0] // bx) * bx)
        self.lo_blocks = lo_blocks                    # blocks [0, lo_blocks)
        self.hi_block0 = hi_start // bx               # blocks [hi_block0, nblk)
        if self.lo_blocks > self.hi_block0:
            raise ValueError("x-PML slabs overlap; grid too small for kernel")

        def unify(ax, lor, hir):
            if ax != 0:
                return lor, hir
            lor2 = (0, lo_blocks * bx) if lor[1] > lor[0] else (0, 0)
            hir2 = (self.hi_block0 * bx, self.S[0]) if hir[1] > hir[0] \
                else (self.S[0], self.S[0])
            return lor2, hir2

        self.fu: Dict[str, Tuple[int, Tuple[int, int], Tuple[int, int]]] = {}
        self.eh_store: Dict[str, Tuple[int, Tuple[int, int], Tuple[int, int]]] = {}
        # raw (unpadded, true-sigma) ranges, for exact jnp-state conversion:
        # outside these the jnp stepper's aux arrays are untouched zeros
        self.fu_raw: Dict[str, Tuple[int, Tuple[int, int], Tuple[int, int]]] = {}
        self.eh_raw: Dict[str, Tuple[int, Tuple[int, int], Tuple[int, int]]] = {}
        for (kind, c), (ax, lor, hir) in raw.items():
            raw_clip = (ax, lor, (hir[0], min(hir[1], self.n_sites[ax])))
            (self.fu_raw if kind == "fu" else self.eh_raw)[c] = raw_clip
            lor, hir = unify(ax, lor, hir)
            if z_full and ax == 2:
                # widen the z slabs to the whole lane axis: lo covers
                # everything, hi empties; downstream piece logic then
                # emits full-width relayout-free ops
                lor, hir = (0, self.S[2]), (self.S[2], self.S[2])
            (self.fu if kind == "fu" else self.eh_store)[c] = (ax, lor, hir)

    def _raw_ranges(self, ax, lo, hi):
        """lo/hi slab SITE ranges along `ax`: [0, lo) and
        [n_sites - hi, storage_end) — the hi range is extended through the
        dead storage padding (masked planes, harmless)."""
        n = self.n_sites[ax]
        Sax = self.S[ax]
        lor = (0, lo)
        hir = (n - hi, Sax) if hi > 0 else (Sax, Sax)
        return lor, hir

    def init_state(self, dtype) -> Dict[str, Any]:
        S = self.S
        st: Dict[str, Any] = {}
        for s in self.curls:
            st[s.c] = jnp.zeros(S, dtype)
        for name, store in [("fu", self.fu), ("eh", self.eh_store)]:
            for c, (ax, lor, hir) in store.items():
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        shp = list(S)
                        shp[ax] = b - a
                        st[f"{name}:{c}:{side}"] = jnp.zeros(tuple(shp), dtype)
        st["t"] = jnp.zeros((), jnp.int32)
        return st

    @staticmethod
    def key(kind, c, side):
        return f"{kind}:{c}:{side}"


def _plane_lists(plan, c):
    planes: Tuple[List[int], List[int], List[int]] = ([], [], [])
    for ax, i in plan.mask_planes.get(c, []):
        planes[ax].append(int(i))
    return planes


# ---------------------------------------------------------------------------
# per-call kernel builder
# ---------------------------------------------------------------------------


def _build_call(L: "_Layout", b0: int, b1: int, edge_side: str):
    """One pallas call covering global x-blocks [b0, b1).
    edge_side: 'lo' | 'hi' | '' (interior)."""
    plan = L.plan
    bx, S = L.bx, L.S
    Y, Z = S[1], S[2]
    dtype = plan.dtype
    dtdx = plan.courant
    dt = plan.dt
    curls_b = list(plan.curl_specs_b)
    curls_d = list(plan.curl_specs_d)
    ehs_h = list(plan.eh_specs_h)
    ehs_e = list(plan.eh_specs_e)

    # which x-compact side (if any) each array contributes to this call
    def x_side_here(lor, hir):
        if edge_side == "lo" and lor[1] > lor[0]:
            return "lo"
        if edge_side == "hi" and hir[1] > hir[0]:
            return "hi"
        return None

    # ---- source jobs whose points fall inside [b0*bx, b1*bx) -------------
    src_jobs = []
    for si, s in enumerate(plan.sources):
        dc = ("d" if s.component[0] == "e" else "b") + s.component[1]
        pts = []
        idxs = np.asarray(s.indices)
        amps = np.asarray(s.amps)
        for k in range(len(idxs)):
            ix = int(idxs[k][0])
            if b0 * bx <= ix < b1 * bx:
                pts.append(((ix, int(idxs[k][1]), int(idxs[k][2])),
                            float(np.real(amps[k])), float(np.imag(amps[k]))))
        if pts:
            src_jobs.append((f"src{si}:cur_re", f"src{si}:cur_im", dc, pts))

    # ---- ordered operand tables -------------------------------------------
    in_entries: List[Tuple[str, str, Any]] = []
    out_entries: List[Tuple[str, str, Any]] = []
    aliases: Dict[int, int] = {}

    def fullblk_spec():
        return pl.BlockSpec((bx, Y, Z), lambda i: (i + b0, 0, 0),
                            memory_space=pltpu.VMEM)

    def add_state(key, spec):
        in_entries.append(("state", key, spec))
        aliases[len(in_entries) - 1] = len(out_entries)
        out_entries.append(("state", key, spec))

    for s in curls_b + curls_d:
        add_state(s.c, fullblk_spec())

    # compact aux present in this call: x-compacts only on their edge side;
    # y/z compacts everywhere.  x_here[key] marks full-block x-stored arrays.
    x_here: Dict[str, str] = {}
    for kind, store in (("fu", L.fu), ("eh", L.eh_store)):
        for c, (ax, lor, hir) in store.items():
            if ax == 0:
                side = x_side_here(lor, hir)
                if side is None:
                    continue
                key = L.key(kind, c, side)
                a = (lor if side == "lo" else hir)[0]
                off = a // bx - b0
                spec = pl.BlockSpec((bx, Y, Z),
                                    lambda i, off=off: (i - off, 0, 0),
                                    memory_space=pltpu.VMEM)
                x_here[f"{kind}:{c}"] = key
                add_state(key, spec)
            else:
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b <= a:
                        continue
                    key = L.key(kind, c, side)
                    shp = [bx, Y, Z]
                    shp[ax] = b - a
                    spec = pl.BlockSpec(tuple(shp),
                                        lambda i: (i + b0, 0, 0),
                                        memory_space=pltpu.VMEM)
                    add_state(key, spec)

    # halo planes (E_eff at (g+1)*bx) for the B half's forward x-diffs
    halo_keys: List[str] = []
    for s in curls_b:
        for g, a in ((s.g_plus, s.plus_axis), (s.g_minus, s.minus_axis)):
            if g is not None and a == 0 and g not in halo_keys:
                halo_keys.append(g)
    for g in halo_keys:
        in_entries.append(("halo", g,
                           pl.BlockSpec((1, Y, Z), lambda i: (i + b0, 0, 0),
                                        memory_space=pltpu.VMEM)))

    # carry-in planes (H_eff^new at b0*bx - 1) for the D half's backward diffs
    carry_keys: List[str] = []
    for s in curls_d:
        for g, a in ((s.g_plus, s.plus_axis), (s.g_minus, s.minus_axis)):
            if g is not None and a == 0 and g not in carry_keys:
                carry_keys.append(g)
    for g in carry_keys:
        in_entries.append(("carry", g,
                           pl.BlockSpec((1, Y, Z), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM)))

    # coefficient arrays
    C0 = plan.coefs
    coef_keys: List[str] = []

    def want_coef(k):
        if k in C0 and k not in coef_keys:
            coef_keys.append(k)

    for s in curls_b + curls_d:
        if s.dsig_axis is not None:
            for nm in ("sig", "kap", "siginv"):
                want_coef(f"{s.c}:{nm}")
        if s.dsigu_axis is not None:
            for nm in ("sigu", "kapu", "siginvu"):
                want_coef(f"{s.c}:{nm}")
    for s in ehs_h + ehs_e:
        if s.has_u:
            want_coef(f"{s.ec}:u")
        if s.dsigw_axis is not None:
            want_coef(f"{s.ec}:kapw")
            want_coef(f"{s.ec}:sigw")
    for k in coef_keys:
        arr = C0[k]
        if arr.ndim == 3 and arr.shape == tuple(S):
            spec = fullblk_spec()
        elif arr.ndim == 3 and arr.shape[0] == S[0]:
            spec = pl.BlockSpec((bx,) + tuple(arr.shape[1:]),
                                lambda i: (i + b0, 0, 0),
                                memory_space=pltpu.VMEM)
        else:
            spec = pl.BlockSpec(tuple(arr.shape), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        in_entries.append(("coef", k, spec))

    # host-pre-sliced slab pieces of broadcast coefficient vectors: Mosaic
    # rejects in-kernel lane-slicing of (1,1,Z) operands past one lane tile
    # ("Invalid input layout"), so every per-slab y/z coefficient segment
    # arrives as its own small input
    coefslab_slices: Dict[str, Tuple[str, Tuple[Any, ...]]] = {}

    def want_coefslab(key, ax, side, a, b):
        arr = C0[key]
        name = f"{key}@{side}"
        if name in coefslab_slices:
            return
        sl = [slice(None)] * 3
        if arr.shape[ax] > 1:
            sl[ax] = slice(a, b)
        shp = tuple(b - a if (i == ax and arr.shape[ax] > 1)
                    else arr.shape[i] for i in range(3))
        coefslab_slices[name] = (key, tuple(sl))
        in_entries.append(("coefslab", name,
                           pl.BlockSpec(shp, lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM)))

    for s in curls_b + curls_d:
        if s.dsigu_axis in (1, 2):
            ax = s.dsigu_axis
            _, lor, hir = L.fu[s.c]
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    for nm in ("sigu", "kapu", "siginvu"):
                        want_coefslab(f"{s.c}:{nm}", ax, side, a, b)
    for s in ehs_h + ehs_e:
        if s.dsigw_axis in (1, 2):
            ax = s.dsigw_axis
            _, lor, hir = L.eh_store[s.ec]
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    for nm in ("kapw", "sigw"):
                        want_coefslab(f"{s.ec}:{nm}", ax, side, a, b)

    # per-step source waveform scalars
    xs_keys: List[str] = []
    for (kre, kim, dc, pts) in src_jobs:
        for kk in (kre, kim):
            if kk not in xs_keys:
                xs_keys.append(kk)
    for kk in xs_keys:
        in_entries.append(("xs", kk,
                           pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM)))

    for g in carry_keys:
        out_entries.append(("carry", g,
                            pl.BlockSpec((1, Y, Z), lambda i: (0, 0, 0),
                                         memory_space=pltpu.VMEM)))

    n_in = len(in_entries)
    mask_info = {c: _plane_lists(plan, c)
                 for c in [s.c for s in curls_b + curls_d]}

    # ---------------- kernel body -----------------------------------------
    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + len(out_entries)]
        scratch = refs[n_in + len(out_entries):]
        byname: Dict[Tuple[str, str], Any] = {}
        for (tag, key, _), r in zip(in_entries, ins):
            byname[(tag, key)] = r
        outname: Dict[Tuple[str, str], Any] = {}
        for (tag, key, _), r in zip(out_entries, outs):
            outname[(tag, key)] = r
        sc_carry = {g: scratch[k] for k, g in enumerate(carry_keys)}

        i = pl.program_id(0)
        gx0 = (i + b0) * bx

        for g in carry_keys:
            @pl.when(i == 0)
            def _(g=g):
                sc_carry[g][...] = byname[("carry", g)][...]

        def coef(k):
            return byname[("coef", k)][...]

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

        def apply_mask(c, val):
            xpl, ypl, zpl = mask_info[c]
            if xpl:
                xg = gx0 + jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0)
                alive = jnp.ones((bx, 1, 1), jnp.bool_)
                for p in xpl:
                    alive = alive & (xg != p)
                val = jnp.where(alive, val, 0.0)
            for axplanes, axis in ((ypl, 1), (zpl, 2)):
                if axplanes:
                    shp = [1, 1, 1]
                    shp[axis] = val.shape[axis]
                    ii = jax.lax.broadcasted_iota(jnp.int32, tuple(shp), axis)
                    alive = jnp.ones(tuple(shp), jnp.bool_)
                    for p in axplanes:
                        alive = alive & (ii != p)
                    val = jnp.where(alive, val, 0.0)
            return val

        def assemble_eff(ec: str, lin):
            """Overlay stored E/H slabs onto the virtual u*D block."""
            if ec not in L.eh_store:
                return lin
            ax, lor, hir = L.eh_store[ec]
            if ax == 0:
                key = x_here.get(f"eh:{ec}")
                return byname[("state", key)][...] if key else lin
            a_lo, b_lo = lor
            a_hi, b_hi = hir
            pieces = []
            if b_lo > a_lo:
                pieces.append(byname[("state", L.key("eh", ec, "lo"))][...])
            if a_hi > b_lo:
                pieces.append(lin[_full_slice(ax, slice(b_lo, a_hi))])
            if b_hi > a_hi:
                pieces.append(byname[("state", L.key("eh", ec, "hi"))][...])
            return jnp.concatenate(pieces, axis=ax) if len(pieces) > 1 \
                else pieces[0]

        def half(curls, ehs, g_eff, x_neighbor, is_d):
            """One half-step: curl+PML chains for 3 primary comps, then the
            eh transform.  Returns (new primary blocks, new effective E/H
            blocks)."""
            sgn = 1.0 if is_d else -1.0
            new_f: Dict[str, Any] = {}
            for s in curls:
                c = s.c
                f_old = byname[("state", c)][...]

                def diff(gname, axis):
                    garr = g_eff[gname]
                    if axis == 0:
                        if is_d:
                            shifted = jnp.concatenate(
                                [x_neighbor[gname], garr[:-1]], axis=0)
                            return garr - shifted
                        shifted = jnp.concatenate(
                            [garr[1:], x_neighbor[gname]], axis=0)
                        return shifted - garr
                    if is_d:
                        return garr - shift_yz(garr, axis, -1)
                    return shift_yz(garr, axis, +1) - garr

                total = None
                if s.g_plus is not None:
                    total = diff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    t2 = diff(s.g_minus, s.minus_axis)
                    total = -t2 if total is None else total - t2
                dfl = sgn * dtdx * total

                def chain1(gval, dflv):
                    if s.dsig_axis is None:
                        return gval + dflv
                    return ((coef(f"{c}:kap") - coef(f"{c}:sig")) * gval
                            + dflv) * coef(f"{c}:siginv")

                if s.dsigu_axis is None:
                    f_new = chain1(f_old, dfl)
                else:
                    ax = s.dsigu_axis

                    def chain2(fseg, fu_old, out_key, sl, side=None):
                        if side is None:      # x: blocked (bx,1,1) coefs
                            ku = coef(f"{c}:kapu")
                            su = coef(f"{c}:sigu")
                            siu = coef(f"{c}:siginvu")
                        else:                 # y/z: host-pre-sliced pieces
                            ku = byname[("coefslab", f"{c}:kapu@{side}")][...]
                            su = byname[("coefslab", f"{c}:sigu@{side}")][...]
                            siu = byname[("coefslab",
                                          f"{c}:siginvu@{side}")][...]
                        dseg = dfl[_full_slice(ax, sl)] \
                            if sl != slice(None) else dfl
                        fu_new = chain1(fu_old, dseg)
                        outname[("state", out_key)][...] = fu_new
                        return siu * ((ku - su) * fseg + fu_new - fu_old)

                    if ax == 0:
                        key = x_here.get(f"fu:{c}")
                        if key:
                            f_new = chain2(f_old,
                                           byname[("state", key)][...],
                                           key, slice(None))
                        else:
                            f_new = chain1(f_old, dfl)
                    else:
                        _, lor, hir = L.fu[c]
                        a_lo, b_lo = lor
                        a_hi, b_hi = hir
                        pieces = []
                        if b_lo > a_lo:
                            sl = slice(a_lo, b_lo)
                            pieces.append(chain2(
                                f_old[_full_slice(ax, sl)],
                                byname[("state", L.key("fu", c, "lo"))][...],
                                L.key("fu", c, "lo"), sl, "lo"))
                        if a_hi > b_lo:
                            mid = slice(b_lo, a_hi)
                            pieces.append(chain1(
                                f_old[_full_slice(ax, mid)],
                                dfl[_full_slice(ax, mid)]))
                        if b_hi > a_hi:
                            sl = slice(a_hi, b_hi)
                            pieces.append(chain2(
                                f_old[_full_slice(ax, sl)],
                                byname[("state", L.key("fu", c, "hi"))][...],
                                L.key("fu", c, "hi"), sl, "hi"))
                        f_new = jnp.concatenate(pieces, axis=ax) \
                            if len(pieces) > 1 else pieces[0]
                new_f[c] = apply_mask(c, f_new)

            # current sources (step.cpp:296-319): in-register one-hot adds
            for (kre, kim, dc, pts) in src_jobs:
                if dc not in new_f:
                    continue
                w_re = byname[("xs", kre)][0, 0]
                w_im = byname[("xs", kim)][0, 0]
                add = None
                for ((ix, iy, iz), a_re, a_im) in pts:
                    amp = (w_re * a_re - w_im * a_im) * dt
                    one = ((gx0 + jax.lax.broadcasted_iota(
                        jnp.int32, (bx, 1, 1), 0) == ix)
                        & (jax.lax.broadcasted_iota(
                            jnp.int32, (1, Y, 1), 1) == iy)
                        & (jax.lax.broadcasted_iota(
                            jnp.int32, (1, 1, Z), 2) == iz))
                    term = jnp.where(one, -amp, 0.0).astype(dtype)
                    add = term if add is None else add + term
                new_f[dc] = new_f[dc] + add

            # eh transform: stored-slab W chains + virtual u*D elsewhere.
            # All inputs are correctly masked (D/E share Yee sites), so no
            # second mask pass is needed.
            eff_new: Dict[str, Any] = {}
            for s in ehs:
                ec, dc_ = s.ec, s.dc
                u = coef(f"{ec}:u") if s.has_u else None
                d_new = new_f[dc_]
                lin_new = d_new * u if u is not None else d_new
                if ec not in L.eh_store:
                    eff_new[ec] = lin_new
                    continue
                ax, lor, hir = L.eh_store[ec]
                d_old = byname[("state", dc_)][...]
                lin_old = d_old * u if u is not None else d_old

                def wseg(out_key, sl, side=None):
                    if side is None:      # x: blocked (bx,1,1) coefs
                        kw = coef(f"{ec}:kapw")
                        sw = coef(f"{ec}:sigw")
                    else:                 # y/z: host-pre-sliced pieces
                        kw = byname[("coefslab", f"{ec}:kapw@{side}")][...]
                        sw = byname[("coefslab", f"{ec}:sigw@{side}")][...]
                    ln = lin_new[_full_slice(ax, sl)] \
                        if sl != slice(None) else lin_new
                    lo_ = lin_old[_full_slice(ax, sl)] \
                        if sl != slice(None) else lin_old
                    e_old = byname[("state", out_key)][...]
                    e_new = e_old + (kw + sw) * ln - (kw - sw) * lo_
                    outname[("state", out_key)][...] = e_new
                    return e_new

                if ax == 0:
                    key = x_here.get(f"eh:{ec}")
                    eff_new[ec] = wseg(key, slice(None)) if key else lin_new
                else:
                    a_lo, b_lo = lor
                    a_hi, b_hi = hir
                    pieces = []
                    if b_lo > a_lo:
                        pieces.append(wseg(L.key("eh", ec, "lo"),
                                           slice(a_lo, b_lo), "lo"))
                    if a_hi > b_lo:
                        pieces.append(lin_new[_full_slice(
                            ax, slice(b_lo, a_hi))])
                    if b_hi > a_hi:
                        pieces.append(wseg(L.key("eh", ec, "hi"),
                                           slice(a_hi, b_hi), "hi"))
                    eff_new[ec] = jnp.concatenate(pieces, axis=ax) \
                        if len(pieces) > 1 else pieces[0]
            return new_f, eff_new

        # ---- B half: B <- -curl E_eff, H <- W-chain(B) ---------------------
        e_eff = {}
        for s in ehs_e:
            d_old = byname[("state", s.dc)][...]
            u = coef(f"{s.ec}:u") if s.has_u else None
            e_eff[s.ec] = assemble_eff(s.ec,
                                       d_old * u if u is not None else d_old)
        halo_planes = {g: byname[("halo", g)][...] for g in halo_keys}
        new_b, h_eff = half(curls_b, ehs_h, e_eff, halo_planes, is_d=False)

        carry_prev = {g: sc_carry[g][...] for g in carry_keys}
        for g in carry_keys:
            sc_carry[g][...] = h_eff[g][bx - 1:bx]
            outname[("carry", g)][...] = h_eff[g][bx - 1:bx]

        # ---- D half: D <- +curl H_eff^new, E <- W-chain(D) ----------------
        new_d, _ = half(curls_d, ehs_e, h_eff, carry_prev, is_d=True)

        for c, v in {**new_b, **new_d}.items():
            outname[("state", c)][...] = v

    # ---------------- wrapper ----------------------------------------------
    in_specs = [spec for (_, _, spec) in in_entries]
    out_specs = [spec for (_, _, spec) in out_entries]

    def run_call(state, halos, carry_in, C, xscal):
        args = []
        for (tag, key, _) in in_entries:
            if tag == "state":
                args.append(state[key])
            elif tag == "halo":
                args.append(halos[key])
            elif tag == "carry":
                args.append(carry_in[key])
            elif tag == "coef":
                args.append(C[key])
            elif tag == "coefslab":
                ckey, sl = coefslab_slices[key]
                args.append(C[ckey][sl])
            else:
                args.append(xscal[key])
        out_shapes = []
        for (tag, key, _) in out_entries:
            if tag == "carry":
                out_shapes.append(jax.ShapeDtypeStruct((1, Y, Z), dtype))
            else:
                out_shapes.append(jax.ShapeDtypeStruct(
                    tuple(state[key].shape), state[key].dtype))
        outs = pl.pallas_call(
            kernel,
            grid=(b1 - b0,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            scratch_shapes=[pltpu.VMEM((1, Y, Z), dtype)
                            for _ in carry_keys],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=bool(int(os.environ.get("MNT_PALLAS_INTERPRET", "0"))),
        )(*args)
        new_state = dict(state)
        carry_out = {}
        for (tag, key, _), v in zip(out_entries, outs):
            if tag == "carry":
                carry_out[key] = v
            else:
                new_state[key] = v
        return new_state, carry_out

    run_call.halo_keys = halo_keys
    run_call.carry_keys = carry_keys
    run_call.xs_keys = xs_keys
    return run_call


# ---------------------------------------------------------------------------
# public driver
# ---------------------------------------------------------------------------



def compute_halos(L, bx, halo_keys, state, C):
    """E_eff planes at x = bx, 2bx, ..., X (zero past the end) for the
    forward x-differences — strided slices, ~1/bx of a traversal per
    haloed component.  Shared by the 1-step and 2-step-fused kernels."""
    halos = {}
    for ec in halo_keys:
        spec = L.eh_by_ec[ec]
        d = state[spec.dc]
        planes = d[bx::bx]                       # x = bx .. < X
        if spec.has_u:
            planes = planes * C[f"{ec}:u"][bx::bx]
        if ec in L.eh_store:
            ax, lor, hir = L.eh_store[ec]
            if ax == 0:
                # (not reachable in 3D: halo comps ey/ez store on y/z)
                gidx = np.arange(bx, L.S[0], bx)
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b <= a:
                        continue
                    arr = state[L.key("eh", ec, side)]
                    sel = (gidx >= a) & (gidx < b)
                    if sel.any():
                        planes = planes.at[np.nonzero(sel)[0]].set(
                            arr[gidx[sel] - a])
            else:
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b <= a:
                        continue
                    arr = state[L.key("eh", ec, side)]
                    sl = [slice(None)] * 3
                    sl[ax] = slice(a, b)
                    planes = planes.at[tuple(sl)].set(arr[bx::bx])
        zero = jnp.zeros((1,) + planes.shape[1:], planes.dtype)
        halos[ec] = jnp.concatenate([planes, zero], axis=0)
    return halos


class Fdtd3dKernel:
    """Compiled fused-step driver for one plan."""

    def __init__(self, plan, bx: int = None, z_full: bool = False):
        bx = _pick_bx(plan, bx)
        if not supported(plan, bx):
            raise ValueError("plan outside the fdtd3d kernel envelope")
        self.plan = plan
        self.bx = bx
        self.L = _Layout(plan, bx, z_full=z_full)
        L = self.L
        calls = []
        if L.lo_blocks > 0:
            calls.append(_build_call(L, 0, L.lo_blocks, "lo"))
        if L.hi_block0 > L.lo_blocks:
            calls.append(_build_call(L, L.lo_blocks, L.hi_block0, ""))
        if L.hi_block0 < L.nblk:
            calls.append(_build_call(L, L.hi_block0, L.nblk, "hi"))
        self.calls = calls
        self.halo_keys = sorted({g for c in calls for g in c.halo_keys})
        self.carry_keys = sorted({g for c in calls for g in c.carry_keys})
        self.xs_keys = sorted({k for c in calls for k in c.xs_keys})

    def init_state(self):
        return self.L.init_state(self.plan.dtype)

    def _halos(self, state, C):
        """E_eff planes at x = bx, 2bx, ..., X (zero past the end) for the
        forward x-differences — strided slices, ~1/bx of a traversal per
        haloed component."""
        return compute_halos(self.L, self.bx, self.halo_keys, state, C)

    def make_step(self):
        """(state, x_t, C) -> state, same shape as stepper.step.make_step."""
        Y, Z = self.L.S[1], self.L.S[2]
        dtype = self.plan.dtype

        def step(state, x_t, C):
            halos = self._halos(state, C)
            carry = {g: jnp.zeros((1, Y, Z), dtype) for g in self.carry_keys}
            xscal = {k: jnp.asarray(x_t[k], dtype).reshape(1, 1)
                     for k in self.xs_keys}
            for call in self.calls:
                state, carry_out = call(state, halos, carry, C, xscal)
                carry = {**carry, **carry_out}
            return {**state, "t": state["t"] + 1}

        return step

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 4):
        from ...stepper.step import build_xs
        xs_all = build_xs(self.plan, nsteps, t0)
        xs = {k: v for k, v in xs_all.items() if k in self.xs_keys}
        step = self.make_step()

        def runner(state, xs, C):
            def body(carry, x):
                return step(carry, x, C), None
            state, _ = jax.lax.scan(
                body, state, xs, length=nsteps,
                unroll=unroll if nsteps % unroll == 0 else 1)
            return state

        return jax.jit(runner)(state, xs, self.plan.coefs)

    # ---- conversion to/from the standard state pytree ----------------------

    def to_full(self, state, C=None):
        """Reconstruct the jnp stepper's state dict (for monitors,
        checkpointing, get_array) from the compact state."""
        plan, L = self.plan, self.L
        C = C if C is not None else plan.coefs
        f: Dict[str, Any] = {}
        for s in L.curls:
            f[s.c] = state[s.c]
        for s in L.ehs:
            d = state[s.dc]
            e = d * C[f"{s.ec}:u"] if s.has_u else d
            if s.ec in L.eh_store:
                ax, lor, hir = L.eh_store[s.ec]
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        e = e.at[_full_slice(ax, slice(a, b))].set(
                            state[L.key("eh", s.ec, side)])
            f[s.ec] = e
        f_u: Dict[str, Any] = {}
        for s in L.curls:
            if s.c not in L.fu:
                continue
            ax, lor, hir = L.fu[s.c]
            ax_r, lor_r, hir_r = L.fu_raw[s.c]
            # jnp parity: zero outside the true-sigma ranges (the jnp slab
            # path never touches f_u there); compact padding rows carry
            # fu == f and are dropped
            fu = jnp.zeros_like(state[s.c])
            for (ar, br) in (lor_r, hir_r):
                if br <= ar:
                    continue
                # the stored side CONTAINING this raw range (with z_full
                # the widened lo array holds both raw slabs)
                if lor[0] <= ar and br <= lor[1]:
                    side, base = "lo", lor[0]
                else:
                    side, base = "hi", hir[0]
                comp = state[L.key("fu", s.c, side)]
                fu = fu.at[_full_slice(ax, slice(ar, br))].set(
                    comp[_full_slice(ax, slice(ar - base, br - base))])
            f_u[s.c] = fu
        f_w: Dict[str, Any] = {}
        for s in L.ehs:
            if s.dsigw_axis is None:
                continue
            # fw == lin == u*D (step_generic.cpp:720); jnp slab_opt parity:
            # zero outside the true-sigma_w ranges (never touched there)
            d = state[s.dc]
            lin = d * C[f"{s.ec}:u"] if s.has_u else d
            ax, lor_r, hir_r = L.eh_raw[s.ec]
            fw = jnp.zeros_like(lin)
            for (ar, br) in (lor_r, hir_r):
                if br > ar:
                    sl = _full_slice(ax, slice(ar, br))
                    fw = fw.at[sl].set(lin[sl])
            f_w[s.ec] = fw
        return {"f": f, "f_u": f_u, "f_cond": {}, "f_w": f_w,
                "pol": [], "dft": {}, "t": state["t"]}

    def from_full(self, full):
        """Extract the compact state from a standard state dict."""
        L = self.L
        st: Dict[str, Any] = {}
        for s in L.curls:
            st[s.c] = full["f"][s.c]
        for kind, store in (("fu", L.fu), ("eh", L.eh_store)):
            for c, (ax, lor, hir) in store.items():
                if kind == "fu":
                    # kernel invariant: fu == f on the identity-chain rows
                    # (the jnp state keeps zeros there — don't use them)
                    ax_r, lor_r, hir_r = L.fu_raw[c]
                    base = full["f"][c]
                    for (ar, br) in (lor_r, hir_r):
                        if br > ar:
                            base = base.at[_full_slice(
                                ax, slice(ar, br))].set(
                                full["f_u"][c][_full_slice(
                                    ax, slice(ar, br))])
                else:
                    base = full["f"][c]
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b > a:
                        st[L.key(kind, c, side)] = \
                            base[_full_slice(ax, slice(a, b))]
        st["t"] = full["t"]
        return st
