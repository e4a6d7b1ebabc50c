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

import math
import os
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...stepper.step import _nr_solve


def _cdiv(a, b):
    return -(-a // b)


def _has_disp(plan) -> bool:
    return bool(plan.pol_specs_e or plan.pol_specs_h
                or any(s.has_chi3 or s.has_nr
                       for s in plan.eh_specs_e + plan.eh_specs_h))


def _pick_bx(plan, requested=None) -> int:
    """Largest power-of-2 block depth that keeps the worst call's VMEM
    (~24 live full tiles x 2 revolving buffers) under ~85 MB of the v5e's
    128 MB.  Dispersive plans carry extra per-block tiles (P/PP/stored-E/
    sigma/NL coefs), so their budget multiplier is higher."""
    S = tuple(plan.storage_shape or plan.gv.shape)
    if requested:
        return requested
    plane = S[1] * S[2] * 4
    disp = _has_disp(plan)
    tiles = 78 if disp else 48
    # folded conductivity (condfold): each folded comp streams its 3
    # full-grid chain1 coef tiles instead of broadcast vectors
    tiles += 3 * sum(s.folded_cond
                     for s in plan.curl_specs_d + plan.curl_specs_b)
    bx = 16
    while bx > 1 and (tiles * bx * plane > 85 * 2 ** 20 or S[0] % bx):
        bx //= 2
    if disp:
        # block granularity interacts with the dispersive window (its
        # x-range must clear the x-PML edge calls): degrade bx until the
        # layout validates rather than falling all the way back to jnp
        b = bx
        while b >= 1:
            try:
                _Layout(plan, b)
                return b
            except ValueError:
                b //= 2
    return bx


def supported(plan, bx: int = None, allow_disp: bool = True,
              allow_periodic_x: bool = False) -> bool:
    """Static envelope check (the analog of step_generic.cpp:82's case
    split: this kernel is the fully-specialized hot case).

    The dispersive envelope (simple E-family Lorentzian ADEs,
    susceptibility.cpp:188-260, plus the fork's chi2-Newton and chi3-Pade
    branches, step_generic.cpp:546-815) is admitted when the material
    support is x-interior and away from PML slabs — validated by
    `_Layout`; `allow_disp=False` restores the round-2 linear-only
    envelope (used by callers that haven't been taught the disp state)."""
    gv = plan.gv
    if gv.dim != "3d" or plan.complex_fields or plan.bfast_k is not None:
        return False
    if getattr(plan, "rot2", None) is not None or getattr(plan, "rot4", None) is not None:
        return False        # C2 fold ghost not taught to the fused kernels
    if any(mn[0] == 0 for mn in getattr(plan, "mirror_node", ())):
        return False        # x mirrors change the x-block topology; y/z
        # node mirrors apply their ghost in-register (mirror_yz_info)
    bx = _pick_bx(plan, bx)
    if plan.pol_specs_h:
        return False
    if not allow_disp and _has_disp(plan):
        return False
    for p in plan.pol_specs_e:
        if p.kind != "lorentzian" or p.noise_amp != 0.0:
            return False
        if any(d != c[1] for (c, d) in p.sigma):
            return False                     # off-diagonal sigma rows
    if any(plan.periodic[1:]):
        return False
    if plan.periodic[0]:
        # x-periodicity is drivable through the ghost-plane + wrap-carry
        # machinery (ops/pallas/periodicx.py) when the phase is real
        # (+-1, i.e. k_x = 0 or half-integer); the kernel itself stays
        # periodicity-blind (the dead plane at x = num carries the wrap
        # ghost, refreshed every step)
        if not allow_periodic_x:
            return False
        ph = plan.bloch_phase[0]
        if isinstance(ph, complex) and ph.imag != 0.0:
            return False
    if plan.m:
        return False
    for s in plan.curl_specs_d + plan.curl_specs_b:
        if s.has_cond:
            return False
    for s in plan.eh_specs_e + plan.eh_specs_h:
        if s.has_u1 or s.has_u2:
            return False
        if (s.has_chi3 or s.has_nr) and s.ec[0] != "e":
            return False
    for c, planes in (plan.mask_planes or {}).items():
        if planes is None:
            return False
    # folded conductivity (ops/pallas/condfold) must stay >= 3 sites
    # clear of every NL (chi3/chi2-NR) support box: the NL next-plane
    # rebuild uses the interior rule (chain-identity columns)
    boxes = getattr(plan, "support_boxes", None) or {}
    cond_boxes = [b for k, b in boxes.items()
                  if k.endswith(":condfold") and b is not None]
    if cond_boxes:
        nl_keys = []
        for s in plan.eh_specs_e:
            if s.has_chi3:
                nl_keys += [f"{s.ec}:chi3", f"{s.ec}:chi2"]
            if s.has_nr:
                nl_keys += [f"{s.ec}:nrchi2"]
        for key in nl_keys:
            nb = boxes.get(key)
            if nb is None:
                continue
            for cb in cond_boxes:
                if all(cb[ax][0] < nb[ax][1] + 3
                       and cb[ax][1] > nb[ax][0] - 3 for ax in range(3)):
                    return False
    for s in plan.sources:
        if s.is_integrated:
            return False
    S = plan.storage_shape or gv.shape
    if bx < 2:
        # bx=1 degenerates the x-concat pieces to zero-width slices,
        # which compiled Mosaic rejects (vector sizes must be positive)
        return False
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


def mirror_yz_info(plan):
    """{(gname, axis): (k0, sign)} for node-aligned mirror folds on the
    y/z axes (step._mirror_node_ghost statics, vec.hpp:1189
    mirror_symmetry): the backward-difference ghost at plane 0 is
    sign * g[k0] — a block-LOCAL row read, so the fused kernels apply it
    in-register with no topology change (x mirrors would re-plumb the
    sequential block flow and stay on the jnp path)."""
    from ...core import grid as G
    out = {}
    for (ax, d_letter, phase) in getattr(plan, "mirror_node", ()):
        if ax == 0:
            continue
        for ft in ("e", "h", "d", "b"):
            for dl in ("x", "y", "z"):
                gname = ft + dl
                ys = G.yee_shift(gname, plan.gv.dim)
                if gname[0] in ("e", "d"):
                    s = phase * (-1.0 if dl == d_letter else 1.0)
                else:
                    s = phase * (1.0 if dl == d_letter else -1.0)
                out[(gname, ax)] = (1 - ys[d_letter], float(s))
    return out


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

    def __init__(self, plan, bx: int, z_full: bool = False,
                 x_uniform: bool = False):
        """x_uniform: widen every x-compact aux range to the FULL x
        extent, collapsing the lo/mid/hi call split into one uniform
        call.  Identity-chain rows keep the inductive invariants, so the
        widened storage is exact; costs ~4 extra full arrays of traffic
        for xyz-PML plans, and buys an SPMD-uniform program — the
        sharded (shard_map) kernel requires every shard to run the same
        call structure."""
        gv = plan.gv
        self.plan = plan
        self.bx = bx
        self.z_full = z_full
        self.x_uniform = x_uniform
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
        if x_uniform and any(ax == 0 and (lor[1] > lor[0] or hir[1] > hir[0])
                             for (ax, lor, hir) in raw.values()):
            # every x-compact array becomes full-x 'lo' storage; the
            # whole grid is one uniform 'lo' call
            lo_blocks = self.nblk
            hi_start = self.S[0]
        self.lo_blocks = lo_blocks                    # blocks [0, lo_blocks)
        self.hi_block0 = hi_start // bx               # blocks [hi_block0, nblk)
        if self.lo_blocks > self.hi_block0:
            raise ValueError("x-PML slabs overlap; grid too small for kernel")

        def unify(ax, lor, hir):
            if ax != 0:
                return lor, hir
            if x_uniform and (lor[1] > lor[0] or hir[1] > hir[0]):
                # full-x 'lo' storage holds both true slabs
                return (0, self.S[0]), (self.S[0], self.S[0])
            lor2 = (0, lo_blocks * bx) if lor[1] > lor[0] else (0, 0)
            hir2 = (self.hi_block0 * bx, self.S[0]) if hir[1] > hir[0] \
                else (self.S[0], self.S[0])
            return lor2, hir2

        self._disp_setup(plan, bx)

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

    def _disp_setup(self, plan, bx):
        """Dispersive-envelope layout: the x-block range [db0, db1) holding
        every pol-sigma / chi3 / chi2-NR support, the per-pol component
        lists, and the NL partner stencil sets.  Raises ValueError when the
        material layout cannot be specialized (caller falls back to jnp).

        Invariants established here (the kernel relies on each):
          * disp range is x-interior (inside the mid call, clear of the
            x-PML edge calls);
          * NL support (+1-site stencil reach) is clear of every true PML
            sigma slab on all axes, of every masked plane, and of every
            source point — so the redundant next-plane recompute may use
            the plain interior update rule;
          * NL support x-range is >= 1 site inside the disp range, so the
            cross-call dmp carries/halos are never consumed."""
        self.pol_entries: List[Tuple[int, Any, List[str]]] = []
        self.nl_specs = [s for s in plan.eh_specs_e
                         if s.has_chi3 or s.has_nr]
        self.disp = None
        if not plan.pol_specs_e and not self.nl_specs:
            return
        boxes = getattr(plan, "support_boxes", None)
        if boxes is None:
            raise ValueError("plan lacks support-box metadata")
        xr: List[Tuple[int, int]] = []          # site ranges (pol: exact)
        self.de_comps: List[str] = []
        for pi, p in enumerate(plan.pol_specs_e):
            comps = sorted({c for (c, d) in p.sigma})
            for c in comps:
                key = f"pol{pi}:{c}:{c[1]}"
                if key not in boxes:
                    raise ValueError(f"no support box for {key}")
                b = boxes[key]
                if b is not None:
                    xr.append(b[0])
                if c not in self.de_comps:
                    self.de_comps.append(c)
            self.pol_entries.append((pi, p, comps))
        nl_boxes = []
        for s in self.nl_specs:
            keys = []
            if s.has_chi3:
                keys += [f"{s.ec}:chi3", f"{s.ec}:chi2"]
            if s.has_nr:
                keys += [f"{s.ec}:nrchi2"]
            for key in keys:
                if key not in boxes:
                    raise ValueError(f"no support box for {key}")
                b = boxes[key]
                if b is None:
                    continue
                nl_boxes.append(b)
                # NL stencils reach 1 site; widen the x-claim so the
                # support sits >= 1 site inside the disp range
                xr.append((b[0][0] - 1, b[0][1] + 1))
            if s.ec not in self.de_comps:
                self.de_comps.append(s.ec)
            # NL corrections leak into partner components' stored E only
            # via lin; partners themselves stay linear
        if not xr:
            # all supports empty: P stays identically zero and the NL
            # selects never fire — treat the plan as linear
            self.pol_entries = []
            self.nl_specs = []
            self.de_comps = []
            return
        if self.x_uniform:
            # SPMD-uniform layouts widen the dispersive window to the
            # full x extent (identity rows: sigma == 0 keeps P == 0 and
            # stored-E == lin, so the widened storage is exact).  The
            # support-box coordinates are GLOBAL while self.S may be a
            # per-shard span, so every x-positional check is skipped here
            # — callers must validate the global plan via supported()
            # (which builds the plain _Layout with full checks) plus the
            # shard-boundary clearances (parallel/fused_mesh).
            db0, db1 = 0, self.nblk
        else:
            x_lo = min(a for a, _ in xr)
            x_hi = max(b for _, b in xr)
            if x_lo < 0 or x_hi > self.S[0]:
                raise ValueError("dispersive support touches the x boundary")
            db0 = x_lo // bx
            db1 = _cdiv(x_hi, bx)
        self.db0, self.db1 = db0, db1

        # NL stencil-safety checks
        if nl_boxes and not self.x_uniform:
            # collect true per-axis sigma slab extents (raw site counts)
            slab_lo = [0, 0, 0]
            slab_hi = [0, 0, 0]

            def claim(ax, slabs):
                if ax is None or slabs is None:
                    return
                slab_lo[ax] = max(slab_lo[ax], slabs[0])
                slab_hi[ax] = max(slab_hi[ax], slabs[1])

            for s in plan.curl_specs_d + plan.curl_specs_b:
                claim(s.dsig_axis, s.dsig_slabs)
                claim(s.dsigu_axis, s.dsigu_slabs)
            for s in plan.eh_specs_e + plan.eh_specs_h:
                claim(s.dsigw_axis, s.dsigw_slabs)
            for b in nl_boxes:
                for ax in range(3):
                    lo, hi = b[ax]
                    if lo - 1 < slab_lo[ax] or \
                            hi + 1 > self.n_sites[ax] - slab_hi[ax]:
                        raise ValueError(
                            "NL support (+1 stencil) reaches a PML slab "
                            "or the grid boundary")
                # masked planes inside the stencil reach
                for c, planes in (plan.mask_planes or {}).items():
                    for (ax, idx) in planes or []:
                        lo, hi = b[ax]
                        if lo - 1 <= idx < hi + 1:
                            raise ValueError(
                                "masked plane inside NL stencil reach")
                # sources inside the stencil reach
                for s in plan.sources:
                    for pt in np.asarray(s.indices):
                        if all(b[ax][0] - 1 <= int(pt[ax]) < b[ax][1] + 1
                               for ax in range(3)):
                            raise ValueError(
                                "source point inside NL stencil reach")
        # NL partner stencil sets: forward x-plane recompute needed for
        # partners of specs whose own axis is x; backward carries for
        # partners reached through an x-offset shift
        self.nl_fwd: List[str] = []
        self.nl_bwd: List[str] = []
        for s in self.nl_specs:
            for dc_k, ax_k in ((s.dc1, s.ax_1), (s.dc2, s.ax_2)):
                if dc_k is None:
                    continue
                if s.ax_own == 0 and dc_k not in self.nl_fwd:
                    self.nl_fwd.append(dc_k)
                if ax_k == 0 and dc_k not in self.nl_bwd:
                    self.nl_bwd.append(dc_k)
        if not self.x_uniform and (db0 < self.lo_blocks
                                   or db1 > self.hi_block0 or db1 <= db0):
            raise ValueError(
                "dispersive x-range overlaps the x-PML edge calls")
        # y-window: the dispersive state (P/PP/stored-E) only needs the
        # sublane rows carrying pol/NL support (+1 stencil margin),
        # 8-aligned; everything outside is exactly linear (P == 0)
        Y = self.S[1]
        ylo, yhi = Y, 0
        for b in (list(nl_boxes)
                  + [boxes[f"pol{pi}:{c}:{c[1]}"]
                     for (pi, p, comps) in self.pol_entries for c in comps
                     if boxes[f"pol{pi}:{c}:{c[1]}"] is not None]):
            ylo = min(ylo, b[1][0])
            yhi = max(yhi, b[1][1])
        ylo = max(0, ((ylo - 1) // 8) * 8)
        yhi = min(Y, _cdiv(yhi + 1, 8) * 8)
        if yhi - ylo >= Y - 8:
            ylo, yhi = 0, Y                  # window ~full: keep it simple
        self.win_y = (ylo, yhi)
        self.disp = (db0, db1)

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
        if self.disp is not None:
            db0, db1 = self.disp
            wy0, wy1 = self.win_y
            dshape = ((db1 - db0) * self.bx, wy1 - wy0, S[2])
            for (pi, p, comps) in self.pol_entries:
                for c in comps:
                    st[f"p{pi}:{c}"] = jnp.zeros(dshape, dtype)
                    st[f"pp{pi}:{c}"] = jnp.zeros(dshape, dtype)
            for c in self.de_comps:
                st[f"de:{c}"] = jnp.zeros(dshape, dtype)
        st["t"] = jnp.zeros((), jnp.int32)
        return st

    def disp_range(self) -> Tuple[int, int]:
        """Site range [a, b) of the dispersive x-window."""
        db0, db1 = self.disp
        return db0 * self.bx, db1 * self.bx

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


def _build_call(L: "_Layout", b0: int, b1: int, edge_side: str,
                disp: bool = False, dyn_xoff: bool = False,
                with_sources: bool = True):
    """One pallas call covering global x-blocks [b0, b1).
    edge_side: 'lo' | 'hi' | '' (interior); disp marks the dispersive
    window call (Lorentz ADE + chi3/chi2-NR support, see _disp_setup).

    dyn_xoff: add a scalar SMEM input 'xoff' (global x offset of this
    shard) applied to the x-plane masks — the sharded SPMD kernel runs
    the same program on every shard.  with_sources=False drops in-kernel
    source injection (the sharded driver scatters sources outside)."""
    plan = L.plan
    bx, S = L.bx, L.S
    Y, Z = S[1], S[2]
    dtype = plan.dtype
    dtdx = plan.courant
    dt = plan.dt
    mirr_yz = mirror_yz_info(plan)
    curls_b = list(plan.curl_specs_b)
    curls_d = list(plan.curl_specs_d)
    ehs_h = list(plan.eh_specs_h)
    ehs_e = list(plan.eh_specs_e)

    # ---- dispersive-call statics ------------------------------------------
    de_set = set(L.de_comps) if disp else set()
    wy0, wy1 = L.win_y if disp else (0, S[1])
    Yw = wy1 - wy0
    pol_entries = L.pol_entries if disp else []
    nl_specs = L.nl_specs if disp else []
    nl_fwd = list(L.nl_fwd) if (disp and nl_specs) else []
    nl_bwd = list(L.nl_bwd) if (disp and nl_specs) else []
    # which components have a pol P to subtract (dc -> list of (pi, ec))
    pol_by_dc: Dict[str, List[Tuple[int, str]]] = {}
    for (pi, p, comps) in pol_entries:
        for c in comps:
            pol_by_dc.setdefault("d" + c[1], []).append((pi, c))
    # redundant next-plane recompute structure (forward-x NL stencils):
    # D curls for the forward partners, the H comps they difference, and
    # the B curls producing those H comps
    d_specs_fwd = [s for s in curls_d if s.c in nl_fwd]
    h_for_fwd: List[str] = []
    for s in d_specs_fwd:
        for g in (s.g_plus, s.g_minus):
            if g is not None and g not in h_for_fwd:
                h_for_fwd.append(g)
    b_specs_fwd = [s for s in curls_b if s.ec in h_for_fwd]
    e_q_names: List[str] = []
    e_q1_names: List[str] = []
    for s in b_specs_fwd:
        for g, a in ((s.g_plus, s.plus_axis), (s.g_minus, s.minus_axis)):
            if g is None:
                continue
            if g not in e_q_names:
                e_q_names.append(g)
            if a == 0 and g not in e_q1_names:
                e_q1_names.append(g)

    # which x-compact side (if any) each array contributes to this call
    def x_side_here(lor, hir):
        if edge_side == "lo" and lor[1] > lor[0]:
            return "lo"
        if edge_side == "hi" and hir[1] > hir[0]:
            return "hi"
        return None

    # ---- source jobs whose points fall inside [b0*bx, b1*bx) -------------
    src_jobs = []
    for si, s in (enumerate(plan.sources) if with_sources else ()):
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

    # dispersive state: P/PP per pol component + stored-E over the window
    # (all x-compact arrays starting at db0*bx == b0*bx for this call)
    if disp:
        disp_spec = pl.BlockSpec((bx, Yw, Z), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        for (pi, p, comps) in pol_entries:
            for c in comps:
                add_state(f"p{pi}:{c}", disp_spec)
                add_state(f"pp{pi}:{c}", disp_spec)
        for c in L.de_comps:
            add_state(f"de:{c}", disp_spec)

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

    # NL redundant-plane halos (all prev-step data, host-precomputed with
    # the same plane indexing as the regular halos: element j = plane
    # (j+1)*bx [+1 for the e1 family])
    nlh_keys: List[str] = []
    if nl_fwd:
        for g in e_q_names:
            if g not in halo_keys:
                nlh_keys.append(f"e0:{g}")
        for g in e_q1_names:
            nlh_keys.append(f"e1:{g}")
        for s in b_specs_fwd:
            nlh_keys.append(f"b0:{s.c}")
        for s in d_specs_fwd:
            nlh_keys.append(f"d0:{s.c}")
            if s.c in pol_by_dc:
                nlh_keys.append(f"ps:{s.c}")
        for hc in h_for_fwd:
            if f"{hc}:u" in plan.coefs:
                nlh_keys.append(f"u:{hc}")
    for k in nlh_keys:
        in_entries.append(("nlh", k,
                           pl.BlockSpec((1, Yw, Z), lambda i: (i + b0, 0, 0),
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
    for (pi, p, comps) in pol_entries:
        for c in comps:
            want_coef(f"pol{pi}:{c}:{c[1]}")
    for s in nl_specs:
        if s.has_chi3:
            want_coef(f"{s.ec}:chi3")
            want_coef(f"{s.ec}:chi2")
        if s.has_nr:
            want_coef(f"{s.ec}:nreps")
            want_coef(f"{s.ec}:nrchi2")
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
    if dyn_xoff:
        in_entries.append(("xs", "xoff",
                           pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM)))
        xs_keys.append("xoff")

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
        sc_dmp = {dc: scratch[len(carry_keys) + k]
                  for k, dc in enumerate(nl_bwd)}

        i = pl.program_id(0)
        gx0 = (i + b0) * bx

        for g in carry_keys:
            @pl.when(i == 0)
            def _(g=g):
                sc_carry[g][...] = byname[("carry", g)][...]

        for dc in nl_bwd:
            # NL backward-x carry: zero at the window's first block (the
            # envelope keeps chi support >= 1 site inside, so the zero
            # plane is never selected)
            @pl.when(i == 0)
            def _(dc=dc):
                sc_dmp[dc][...] = jnp.zeros((1, Yw, Z), dtype)

        def coef(k):
            return byname[("coef", k)][...]

        def win(a):
            """Restrict a full block to the dispersive y-window rows."""
            return a[:, wy0:wy1, :]

        def overlay_win(full, sub):
            """Replace the y-window rows of a full block with `sub`."""
            pieces = []
            if wy0 > 0:
                pieces.append(full[:, :wy0, :])
            pieces.append(sub)
            if wy1 < full.shape[1]:
                pieces.append(full[:, wy1:, :])
            return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 \
                else pieces[0]

        # prev-step stored E over the dispersive (x, y)-window (read ONCE,
        # before any aliased write): B-half E_eff, W-chain lin_old, and
        # the NR Newton seed all use it
        de_old = {c: byname[("state", f"de:{c}")][...] for c in de_set}

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
                gx = gx0 + byname[("xs", "xoff")][0, 0] if dyn_xoff else gx0
                xg = gx + jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0)
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
                        mi = mirr_yz.get((gname, axis))
                        if mi is not None:
                            # node-mirror fold ghost at plane 0: an
                            # in-register row of the same block
                            k0, ms = mi
                            ghost = ms * garr[_full_slice(
                                axis, slice(k0, k0 + 1))]
                            shifted = jnp.concatenate(
                                [ghost, garr[_full_slice(
                                    axis, slice(None, -1))]], axis=axis)
                            return garr - shifted
                        return garr - shift_yz(garr, axis, -1)
                    return shift_yz(garr, axis, +1) - garr

                total = None
                if s.g_plus is not None:
                    total = diff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    t2 = diff(s.g_minus, s.minus_axis)
                    total = -t2 if total is None else total - t2
                dfl = sgn * dtdx * total

                def chain1(gval, dflv, axsl=None):
                    # axsl = (axis, slice): the caller passes gval/dflv
                    # pre-sliced along a sigu slab axis; coefs extended
                    # there (full-grid folded-cond chain1 arrays) must be
                    # sliced to match (broadcast vectors pass through)
                    if s.dsig_axis is None:
                        return gval + dflv

                    def cf(nm):
                        v = coef(f"{c}:{nm}")
                        if axsl is not None and v.shape[axsl[0]] > 1:
                            return v[_full_slice(axsl[0], axsl[1])]
                        return v
                    return ((cf("kap") - cf("sig")) * gval + dflv) \
                        * cf("siginv")

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
                        fu_new = chain1(fu_old, dseg,
                                        None if sl == slice(None)
                                        else (ax, sl))
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
                                dfl[_full_slice(ax, mid)], (ax, mid)))
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

            # ---- dispersive D half: dmp = D_new - sum P, NL stencil
            # machinery, pol ADE updates (the fork's update_eh/_pol path,
            # susceptibility.cpp:188, step_generic.cpp:546-815) ----------
            dmp: Dict[str, Any] = {}
            dmp_next: Dict[str, Any] = {}
            carry_dmp_prev: Dict[str, Any] = {}
            lin_final: Dict[str, Any] = {}
            if disp and is_d:
                # dmp lives on the (x, y) dispersive window only: outside
                # it P == 0 identically, so dmp == D there
                for s in ehs:
                    v = win(new_f[s.dc])
                    for (pi, cpc) in pol_by_dc.get(s.dc, []):
                        v = v - byname[("state", f"p{pi}:{cpc}")][...]
                    dmp[s.dc] = v
                carry_dmp_prev = {dc: sc_dmp[dc][...] for dc in nl_bwd}
                for dc in nl_bwd:
                    sc_dmp[dc][...] = dmp[dc][bx - 1:bx]
                if nl_fwd:
                    dmp_next = nl_next_planes(g_eff)

            def shift_dmp(dc_name, axis, by):
                g = dmp[dc_name]
                if axis == 0:
                    if by > 0:
                        return jnp.concatenate(
                            [g[1:], dmp_next[dc_name]], axis=0)
                    return jnp.concatenate(
                        [carry_dmp_prev[dc_name], g[:-1]], axis=0)
                return shift_yz(g, axis, by)

            def sum4(dc_name, ax_own_, ax_off_):
                """gs_2-style 4-neighbor sum of dmp (step_generic.cpp:740)
                with cross-block x planes from the carry / redundant
                next-plane machinery (sgn = +1: E family only)."""
                g = dmp[dc_name]
                g_s = shift_dmp(dc_name, ax_own_, +1)
                g_x = shift_dmp(dc_name, ax_off_, -1)
                if ax_off_ == 0:
                    prv = shift_yz(carry_dmp_prev[dc_name], ax_own_, +1)
                    g_sx = jnp.concatenate([prv, g_s[:-1]], axis=0)
                else:
                    g_sx = shift_yz(g_s, ax_off_, -1)
                return g + g_s + g_x + g_sx

            # eh transform: stored-slab W chains + virtual u*D elsewhere.
            # All inputs are correctly masked (D/E share Yee sites), so no
            # second mask pass is needed.
            eff_new: Dict[str, Any] = {}
            for s in ehs:
                ec, dc_ = s.ec, s.dc
                u = coef(f"{ec}:u") if s.has_u else None
                d_new = new_f[dc_]
                lin_new = d_new * u if u is not None else d_new
                if disp and is_d and ec in de_set:
                    # window rows: lin = u*(D - P) + NL corrections, all
                    # computed on the (bx, Yw, Z) sub-block only
                    gs = dmp[dc_]
                    u_w = win(u) if u is not None else None
                    lin_sub = gs * u_w if u_w is not None else gs
                    u_nl = u_w if u_w is not None else 1.0
                    if s.has_chi3:
                        # Pade Kerr (calc_nonlinear_u, step_generic.cpp:546)
                        Dsqr = gs * gs
                        if s.dc1 is not None and s.ax_1 is not None:
                            g1s = sum4(s.dc1, s.ax_own, s.ax_1)
                            Dsqr = Dsqr + 0.0625 * (g1s * g1s)
                        if s.dc2 is not None and s.ax_2 is not None:
                            g2s = sum4(s.dc2, s.ax_own, s.ax_2)
                            Dsqr = Dsqr + 0.0625 * (g2s * g2s)
                        c2 = gs * win(coef(f"{ec}:chi2")) * (u_nl * u_nl)
                        c3 = Dsqr * win(coef(f"{ec}:chi3")) \
                            * (u_nl * u_nl * u_nl)
                        lin_sub = lin_sub * (1 + c2 + 2 * c3) \
                            / (1 + 2 * c2 + 3 * c3)
                    if s.has_nr:
                        # chi2 Newton branch (newton_raphson.cpp:144);
                        # seed = previous E (stored de window)
                        g_1 = 0.25 * sum4(s.dc1, s.ax_own, s.ax_1) \
                            if s.dc1 is not None else jnp.zeros_like(gs)
                        g_2 = 0.25 * sum4(s.dc2, s.ax_own, s.ax_2) \
                            if s.dc2 is not None else jnp.zeros_like(gs)
                        epsv = win(coef(f"{ec}:nreps"))
                        chi2v = win(coef(f"{ec}:nrchi2"))
                        own, _, _ = _nr_solve(gs, g_1, g_2, epsv, chi2v,
                                              de_old[ec], g_1 * u_nl,
                                              g_2 * u_nl)
                        lin_sub = jnp.where(chi2v != 0, own, lin_sub)
                    outname[("state", f"de:{ec}")][...] = lin_sub
                    lin_final[ec] = lin_sub
                    lin_new = overlay_win(lin_new, lin_sub)
                if ec not in L.eh_store:
                    eff_new[ec] = lin_new
                    continue
                ax, lor, hir = L.eh_store[ec]
                d_old = byname[("state", dc_)][...]
                lin_old = d_old * u if u is not None else d_old
                if disp and is_d and ec in de_set:
                    lin_old = overlay_win(lin_old, de_old[ec])

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

            # pol ADE leapfrog (susceptibility.cpp:188-260): drive = the
            # final (NL-corrected) lin == fw of this step
            if disp and is_d:
                for (pi, p, comps) in pol_entries:
                    w2pi = 2 * math.pi * p.omega0
                    g2pi = 2 * math.pi * p.gamma
                    omega0dtsqr = (w2pi * dt) ** 2
                    g1inv = 1.0 / (1 + 0.5 * g2pi * dt)
                    g1 = 1 - 0.5 * g2pi * dt
                    denom = 0.0 if p.drude else omega0dtsqr
                    for c in comps:
                        sigv = win(coef(f"pol{pi}:{c}:{c[1]}"))
                        pcur = byname[("state", f"p{pi}:{c}")][...]
                        ppcur = byname[("state", f"pp{pi}:{c}")][...]
                        pnew = g1inv * (pcur * (2 - denom) - g1 * ppcur
                                        + omega0dtsqr * sigv * lin_final[c])
                        outname[("state", f"p{pi}:{c}")][...] = pnew
                        outname[("state", f"pp{pi}:{c}")][...] = pcur
            return new_f, eff_new

        def nl_next_planes(h_eff):
            """dmp at this call's next-block plane q = gx0 + bx: an
            interior-rule redundant recompute of D_new(q) - sum P(q) from
            prev-step halo planes + this block's last H_new plane.  Valid
            on the NL stencil columns by the _disp_setup invariants
            (garbage elsewhere, masked out by the chi != 0 selects)."""
            def nlh(k):
                return byname[("nlh", k)][...]
            e_q = {}
            for g in e_q_names:
                e_q[g] = win(byname[("halo", g)][...]) if g in halo_keys \
                    else nlh(f"e0:{g}")
            h_new_q = {}
            for s in b_specs_fwd:
                def pdiff(gname, axis):
                    if axis == 0:
                        return nlh(f"e1:{gname}") - e_q[gname]
                    return shift_yz(e_q[gname], axis, +1) - e_q[gname]
                total = None
                if s.g_plus is not None:
                    total = pdiff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    t2 = pdiff(s.g_minus, s.minus_axis)
                    total = -t2 if total is None else total - t2
                b_new = nlh(f"b0:{s.c}") - dtdx * total
                if f"{s.ec}:u" in plan.coefs:
                    h_new_q[s.ec] = b_new * nlh(f"u:{s.ec}")
                else:
                    h_new_q[s.ec] = b_new
            out = {}
            for s in d_specs_fwd:
                def pdiff(gname, axis):
                    if axis == 0:
                        return h_new_q[gname] \
                            - win(h_eff[gname][bx - 1:bx])
                    return h_new_q[gname] \
                        - shift_yz(h_new_q[gname], axis, -1)
                total = None
                if s.g_plus is not None:
                    total = pdiff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    t2 = pdiff(s.g_minus, s.minus_axis)
                    total = -t2 if total is None else total - t2
                d_new_q = nlh(f"d0:{s.c}") + dtdx * total
                if s.c in pol_by_dc:
                    d_new_q = d_new_q - nlh(f"ps:{s.c}")
                out[s.c] = d_new_q
            return out

        # ---- B half: B <- -curl E_eff, H <- W-chain(B) ---------------------
        e_eff = {}
        for s in ehs_e:
            d_old = byname[("state", s.dc)][...]
            u = coef(f"{s.ec}:u") if s.has_u else None
            base = d_old * u if u is not None else d_old
            if disp and s.ec in de_set:
                # stored-E window: lin (incl. NL corrections) written by
                # the previous step's D half; exactly u*D outside
                base = overlay_win(base, de_old[s.ec])
            e_eff[s.ec] = assemble_eff(s.ec, base)
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
            elif tag == "nlh":
                args.append(halos[key])
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
                            for _ in carry_keys]
            + [pltpu.VMEM((1, Yw, Z), dtype) for _ in nl_bwd],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(os.environ.get(
                    "MNT_VMEM_LIMIT_MB", "110")) * 1024 * 1024),
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
    run_call.nlh_keys = nlh_keys
    return run_call


# ---------------------------------------------------------------------------
# public driver
# ---------------------------------------------------------------------------



def _de_overlay(L, bx, planes, state, ec, offset=0):
    """Overlay the stored-E dispersive (x, y)-window onto strided halo
    planes (element j = plane (j+1)*bx + offset)."""
    if L.disp is None or ec not in getattr(L, "de_comps", []):
        return planes
    db0, db1 = L.disp
    wy0, wy1 = L.win_y
    de = state[f"de:{ec}"][offset::bx]           # (db1-db0) windowed planes
    j0 = db0 - 1
    if j0 >= 0:
        return planes.at[j0:j0 + (db1 - db0), wy0:wy1, :].set(de)
    return planes.at[0:db1 - 1, wy0:wy1, :].set(de[1:])


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
        planes = _de_overlay(L, bx, planes, state, ec)
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


def compute_nl_halos(L, bx, nlh_keys, state, C):
    """Host-precomputed planes for the NL redundant next-plane recompute
    (all prev-step data; same indexing convention as compute_halos:
    element j = plane (j+1)*bx, '+1' family at (j+1)*bx + 1)."""
    out = {}
    S0 = L.S[0]
    nplanes = S0 // bx                           # incl. trailing zero plane
    wy0, wy1 = L.win_y

    def with_zero(planes):
        planes = planes[:, wy0:wy1, :]           # y-window rows only
        pad = nplanes - planes.shape[0]
        if pad > 0:
            z = jnp.zeros((pad,) + planes.shape[1:], planes.dtype)
            planes = jnp.concatenate([planes, z], axis=0)
        return planes

    db0, db1 = L.disp
    for key in nlh_keys:
        kind, name = key.split(":", 1)
        if kind in ("e0", "e1"):
            off = 0 if kind == "e0" else 1
            spec = L.eh_by_ec[name]
            planes = state[spec.dc][bx + off::bx]
            if spec.has_u:
                planes = planes * C[f"{name}:u"][bx + off::bx]
            planes = _de_overlay(L, bx, planes, state, name, offset=off)
            # no W-slab overlay: these planes are only consumed on the NL
            # stencil columns, which the envelope keeps slab-free
            out[key] = with_zero(planes)
        elif kind in ("b0", "d0"):
            out[key] = with_zero(state[name][bx::bx])
        elif kind == "ps":
            ec = "e" + name[1]
            tot = None
            for (pi, p, comps) in L.pol_entries:
                if ec in comps:
                    v = state[f"p{pi}:{ec}"][0::bx]   # already windowed
                    tot = v if tot is None else tot + v
            planes = jnp.zeros((nplanes, wy1 - wy0, L.S[2]), tot.dtype)
            j0 = db0 - 1
            if j0 >= 0:
                planes = planes.at[j0:j0 + (db1 - db0)].set(tot)
            else:
                planes = planes.at[0:db1 - 1].set(tot[1:])
            out[key] = planes
        elif kind == "u":
            out[key] = with_zero(C[f"{name}:u"][bx::bx])
    return out


class Fdtd3dKernel:
    """Compiled fused-step driver for one plan."""

    def __init__(self, plan, bx: int = None, z_full: bool = False,
                 allow_periodic_x: bool = False):
        bx = _pick_bx(plan, bx)
        if not supported(plan, bx, allow_periodic_x=allow_periodic_x):
            raise ValueError("plan outside the fdtd3d kernel envelope")
        self.plan = plan
        self.bx = bx
        self.L = _Layout(plan, bx, z_full=z_full)
        L = self.L
        calls = []
        if L.lo_blocks > 0:
            calls.append(_build_call(L, 0, L.lo_blocks, "lo"))
        if L.disp is not None:
            db0, db1 = L.disp
            if db0 > L.lo_blocks:
                calls.append(_build_call(L, L.lo_blocks, db0, ""))
            calls.append(_build_call(L, db0, db1, "", disp=True))
            if L.hi_block0 > db1:
                calls.append(_build_call(L, db1, L.hi_block0, ""))
        elif L.hi_block0 > L.lo_blocks:
            calls.append(_build_call(L, L.lo_blocks, L.hi_block0, ""))
        if L.hi_block0 < L.nblk:
            calls.append(_build_call(L, L.hi_block0, L.nblk, "hi"))
        self.calls = calls
        self.halo_keys = sorted({g for c in calls for g in c.halo_keys})
        self.carry_keys = sorted({g for c in calls for g in c.carry_keys})
        self.xs_keys = sorted({k for c in calls for k in c.xs_keys})
        self.nlh_keys = sorted({k for c in calls for k in c.nlh_keys})

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
            if self.nlh_keys:
                halos = {**halos, **compute_nl_halos(
                    self.L, self.bx, self.nlh_keys, state, C)}
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
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        runner_c = cache.get((nsteps, unroll))
        if runner_c is None:
            step = self.make_step()

            def runner(state, xs, C):
                def body(carry, x):
                    return step(carry, x, C), None
                state, _ = jax.lax.scan(
                    body, state, xs, length=nsteps,
                    unroll=unroll if nsteps % unroll == 0 else 1)
                return state

            runner_c = cache[(nsteps, unroll)] = jax.jit(runner)
        return runner_c(state, xs, self.plan.coefs)

    # ---- conversion to/from the standard state pytree ----------------------

    def to_full(self, state, C=None):
        """Reconstruct the jnp stepper's state dict (for monitors,
        checkpointing, get_array) from the compact state."""
        plan, L = self.plan, self.L
        C = C if C is not None else plan.coefs
        disp_rng = L.disp_range() if L.disp is not None else None
        wy = L.win_y if L.disp is not None else None
        f: Dict[str, Any] = {}
        for s in L.curls:
            f[s.c] = state[s.c]
        for s in L.ehs:
            d = state[s.dc]
            e = d * C[f"{s.ec}:u"] if s.has_u else d
            if disp_rng is not None and s.ec in L.de_comps:
                a, b = disp_rng
                e = e.at[a:b, wy[0]:wy[1], :].set(state[f"de:{s.ec}"])
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
        has_pols = bool(L.pol_entries)
        for s in L.ehs:
            if s.dsigw_axis is None:
                continue
            # fw == lin (step_generic.cpp:720).  Without pols the jnp path
            # keeps slab semantics (zero outside the true-sigma_w ranges);
            # with pols the jnp _eh_update takes the full-f_w branch, so
            # reconstruct lin everywhere: u*(D - sum PP) == u*D overlaid
            # with the stored-E window (NL corrections included)
            d = state[s.dc]
            lin = d * C[f"{s.ec}:u"] if s.has_u else d
            if disp_rng is not None and s.ec in L.de_comps:
                a, b = disp_rng
                lin = lin.at[a:b, wy[0]:wy[1], :].set(state[f"de:{s.ec}"])
            if has_pols and s.ec[0] == "e":
                f_w[s.ec] = lin
                continue
            ax, lor_r, hir_r = L.eh_raw[s.ec]
            fw = jnp.zeros_like(lin)
            for (ar, br) in (lor_r, hir_r):
                if br > ar:
                    sl = _full_slice(ax, slice(ar, br))
                    fw = fw.at[sl].set(lin[sl])
            f_w[s.ec] = fw
        pol = []
        for (pi, p, comps) in L.pol_entries:
            a, b = disp_rng
            entry = {"p": {}, "pp": {}}
            for c in comps:
                base = jnp.zeros(L.S, state[f"p{pi}:{c}"].dtype)
                entry["p"][c] = base.at[a:b, wy[0]:wy[1], :].set(
                    state[f"p{pi}:{c}"])
                entry["pp"][c] = base.at[a:b, wy[0]:wy[1], :].set(
                    state[f"pp{pi}:{c}"])
            pol.append(entry)
        return {"f": f, "f_u": f_u, "f_cond": {}, "f_w": f_w,
                "pol": pol, "dft": {}, "t": state["t"]}

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
        if L.disp is not None:
            a, b = L.disp_range()
            wy0, wy1 = L.win_y
            C = self.plan.coefs
            for (pi, p, comps) in L.pol_entries:
                for c in comps:
                    st[f"p{pi}:{c}"] = \
                        full["pol"][pi]["p"][c][a:b, wy0:wy1, :]
                    st[f"pp{pi}:{c}"] = \
                        full["pol"][pi]["pp"][c][a:b, wy0:wy1, :]
            for ec in L.de_comps:
                spec = L.eh_by_ec[ec]
                d = full["f"][spec.dc]
                lin = d * C[f"{ec}:u"] if spec.has_u else d
                # subtract the pre-update P generation (== current pp)
                for (pi, p, comps) in L.pol_entries:
                    if ec in comps:
                        lin = lin - full["pol"][pi]["pp"][ec] \
                            * (C[f"{ec}:u"] if spec.has_u else 1.0)
                # NL sites: fw == E there (NL support excludes W slabs)
                mask = None
                if spec.has_nr:
                    mask = C[f"{ec}:nrchi2"] != 0
                if spec.has_chi3:
                    m2 = C[f"{ec}:chi3"] != 0
                    mask = m2 if mask is None else (mask | m2)
                if mask is not None:
                    lin = jnp.where(mask, full["f"][ec], lin)
                st[f"de:{ec}"] = lin[a:b, wy0:wy1, :]
        st["t"] = full["t"]
        return st
