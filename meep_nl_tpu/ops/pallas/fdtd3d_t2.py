"""Two-step temporally-fused FDTD kernel (Mosaic/Pallas): the 1-step
kernel (fdtd3d.py) is HBM-streaming-bound at ~12 array traversals per
step; fusing TWO timesteps into one pass over the grid halves the
bytes/cell/step (read D,B once, advance t and t+1 in VMEM, write once).

Schedule (skewed temporal blocking over the sequential x-block grid):
at grid iteration i, run step-1 on block i (results held in VMEM
scratch), then step-2 on block i-1 from scratch.  The only cross-block
dependency of step-2 is the first x-plane of block i's post-step-1
E_eff (for the forward difference) — available in-register the same
iteration.  Outputs trail inputs by one block; H_eff carry planes for
the backward differences thread through scratch exactly like the 1-step
kernel's carry, one per step.

Cross-call pipeline: the lo-edge call runs step-1 one block PAST its
x-compact range (into the first interior block) so the handoff package
between calls — post-step-1 D,B, E_eff, y/z-compact aux, both carry
planes — never contains x-compact aux; structural divergence between
identity chains and sigma chains is confined to the small edge calls
(jnp.where on the iteration index).

State layout, coefficients, and the supported envelope are IDENTICAL to
fdtd3d.py (same _Layout); this module only changes the schedule.  Extra
restrictions: no mu dispersion on H (step-2's trailing block would need
the full mu-inv), and at least one interior block between the x-PML
slabs.
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

from . import fdtd3d as F1
from .fdtd3d import (_Layout, _full_slice, _cdiv, compute_halos,
                     compute_nl_halos, _has_disp)


def _interpret_mode() -> bool:
    """True when Pallas kernels run interpreted (CPU tests): backend
    faults of the real Mosaic TPU pipeline don't apply there."""
    return bool(int(os.environ.get("MNT_PALLAS_INTERPRET", "0")))


def _disp_fits(plan, bx, depth) -> bool:
    """The t2 schedule needs the disp window clear of the edge calls by
    an extra depth-1 blocks (the window call's stage-1 over-run)."""
    try:
        L = _Layout(plan, bx)
    except ValueError:
        return False
    if L.disp is None:
        return True
    db0, db1 = L.disp
    mid0 = L.lo_blocks + (depth - 1 if L.lo_blocks > 0 else 0)
    return db0 >= mid0 and db1 + depth - 1 <= L.hi_block0


def _pick_bx(plan, requested=None, depth: int = 2) -> int:
    """Smaller blocks than the 1-step kernel: the pipeline holds the
    previous block's full post-step-1 package in VMEM scratch.
    Dispersive plans carry extra per-block tiles (P/PP/de packages +
    prev-iteration coef scratch), so their budget multiplier is higher
    and the block granularity must let the disp window validate (finer
    blocks clear the edge calls more easily)."""
    S = tuple(plan.storage_shape or plan.gv.shape)
    if requested:
        return requested
    plane = S[1] * S[2] * 4
    disp = _has_disp(plan)
    # depth 3 holds a second trailing-block package in VMEM (d2/b2/e2 +
    # aux2): measured 255^3 fits at bx=2, overruns at bx=4.  disp+depth3
    # adds the second-level P/PP/de + coef snapshots on top
    if disp:
        tiles = 160 if depth == 3 else 96
    else:
        tiles = 128 if depth == 3 else 64
    # folded conductivity (condfold): 3 full-grid chain1 coef tiles per
    # folded comp PER STAGE instead of broadcast vectors
    tiles += 3 * depth * sum(s.folded_cond for s in plan.curl_specs_d
                             + plan.curl_specs_b)
    bx = 8
    while bx > 1 and (tiles * bx * plane > 90 * 2 ** 20 or S[0] % bx):
        bx //= 2
    if disp:
        b = bx
        while b >= 2:
            if S[0] % b == 0 and _disp_fits(plan, b, depth):
                return b
            b //= 2
    return bx


def _cond_clear_of_window(plan, bx, depth) -> bool:
    """Folded-conductivity boxes must stay >= 3 sites clear of the
    dispersive window on x or y (the NL/pol next-plane rebuilds assume
    chain-identity columns there; z spans the window fully)."""
    boxes = getattr(plan, "support_boxes", None) or {}
    cond = [b for k, b in boxes.items()
            if k.endswith(":condfold") and b is not None]
    if not cond:
        return True
    bxx = _pick_bx(plan, bx, depth)
    try:
        L = _Layout(plan, bxx)
    except ValueError:
        return False
    if L.disp is None:
        return True
    wx = L.disp_range()
    wy = L.win_y
    for b in cond:
        x_ov = b[0][0] < wx[1] + 3 and b[0][1] > wx[0] - 3
        y_ov = b[1][0] < wy[1] + 3 and b[1][1] > wy[0] - 3
        if x_ov and y_ov:
            return False
    return True


def supported(plan, bx: int = None, depth: int = 2) -> bool:
    if plan.gv.dim != "3d":
        return False
    folded = any(s.folded_cond
                 for s in plan.curl_specs_d + plan.curl_specs_b)
    if folded and _has_disp(plan) and not _cond_clear_of_window(plan, bx,
                                                                depth):
        # folded conductivity (ops/pallas/condfold) inside the NL stencil
        # reach of the dispersive window would break the next-plane
        # rebuild's chain-identity assumption (nl_next1/2 interior rule)
        return False
    bx = _pick_bx(plan, bx, depth)
    disp = _has_disp(plan)
    if disp and depth not in (2, 3):
        return False
    if not F1.supported(plan, bx):
        return False
    for s in plan.eh_specs_h:
        if s.has_u:
            return False
    # (round-4) the sub-sublane depth-3 dispersive dispatch fault was
    # bisected to the per-stage coef2 block entries of the full-grid u
    # operand; the middle stage now reads u from the cfa one-iteration
    # scratch cache instead, and bx < 8 runs clean on the real backend.
    # Folded-cond chain1 coefs (kap/sig/siginv) still keep per-stage
    # block-indexed entries of the same operand, so a depth-3 dispersive
    # plan with a folded chain must run at bx >= 8 (fall back to depth 2
    # otherwise) — the fault class is sub-sublane-bx specific.
    if folded and disp and depth == 3 and bx < 8:
        return False
    L = _Layout(plan, bx)
    if disp and depth == 3 and L.nl_specs and bx < 2:
        # the NL (chi2-Newton/chi3) next-plane rebuild consumes e_eff
        # planes 0 AND 1 of the upstream stage's block
        return False
    if L.nblk < depth:
        return False
    if L.lo_blocks > 0 and L.lo_blocks + depth - 1 > L.hi_block0:
        return False
    if L.hi_block0 < L.nblk and L.hi_block0 < depth - 1:
        return False
    if L.disp is not None and not _disp_fits(plan, bx, depth):
        return False
    return True


def _plane_lists(plan, c):
    planes: Tuple[List[int], List[int], List[int]] = ([], [], [])
    for ax, i in plan.mask_planes.get(c, []):
        planes[ax].append(int(i))
    return planes


def _build_call2(L: "_Layout", b0: int, b1: int, edge_side: str,
                 first: bool, last: bool, s1_xn: Any, s2_x0: Any,
                 depth: int = 2, disp: bool = False, periodic=None,
                 dyn_xoff: bool = False, edge_pkg: bool = False,
                 cap=None):
    """One fused-2-step pallas call: step-1 on blocks [b0, b1), step-2 on
    blocks [b0-1, b1-1) (+ block b1-1 itself when `last`, via one extra
    iteration).

    edge_side: which x-compact arrays are present ('lo'/'hi'/'').
    s1_xn: step-1 blocks with iteration index < s1_xn use the x-compact
        sigma chains ('lo' call: lo_blocks; 'hi': n1; else 0).
    s2_x0: step-2 iterations >= s2_x0 use the x-compact chains
        ('lo': 1 (all that run); 'hi': 1; else a big number).
    disp: this call owns the dispersive window (Lorentz ADE + chi3 +
        chi2-NR, _disp_setup): b0 == db0 and b1 == db1 + depth - 1, the
        lo-edge pattern applied to the window — stage-1 runs depth-1
        blocks past it so the cross-call package never carries disp
        state.  Stage-1 uses host-precomputed prev-step NL halos for the
        redundant next-plane recompute (as the 1-step kernel); stage-2
        rebuilds its next plane EXACTLY from stage-1's in-register
        results for the following block (no redundancy).
    periodic: (phase, i_wrap, row_wrap) for an x-Bloch wrap with a real
        phase (depth 2, single first+last call): the wrap carries arrive
        as host-recomputed 'pkg' inputs wrapc1/wrapc2
        (periodicx.wrap2_carries), stage-1's plane-0 E_eff is saved at
        i == 0 and substituted (times phase) for stage-2's forward
        ghost at the wrap — both through e1_first and by overwriting
        the dead plane num's row of the e1 scratch.
    dyn_xoff: the call's global x offset arrives as an SMEM scalar
        (shard_map SPMD: one program for every shard) — masks and
        source one-hots compare against xoff-shifted coordinates, and
        source jobs keep every point (each matches only on its owner).
    edge_pkg: shard-boundary variant of `periodic` (depth 2, single
        first+last call): the stage carries wrapc1/wrapc2 AND stage-2's
        forward ghost plane wrape1 arrive as host-recomputed 'pkg'
        inputs (fused_mesh-style halo-in-time recompute from the
        neighbors' boundary strips)."""
    plan = L.plan
    bx, S = L.bx, L.S
    Y, Z = S[1], S[2]
    dtype = plan.dtype
    dtdx = plan.courant
    dt = plan.dt
    n1 = b1 - b0
    grid = n1 + (depth - 1 if last else 0)
    curls_b = list(plan.curl_specs_b)
    curls_d = list(plan.curl_specs_d)
    ehs_h = list(plan.eh_specs_h)
    ehs_e = list(plan.eh_specs_e)
    nblk = L.nblk

    mirr_yz = F1.mirror_yz_info(plan)
    # ---- dispersive-call statics (mirrors fdtd3d._build_call) ------------
    de_set = set(L.de_comps) if disp else set()
    wy0, wy1 = L.win_y if disp else (0, S[1])
    Yw = wy1 - wy0
    pol_entries = L.pol_entries if disp else []
    nl_specs = L.nl_specs if disp else []
    nl_fwd = list(L.nl_fwd) if (disp and nl_specs) else []
    nl_bwd = list(L.nl_bwd) if (disp and nl_specs) else []
    nd = (L.disp[1] - L.disp[0]) if disp else 0      # window blocks
    pol_by_dc: Dict[str, List[Tuple[int, str]]] = {}
    for (pi, p, comps) in pol_entries:
        for c in comps:
            pol_by_dc.setdefault("d" + c[1], []).append((pi, c))
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

    def s1map(i):
        return jnp.minimum(i, n1 - 1) + b0

    def s2map(i):
        return (jnp.maximum(i - 1, 0) if first else i - 1) + b0

    def s3map(i):
        return (jnp.maximum(i - 2, 0) if first else i - 2) + b0

    # the FINAL stage owns the outputs
    sKmap = s3map if depth == 3 else s2map

    # ---- source jobs per step --------------------------------------------
    def jobs_in(x_lo, x_hi):
        out = []
        for si, s in enumerate(plan.sources):
            dc = ("d" if s.component[0] == "e" else "b") + s.component[1]
            pts = []
            idxs = np.asarray(s.indices)
            amps = np.asarray(s.amps)
            for k in range(len(idxs)):
                ix = int(idxs[k][0])
                if x_lo <= ix < x_hi:
                    pts.append(((ix, int(idxs[k][1]), int(idxs[k][2])),
                                float(np.real(amps[k])),
                                float(np.imag(amps[k]))))
            if pts:
                out.append((f"src{si}:cur_re", f"src{si}:cur_im", dc, pts))
        return out

    if dyn_xoff:
        # SPMD: every shard runs this program; each source point's
        # one-hot matches only on its owning shard (global coords)
        src_jobs1 = jobs_in(-10 ** 9, 10 ** 9)
        src_jobs2 = list(src_jobs1)
        src_jobs3 = list(src_jobs1) if depth == 3 else []
    else:
        src_jobs1 = jobs_in(b0 * bx, b1 * bx)
        s2_hi_blk = b1 if (last and depth == 2) else b1 - 1
        src_jobs2 = jobs_in(max(b0 - 1, 0) * bx, s2_hi_blk * bx)
        s3_hi_blk = b1 if last else b1 - 2
        src_jobs3 = jobs_in(max(b0 - 2, 0) * bx, s3_hi_blk * bx) \
            if depth == 3 else []

    # ---- ordered operand tables ------------------------------------------
    in_entries: List[Tuple[str, str, Any]] = []
    out_entries: List[Tuple[str, str, Any]] = []
    aliases: Dict[int, int] = {}

    noalias_x = depth == 3 and bool(int(os.environ.get(
        "MNT_T2_NOALIAS_X", "0")))

    def add_state(key, in_spec, out_spec, alias=True):
        in_entries.append(("state", key, in_spec))
        if alias:
            aliases[len(in_entries) - 1] = len(out_entries)
        out_entries.append(("state", key, out_spec))

    def blk_in():
        return pl.BlockSpec((bx, Y, Z), lambda i: (s1map(i), 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_out():
        return pl.BlockSpec((bx, Y, Z), lambda i: (sKmap(i), 0, 0),
                            memory_space=pltpu.VMEM)

    for s in curls_b + curls_d:
        add_state(s.c, blk_in(), blk_out())

    # compact aux: x-compacts only on the matching edge side; y/z everywhere
    x_here: Dict[str, str] = {}
    for kind, store in (("fu", L.fu), ("eh", L.eh_store)):
        for c, (ax, lor, hir) in store.items():
            if ax == 0:
                rng = lor if edge_side == "lo" else hir
                if edge_side not in ("lo", "hi") or rng[1] <= rng[0]:
                    continue
                key = L.key(kind, c, edge_side)
                a = rng[0]
                base = a // bx
                cnt = (rng[1] - a) // bx
                in_spec = pl.BlockSpec(
                    (bx, Y, Z),
                    lambda i, base=base, cnt=cnt: (
                        jnp.clip(s1map(i) - base, 0, cnt - 1), 0, 0),
                    memory_space=pltpu.VMEM)
                out_spec = pl.BlockSpec(
                    (bx, Y, Z),
                    lambda i, base=base, cnt=cnt: (
                        jnp.clip(sKmap(i) - base, 0, cnt - 1), 0, 0),
                    memory_space=pltpu.VMEM)
                x_here[f"{kind}:{c}"] = key
                add_state(key, in_spec, out_spec, alias=not noalias_x)
            else:
                for side, (a, b) in (("lo", lor), ("hi", hir)):
                    if b <= a:
                        continue
                    key = L.key(kind, c, side)
                    shp = [bx, Y, Z]
                    shp[ax] = b - a
                    in_spec = pl.BlockSpec(tuple(shp),
                                           lambda i: (s1map(i), 0, 0),
                                           memory_space=pltpu.VMEM)
                    out_spec = pl.BlockSpec(tuple(shp),
                                            lambda i: (sKmap(i), 0, 0),
                                            memory_space=pltpu.VMEM)
                    add_state(key, in_spec, out_spec)

    # dispersive state: P/PP per pol component + stored-E over the
    # window — x-compact arrays of nd blocks starting at b0; stage-1
    # reads its own (clipped) block, the final stage writes (predicated)
    if disp:
        disp_in = pl.BlockSpec(
            (bx, Yw, Z),
            lambda i: (jnp.clip(s1map(i) - b0, 0, nd - 1), 0, 0),
            memory_space=pltpu.VMEM)
        disp_out = pl.BlockSpec(
            (bx, Yw, Z),
            lambda i: (jnp.clip(sKmap(i) - b0, 0, nd - 1), 0, 0),
            memory_space=pltpu.VMEM)
        for (pi, p, comps) in pol_entries:
            for c in comps:
                add_state(f"p{pi}:{c}", disp_in, disp_out)
                add_state(f"pp{pi}:{c}", disp_in, disp_out)
        for c in L.de_comps:
            add_state(f"de:{c}", disp_in, disp_out)

    # halo planes (old E_eff at (g+1)*bx) for step-1's forward x-diffs
    halo_keys: List[str] = []
    for s in curls_b:
        for g, a in ((s.g_plus, s.plus_axis), (s.g_minus, s.minus_axis)):
            if g is not None and a == 0 and g not in halo_keys:
                halo_keys.append(g)
    for g in halo_keys:
        in_entries.append(("halo", g,
                           pl.BlockSpec((1, Y, Z), lambda i: (s1map(i), 0, 0),
                                        memory_space=pltpu.VMEM)))

    # NL redundant-plane halos for STAGE 1 only (prev-step data,
    # host-precomputed exactly as the 1-step kernel's; stage-2 needs none)
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
                           pl.BlockSpec((1, Yw, Z),
                                        lambda i: (s1map(i), 0, 0),
                                        memory_space=pltpu.VMEM)))

    carry_keys: List[str] = []
    for s in curls_d:
        for g, a in ((s.g_plus, s.plus_axis), (s.g_minus, s.minus_axis)):
            if g is not None and a == 0 and g not in carry_keys:
                carry_keys.append(g)

    # coefficient arrays: x-blocked ones get @s1 and @s2 entries
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
    disp_coef_keys: List[str] = []
    for (pi, p, comps) in pol_entries:
        for c in comps:
            k = f"pol{pi}:{c}:{c[1]}"
            want_coef(k)
            if k not in disp_coef_keys:
                disp_coef_keys.append(k)
    for s in nl_specs:
        keys = []
        if s.has_chi3:
            keys += [f"{s.ec}:chi3", f"{s.ec}:chi2"]
        if s.has_nr:
            keys += [f"{s.ec}:nreps", f"{s.ec}:nrchi2"]
        for k in keys:
            want_coef(k)
            if k not in disp_coef_keys:
                disp_coef_keys.append(k)

    # folded-conductivity chain1 coefs (ops/pallas/condfold) are
    # full-grid AND consumed by the FINAL stage's D-half — unlike u,
    # whose final-stage reads collapse onto the stored-E slab pieces
    folded_chain = set()
    for s in curls_b + curls_d:
        if s.folded_cond:
            folded_chain |= {f"{s.c}:kap", f"{s.c}:sig", f"{s.c}:siginv"}

    xblocked: Dict[str, bool] = {}
    coefw_slices: Dict[str, Tuple[Any, ...]] = {}
    for k in coef_keys:
        arr = C0[k]
        if (disp and k in disp_coef_keys and arr.ndim == 3
                and arr.shape == tuple(S)):
            # dispersive material coefs (pol sigma / nreps / nrchi2 /
            # chi3 / chi2) are consumed on WINDOW rows only (cwin*):
            # ship them window-compact — x-range [db0*bx, db1*bx) with
            # clipped block indexing (like the P/de state), y-range
            # [wy0, wy1) — instead of (bx, Y, Z) full-plane windows
            xblocked[k] = "win"
            coefw_slices[k] = (slice(b0 * bx, (b0 + nd) * bx),
                               slice(wy0, wy1), slice(None))
            in_entries.append(("coefw", k, pl.BlockSpec(
                (bx, Yw, Z),
                lambda i: (jnp.clip(s1map(i) - b0, 0, nd - 1), 0, 0),
                memory_space=pltpu.VMEM)))
            continue
        if arr.ndim == 3 and arr.shape == tuple(S):
            # full-grid (u / folded chain1): non-final stages need the
            # full block at their own block (they assemble E_eff for the
            # next stage); the FINAL stage only needs slab pieces (below)
            # — except the folded chain1 coefs, read at every stage
            xblocked[k] = True
            in_entries.append(("coef1", k, pl.BlockSpec(
                (bx, Y, Z), lambda i: (s1map(i), 0, 0),
                memory_space=pltpu.VMEM)))
            # the middle stage's only full-grid coef need (u, for its
            # E_eff assembly) rides the cfa one-iteration scratch cache
            # relayed through the cross-call package — NOT a second
            # block-indexed entry of the same operand: that pattern
            # FailedPreconditions at dispatch on the Mosaic TPU backend
            # at sub-sublane bx (the depth-3 dispersive-plan edge calls,
            # bisected to the coef2 entries), and the cache also saves
            # one HBM traversal of u per fused step.  folded-cond chain1
            # coefs are consumed at EVERY stage's curl and keep their
            # per-stage entries (their plans run bx=8 where the backend
            # fault does not trigger).
            if k in folded_chain:
                in_entries.append(("coef2", k, pl.BlockSpec(
                    (bx, Y, Z), lambda i: (s2map(i), 0, 0),
                    memory_space=pltpu.VMEM)))
                if depth == 3:
                    in_entries.append(("coef3", k, pl.BlockSpec(
                        (bx, Y, Z), lambda i: (s3map(i), 0, 0),
                        memory_space=pltpu.VMEM)))
        elif arr.ndim == 3 and arr.shape[0] == S[0]:
            if depth == 3 and bool(int(os.environ.get(
                    "MNT_T2_XCOEF_DYN", "1"))):
                # depth-3 triage: ship the whole (S0, 1, 1) profile once
                # and dynamic-slice per stage in-kernel, instead of three
                # block-indexed entries of the same operand
                xblocked[k] = "dyn"
                in_entries.append(("coef", k, pl.BlockSpec(
                    tuple(arr.shape), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM)))
                continue
            xblocked[k] = True
            shp = (bx,) + tuple(arr.shape[1:])
            in_entries.append(("coef1", k, pl.BlockSpec(
                shp, lambda i: (s1map(i), 0, 0), memory_space=pltpu.VMEM)))
            in_entries.append(("coef2", k, pl.BlockSpec(
                shp, lambda i: (s2map(i), 0, 0), memory_space=pltpu.VMEM)))
            if depth == 3:
                in_entries.append(("coef3", k, pl.BlockSpec(
                    shp, lambda i: (s3map(i), 0, 0),
                    memory_space=pltpu.VMEM)))
        else:
            xblocked[k] = False
            in_entries.append(("coef", k, pl.BlockSpec(
                tuple(arr.shape), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM)))

    # host-pre-sliced y/z slab pieces of broadcast coefficient vectors
    # (block-independent -> shared by both steps)
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

    # piecewise dsig chains: the sigma/kappa chain is the identity outside
    # its slabs, so the 3-multiply chain runs only there — pre-sliced coef
    # pieces for y/z axes; x chains are skipped statically when this call's
    # whole x-range lies in the identity region
    dsig_mode: Dict[str, Any] = {}
    for s in curls_b + curls_d:
        c = s.c
        if s.dsig_axis is None:
            dsig_mode[c] = ("none",)
            continue
        if s.folded_cond:
            # folded conductivity: chain1 coefs are non-identity at the
            # interior conductive sites — never skip the chain (the
            # envelope check rejects these plans today; this keeps a
            # directly-constructed kernel correct regardless)
            dsig_mode[c] = ("x",) if s.dsig_axis == 0 \
                else ("full", s.dsig_axis)
            continue
        ax = s.dsig_axis
        lo_n, hi_n = s.dsig_slabs if s.dsig_slabs is not None else (0, 0)
        if ax == 0:
            x0 = max(b0 - 1, 0) * bx
            x1 = b1 * bx
            nsx = L.n_sites[0]
            if lo_n + hi_n == 0 or (x0 >= lo_n and x1 <= nsx - hi_n):
                dsig_mode[c] = ("plain",)
            else:
                dsig_mode[c] = ("x",)
            continue
        nax = L.n_sites[ax]
        Sax = S[ax]
        if ax != 1:
            # lane-axis (z) segment concats would need 128-aligned pieces;
            # not worth it — keep the full chain there
            dsig_mode[c] = ("full", ax)
            continue
        # sublane axis: 8-align the segment boundaries (Mosaic relayouts
        # of offset concat pieces crash the compiler); expanding the
        # chain into the identity region is exact (kap=1, sig=0)
        lo_al = -(-lo_n // 8) * 8
        hi0_al = ((nax - hi_n) // 8) * 8
        segs = []
        if lo_n > 0:
            segs.append(("lo", 0, lo_al))
            for nm in ("sig", "kap", "siginv"):
                want_coefslab(f"{c}:{nm}", ax, "dlo", 0, lo_al)
        if hi_n > 0:
            segs.append(("hi", hi0_al, Sax))
            for nm in ("sig", "kap", "siginv"):
                want_coefslab(f"{c}:{nm}", ax, "dhi", hi0_al, Sax)
        if not segs or hi0_al <= lo_al:
            dsig_mode[c] = ("full", ax)     # slabs cover everything
        else:
            dsig_mode[c] = ("pieces", ax, lo_al, hi0_al, segs)

    # u slab pieces for step-2's stored-E updates: y/z slabs blocked at the
    # step-2 block; x-compact range pieces on edge calls
    uslab_slices: Dict[str, Tuple[str, Tuple[Any, ...]]] = {}
    for s in ehs_e:
        if not s.has_u or s.ec not in L.eh_store:
            continue
        ax, lor, hir = L.eh_store[s.ec]
        uk = f"{s.ec}:u"
        if ax == 0:
            rng = lor if edge_side == "lo" else hir
            if edge_side in ("lo", "hi") and rng[1] > rng[0]:
                name = f"{uk}@x{edge_side}"
                a = rng[0]
                base, cnt = a // bx, (rng[1] - a) // bx
                uslab_slices[name] = (uk, _full_slice(0, slice(rng[0],
                                                               rng[1])))
                in_entries.append(("uslab", name, pl.BlockSpec(
                    (bx, Y, Z),
                    lambda i, base=base, cnt=cnt: (
                        jnp.clip(sKmap(i) - base, 0, cnt - 1), 0, 0),
                    memory_space=pltpu.VMEM)))
        else:
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b <= a:
                    continue
                name = f"{uk}@{side}"
                shp = [bx, Y, Z]
                shp[ax] = b - a
                uslab_slices[name] = (uk, _full_slice(ax, slice(a, b)))
                in_entries.append(("uslab", name, pl.BlockSpec(
                    tuple(shp), lambda i: (sKmap(i), 0, 0),
                    memory_space=pltpu.VMEM)))

    # per-step source waveform scalars: (2, 1) rows = (step-1, step-2)
    xs_keys: List[str] = []
    for (kre, kim, dc, pts) in src_jobs1 + src_jobs2 + src_jobs3:
        for kk in (kre, kim):
            if kk not in xs_keys:
                xs_keys.append(kk)
    for kk in xs_keys:
        in_entries.append(("xs", kk,
                           pl.BlockSpec((depth, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM)))
    if dyn_xoff:
        in_entries.append(("xs", "xoff",
                           pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM)))
        xs_keys.append("xoff")

    # ---- cross-call package ----------------------------------------------
    pkg_names: List[Tuple[str, Tuple[int, ...]]] = []
    for s in curls_d:
        pkg_names.append((f"d1:{s.c}", (bx, Y, Z)))
    for s in curls_b:
        pkg_names.append((f"b1:{s.c}", (bx, Y, Z)))
    for s in ehs_e:
        pkg_names.append((f"e1:{s.ec}", (bx, Y, Z)))
    yz_aux_keys: List[Tuple[str, Tuple[int, ...]]] = []
    for kind, store in (("fu", L.fu), ("eh", L.eh_store)):
        for c, (ax, lor, hir) in store.items():
            if ax == 0:
                continue
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b > a:
                    shp = [bx, Y, Z]
                    shp[ax] = b - a
                    yz_aux_keys.append((L.key(kind, c, side), tuple(shp)))
    for k, shp in yz_aux_keys:
        pkg_names.append((f"aux1:{k}", shp))
    if depth == 3:
        for s_ in curls_d:
            pkg_names.append((f"d2:{s_.c}", (bx, Y, Z)))
        for s_ in curls_b:
            pkg_names.append((f"b2:{s_.c}", (bx, Y, Z)))
        for s_ in ehs_e:
            pkg_names.append((f"e2:{s_.ec}", (bx, Y, Z)))
        for k, shp in yz_aux_keys:
            pkg_names.append((f"aux2:{k}", shp))
    for g in carry_keys:
        pkg_names.append((f"c1:{g}", (1, Y, Z)))
        pkg_names.append((f"c2:{g}", (1, Y, Z)))
        if depth == 3:
            pkg_names.append((f"c3:{g}", (1, Y, Z)))
    # full-grid u one-iteration caches for the depth-3 MIDDLE stage:
    # stage-2's block is stage-1's previous one, so stage-1's coef1 read
    # doubles as stage-2's; across calls the cache rides the package
    # (the previous call's last stage-1 block IS this call's b0-1
    # overrun block).  Replaces the per-stage coef2 block entries of the
    # same operand — the pattern behind the sub-sublane Mosaic dispatch
    # fault — and saves an HBM traversal of u per fused step.
    cfa_keys: List[str] = []
    if depth == 3:
        for s_ in ehs_e:
            if s_.has_u:
                uk = f"{s_.ec}:u"
                arr_u = plan.coefs[uk]
                if arr_u.ndim == 3 and arr_u.shape == tuple(S):
                    cfa_keys.append(uk)
        for k_ in cfa_keys:
            pkg_names.append((f"cfa:{k_}", (bx, Y, Z)))

    if not first:
        for name, shp in pkg_names:
            in_entries.append(("pkg", name, pl.BlockSpec(
                shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM)))
    if not last:
        for name, shp in pkg_names:
            out_entries.append(("pkgo", name, pl.BlockSpec(
                shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM)))
    if periodic is not None or edge_pkg:
        assert depth == 2 and first and last, \
            "periodic/edge t2: single depth-2 call only"
        assert periodic is None or not disp, \
            "periodic t2: linear only"
        assert not (periodic is not None and edge_pkg)
        # edge_pkg + disp (sharded dispersive t2) is admitted when the
        # caller guarantees the disp/NL support clears every shard
        # boundary (fused_mesh_t2._disp_clear_of_boundaries): the
        # boundary strips are then exactly linear
        for g in carry_keys:
            for nm in ("wrapc1", "wrapc2"):
                in_entries.append(("pkg", f"{nm}:{g}", pl.BlockSpec(
                    (1, Y, Z), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM)))
    if edge_pkg:
        for s in ehs_e:
            in_entries.append(("pkg", f"wrape1:{s.ec}", pl.BlockSpec(
                (1, Y, Z), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM)))

    # scratch: previous block's post-step-1 package + x-compact aux + carries
    scratch_entries: List[Tuple[str, Tuple[int, ...]]] = list(pkg_names)
    if periodic is not None:
        for s in ehs_e:
            scratch_entries.append((f"wrape1:{s.ec}", (1, Y, Z)))
    for fullkey, key in x_here.items():
        scratch_entries.append((f"xaux1:{key}", (bx, Y, Z)))
        if depth == 3:
            scratch_entries.append((f"xaux2:{key}", (bx, Y, Z)))

    # dispersive scratch: stage-1's P/PP/de for the trailing block, per-
    # stage dmp carries, and prev-iteration coef caches (stage-2's block
    # is stage-1's previous block, so stage-1's coef reads double as
    # stage-2's — saving a second HBM traversal of every disp coef)
    cfw_keys: List[str] = []       # (bx, Yw, Z) window-coef caches
    cfu_keys: List[str] = []       # (bx, Y, Z) full-u caches (de comps)
    disp_snap: List[str] = []      # snapshotted before stage-1 overwrites
    if disp:
        for (pi, p, comps) in pol_entries:
            for c in comps:
                disp_snap += [f"p1:{pi}:{c}", f"pp1:{pi}:{c}"]
        for ec in L.de_comps:
            disp_snap.append(f"de1:{ec}")
        for k in disp_coef_keys:
            if C0[k].ndim == 3 and C0[k].shape == tuple(S):
                cfw_keys.append(k)
        for ec in L.de_comps:
            s_ = L.eh_by_ec[ec]
            if s_.has_u and C0[f"{ec}:u"].ndim == 3 \
                    and C0[f"{ec}:u"].shape == tuple(S):
                cfu_keys.append(f"{ec}:u")
        for name in disp_snap:
            scratch_entries.append((name, (bx, Yw, Z)))
        for k in cfw_keys:
            scratch_entries.append((f"cfw:{k}", (bx, Yw, Z)))
        for k in cfu_keys:
            scratch_entries.append((f"cfu:{k}", (bx, Y, Z)))
        for dc in nl_bwd:
            scratch_entries.append((f"dmp1:{dc}", (1, Yw, Z)))
            scratch_entries.append((f"dmp2:{dc}", (1, Yw, Z)))
            if depth == 3:
                scratch_entries.append((f"dmpM:{dc}", (1, Yw, Z)))
        if depth == 3:
            # second-level snapshots: the MIDDLE stage's disp results +
            # a one-more-iteration relay of the window coef caches, so
            # the final stage reads ITS block's values (pure-ADE windows
            # only; supported() rejects nl at depth 3)
            for (pi, p, comps) in pol_entries:
                for c in comps:
                    scratch_entries.append((f"p2:{pi}:{c}", (bx, Yw, Z)))
                    scratch_entries.append((f"pp2:{pi}:{c}", (bx, Yw, Z)))
            for ec in L.de_comps:
                scratch_entries.append((f"de2:{ec}", (bx, Yw, Z)))
            for k in cfw_keys:
                scratch_entries.append((f"cfw2:{k}", (bx, Yw, Z)))
            for k in cfu_keys:
                scratch_entries.append((f"cfu2:{k}", (bx, Y, Z)))
    disp_zero: List[Tuple[str, Tuple[int, ...]]] = \
        [(n, shp) for (n, shp) in scratch_entries
         if n.split(":")[0] in ("p1", "pp1", "de1", "cfw", "cfu",
                                "dmp1", "dmp2", "dmpM", "p2", "pp2",
                                "de2", "cfw2", "cfu2")]
    # cross-iteration (ping-pong, 2-slot) package scratch: everything
    # except the in-order read-then-write carries and the long-lived
    # periodic wrap plane (see the kernel-body comment).  In interpret
    # mode (CPU tests) the dynamic slot indexing is ~7x slower per op,
    # so the semantically-equivalent whole-package snapshot path is used
    # instead — MNT_T2_PP_FORCE=1 forces ping-pong for the interpret
    # exactness gate that validates the slot indexing itself
    # (test_fdtd3d_t2.py::test_pingpong_slots_interpret).
    pp_mode = (not _interpret_mode()
               or bool(int(os.environ.get("MNT_T2_PP_FORCE", "0"))))
    # Coefficient caches (cfw/cfu/cfa and their second-level relays) are
    # pure functions of the iteration's coef windows, so their writes
    # are DEFERRED to the end of the body (after every read): in-order
    # single-slot scratch with no extra liveness — they need neither
    # slots nor snapshots.
    pp_set = {n for (n, _shp) in scratch_entries
              if n.split(":")[0] not in ("c1", "wrape1", "dmp1", "dmp2",
                                         "dmpM", "cfw", "cfu", "cfa",
                                         "cfw2", "cfu2")} if pp_mode \
        else set()

    # ---- DFT capture jobs: emit stage-s effective-field planes -------
    # For d=1 monitored runs (NL media disable DFT decimation,
    # dft.cpp:195-216), the hybrid needs E/H at EVERY intermediate step
    # of the fused sweep.  Each capture (stage s, comp, global plane x)
    # is owned by exactly one call: stage s's live pass over block
    # bm = x // bx happens at iteration bm - b0 + (s-1) of that call
    # (coverage [b0 - (s-1), b1 - (s-1)) interior, clamped at the
    # first/last call).  The plane is written to a dedicated (1, Y, Z)
    # output, predicated on the iteration (in-kernel dft.cpp:265
    # sampling without materializing intermediate full states).
    cap_jobs: List[Tuple[int, str, int, int, str]] = []
    for (s_, comp_, x_) in (cap or []):
        bm = x_ // bx
        lo_ok = bm >= b0 if (first or s_ == 1) else bm >= b0 - (s_ - 1)
        hi_ok = bm < b1 if (last or s_ == 1) else bm < b1 - (s_ - 1)
        ic = bm - b0 + (s_ - 1)
        if lo_ok and hi_ok and 0 <= ic < grid:
            name = f"cap:{s_}:{comp_}:{x_}"
            out_entries.append(("cap", name, pl.BlockSpec(
                (1, Y, Z), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)))
            cap_jobs.append((s_, comp_, x_ - bm * bx, ic, name))

    n_in = len(in_entries)
    mask_info = {c: _plane_lists(plan, c)
                 for c in [s.c for s in curls_b + curls_d]}

    def sel(pred, a, b):
        if pred is True:
            return a
        if pred is False:
            return b
        return jnp.where(pred, a, b)

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
        sc = {name: r for (name, _), r in zip(scratch_entries, scratch)}

        i = pl.program_id(0)
        ok2 = (i >= 1) if first else True
        xsel1 = False if s1_xn == 0 else (i < s1_xn)
        if s2_x0 is None:
            xsel2 = False
        elif s2_x0 == "all":
            xsel2 = True
        else:
            xsel2 = (i >= s2_x0)
        if depth == 3:
            # middle stage's block can overrun into the interior (the lo
            # call runs step-1 depth-1 blocks past its x-compact range)
            if edge_side == "lo":
                xsel2m = (i - 1 < s1_xn)
            elif edge_side == "hi":
                xsel2m = (i >= 1)
            else:
                xsel2m = False
            if s2_x0 is None:
                xsel3 = False
            elif s2_x0 == "all":
                xsel3 = True
            else:
                xsel3 = (i >= s2_x0 + 1)

        # ---- ping-pong package scratch --------------------------------
        # Each cross-iteration package array carries a leading slot dim
        # of 2: iteration i WRITES slot i%2 and READS slot 1-i%2 (the
        # previous iteration's values).  The old design snapshotted every
        # package into SSA values at the top of the body, which kept
        # ~35 block-sized vectors live across the whole kernel — Mosaic's
        # register allocator spilled them all to VMEM (61.7 MB of spill
        # slots at 192^3, plus a full copy of every package per
        # iteration).  Slot-indexed lazy reads at the use sites remove
        # both the spill liveness and the copies.  In-order read-then-
        # write carries (c1, dmp*) and the long-lived wrape1 plane stay
        # single-slot.
        if pp_mode:
            par = jax.lax.rem(i, 2)

            def ppr(name):
                """Previous iteration's package value (single-slot names
                are written at body end, so a direct read is in-order)."""
                if name not in pp_set:
                    return sc[name][...]
                return sc[name][pl.ds(1 - par, 1)][0]

            def ppw(name, val):
                """Write this iteration's package value."""
                if name not in pp_set:
                    sc[name][...] = val
                    return
                sc[name][pl.ds(par, 1)] = val[None]

            def ppc(name):
                """This iteration's (just-written) package value."""
                if name not in pp_set:
                    return sc[name][...]
                return sc[name][pl.ds(par, 1)][0]

        def init_pp(name, val, shp):
            """i==0 init of a package entry so i==0 readers see `val`."""
            if name in pp_set:
                sc[name][1:2] = val.reshape((1,) + shp)
            else:
                sc[name][...] = val

        if first:
            @pl.when(i == 0)
            def _():
                for g in carry_keys:
                    if periodic is not None or edge_pkg:
                        # x-Bloch wrap / shard boundary: stage-1's
                        # plane-0 backward ghost is the host-recomputed
                        # boundary carry
                        sc[f"c1:{g}"][...] = \
                            byname[("pkg", f"wrapc1:{g}")][...]
                    else:
                        sc[f"c1:{g}"][...] = jnp.zeros((1, Y, Z), dtype)
                    init_pp(f"c2:{g}", jnp.zeros((1, Y, Z), dtype),
                            (1, Y, Z))
                    if depth == 3:
                        init_pp(f"c3:{g}", jnp.zeros((1, Y, Z), dtype),
                                (1, Y, Z))
                for name, shp in disp_zero:
                    init_pp(name, jnp.zeros(shp, dtype), shp)
        else:
            @pl.when(i == 0)
            def _():
                # i == 0 readers consume slot 1 (1 - 0%2)
                for name, shp in pkg_names:
                    init_pp(name, byname[("pkg", name)][...], shp)
                for name, shp in disp_zero:
                    init_pp(name, jnp.zeros(shp, dtype), shp)

        if not pp_mode:
            # interpret-mode fallback: snapshot ALL trailing-block
            # packages into SSA values BEFORE any stage overwrites
            # (the pre-round-5 design; exact but register-hungry)
            _snap = {name: sc[name][...] for name, _shp in pkg_names}
            for _fk, key in x_here.items():
                _snap[f"xaux1:{key}"] = sc[f"xaux1:{key}"][...]
                if depth == 3:
                    _snap[f"xaux2:{key}"] = sc[f"xaux2:{key}"][...]
            for name, _shp in disp_zero:
                if not name.startswith("dmp"):
                    _snap[name] = sc[name][...]

            def ppr(name):
                return _snap[name]

            def ppw(name, val):
                sc[name][...] = val

            def ppc(name):
                return sc[name][...]

        xoff0 = byname[("xs", "xoff")][0, 0] if dyn_xoff else 0

        def _dynblk(k, gblk):
            return byname[("coef", k)][pl.ds(gblk * bx, bx), :, :]

        def coef1(k):
            if xblocked[k] == "dyn":
                return _dynblk(k, s1map(i))
            if xblocked[k] == "win":
                return byname[("coefw", k)][...]
            return byname[("coef1" if xblocked[k] else "coef", k)][...]

        def coef2(k):
            if xblocked[k] == "dyn":
                return _dynblk(k, s2map(i))
            return byname[("coef2" if xblocked[k] else "coef", k)][...]

        def coef3(k):
            if xblocked[k] == "dyn":
                return _dynblk(k, s3map(i))
            return byname[("coef3" if xblocked[k] else "coef", k)][...]

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

        # dispersive stage predicates: dsel1 = stage-1's block is a
        # window block; dselF = the final stage's block is (and the
        # write is live at all)
        if disp:
            dsel1 = (s1map(i) - b0) < nd
            jsF = sKmap(i) - b0
            inwin = (jsF >= 0) & (jsF < nd)
            okFd = ((i >= depth - 1) if first else True)
            dselF = inwin if okFd is True else (inwin & okFd)
            if depth == 3:
                js2 = s2map(i) - b0
                dsel2 = (js2 >= 0) & (js2 < nd)
            else:
                dsel2 = False
        else:
            dsel1 = dsel2 = dselF = False

        def cap_write(stage, e_eff_d, h_eff_d):
            """Emit this stage's captured DFT planes (cap_jobs owned by
            this call and stage), predicated on the owning iteration."""
            for (s_, comp_, xr, ic, name) in cap_jobs:
                if s_ != stage:
                    continue
                src_d = e_eff_d if comp_[0] == "e" else h_eff_d
                if src_d is None or comp_ not in src_d:
                    continue

                @pl.when(i == ic)
                def _(v=src_d[comp_][xr:xr + 1], name=name):
                    outname[("cap", name)][...] = v

        def apply_mask(c, val, gx0):
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

        def add_sources(new_f, jobs, xs_row, gx0):
            for (kre, kim, dc, pts) in jobs:
                if dc not in new_f:
                    continue
                w_re = byname[("xs", kre)][xs_row, 0]
                w_im = byname[("xs", kim)][xs_row, 0]
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
            return new_f

        def curl_half(curls, g_eff, x_nb, is_d, gx0, coefr, f_old_get,
                      aux_get, aux_put, xsel, jobs, xs_row):
            """One curl half-step.  aux_get/aux_put route fu slab reads and
            writes (step-1 -> scratch, step-2 -> outputs)."""
            sgn = 1.0 if is_d else -1.0
            new_f: Dict[str, Any] = {}
            for s in curls:
                c = s.c
                f_old = f_old_get(c)

                def diff(gname, axis):
                    garr = g_eff[gname]
                    if axis == 0:
                        if is_d:
                            shifted = jnp.concatenate(
                                [x_nb[gname], garr[:-1]], axis=0)
                            return garr - shifted
                        shifted = jnp.concatenate(
                            [garr[1:], x_nb[gname]], axis=0)
                        return shifted - garr
                    if is_d:
                        mi = mirr_yz.get((gname, axis))
                        if mi is not None:
                            # node-mirror fold ghost at plane 0 (see
                            # fdtd3d.mirror_yz_info): in-register row
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

                # piecewise dsig chain: identity (g + d) outside the sigma
                # slabs, the 3-multiply chain only inside them
                mode = dsig_mode[c]

                def chain1(gval, dflv, axsl=None):
                    # axsl = (axis, slice): gval/dflv pre-sliced along a
                    # sigu slab axis — coefs extended there (full-grid
                    # folded-cond chain1 arrays) must be sliced to match
                    if mode[0] in ("none", "plain"):
                        return gval + dflv
                    if mode[0] in ("x", "full"):
                        def cf(nm):
                            v = coefr(f"{c}:{nm}")
                            if axsl is not None \
                                    and v.shape[axsl[0]] > 1:
                                return v[_full_slice(axsl[0], axsl[1])]
                            return v
                        return ((cf("kap") - cf("sig")) * gval + dflv) \
                            * cf("siginv")
                    _, dax, lo_n, hi0, segs = mode
                    seg_by = {nm2: (a2, b2) for nm2, a2, b2 in segs}
                    pieces = []

                    def seg_chain(side, a2, b2):
                        slq = _full_slice(dax, slice(a2, b2))
                        kp = byname[("coefslab", f"{c}:kap@d{side}")][...]
                        sg = byname[("coefslab", f"{c}:sig@d{side}")][...]
                        si = byname[("coefslab",
                                     f"{c}:siginv@d{side}")][...]
                        return ((kp - sg) * gval[slq] + dflv[slq]) * si

                    if "lo" in seg_by:
                        pieces.append(seg_chain("lo", *seg_by["lo"]))
                    midq = _full_slice(dax, slice(lo_n, hi0))
                    pieces.append(gval[midq] + dflv[midq])
                    if "hi" in seg_by:
                        pieces.append(seg_chain("hi", *seg_by["hi"]))
                    return jnp.concatenate(pieces, axis=dax)

                if s.dsigu_axis is None:
                    f_new = chain1(f_old, dfl)
                elif s.dsigu_axis == 0:
                    key = x_here.get(f"fu:{c}")
                    plain = chain1(f_old, dfl)
                    if key is None:
                        f_new = plain
                    else:
                        ku = coefr(f"{c}:kapu")
                        su = coefr(f"{c}:sigu")
                        siu = coefr(f"{c}:siginvu")
                        fu_old = aux_get(key, True)
                        fu_new = chain1(fu_old, dfl)
                        aux_put(key, True, fu_new, xsel)
                        f_x = siu * ((ku - su) * f_old + fu_new - fu_old)
                        f_new = sel(xsel, f_x, plain)
                else:
                    ax = s.dsigu_axis
                    _, lor, hir = L.fu[c]
                    a_lo, b_lo = lor
                    a_hi, b_hi = hir
                    pieces = []

                    def chain2(fseg, dseg, key, side, sl):
                        ku = byname[("coefslab", f"{c}:kapu@{side}")][...]
                        su = byname[("coefslab", f"{c}:sigu@{side}")][...]
                        siu = byname[("coefslab",
                                      f"{c}:siginvu@{side}")][...]
                        fu_old = aux_get(key, False)
                        fu_new = chain1(fu_old, dseg, (ax, sl))
                        aux_put(key, False, fu_new, True)
                        return siu * ((ku - su) * fseg + fu_new - fu_old)

                    if b_lo > a_lo:
                        slq = _full_slice(ax, slice(a_lo, b_lo))
                        pieces.append(chain2(f_old[slq], dfl[slq],
                                             L.key("fu", c, "lo"), "lo",
                                             slice(a_lo, b_lo)))
                    if a_hi > b_lo:
                        mid = slice(b_lo, a_hi)
                        midq = _full_slice(ax, mid)
                        pieces.append(chain1(f_old[midq], dfl[midq],
                                             (ax, mid)))
                    if b_hi > a_hi:
                        slq = _full_slice(ax, slice(a_hi, b_hi))
                        pieces.append(chain2(f_old[slq], dfl[slq],
                                             L.key("fu", c, "hi"), "hi",
                                             slice(a_hi, b_hi)))
                    f_new = jnp.concatenate(pieces, axis=ax) \
                        if len(pieces) > 1 else pieces[0]
                new_f[c] = apply_mask(c, f_new, gx0)
            return add_sources(new_f, jobs, xs_row, gx0)

        def eh_full(ehs, new_f, lin_old_get, aux_get, aux_put, coefr,
                    u_get, xsel, ov_new=None, ov_old=None, ov_pred=True):
            """E/H from the W chains with full-block lin available; returns
            the effective fields (stored slabs overlaid).  ov_new/ov_old:
            dispersive window values (per de comp) overlaid onto the
            y-window rows of lin when ov_pred selects (the stage's block
            is a window block)."""
            eff: Dict[str, Any] = {}
            for s in ehs:
                ec, dc_ = s.ec, s.dc
                u = u_get(ec)
                d_new = new_f[dc_]
                lin_new = d_new * u if u is not None else d_new
                if ov_new and ec in ov_new:
                    lin_new = overlay_win(
                        lin_new, sel(ov_pred, ov_new[ec], win(lin_new)))
                if ec not in L.eh_store:
                    eff[ec] = lin_new
                    continue
                ax, lor, hir = L.eh_store[ec]
                d_old = lin_old_get(dc_)
                lin_old = d_old * u if u is not None else d_old
                if ov_old and ec in ov_old:
                    lin_old = overlay_win(
                        lin_old, sel(ov_pred, ov_old[ec], win(lin_old)))
                if ax == 0:
                    key = x_here.get(f"eh:{ec}")
                    if key is None:
                        eff[ec] = lin_new
                        continue
                    kw = coefr(f"{ec}:kapw")
                    sw = coefr(f"{ec}:sigw")
                    e_old = aux_get(key, True)
                    e_new = e_old + (kw + sw) * lin_new - (kw - sw) * lin_old
                    aux_put(key, True, e_new, xsel)
                    eff[ec] = sel(xsel, e_new, lin_new)
                    continue
                a_lo, b_lo = lor
                a_hi, b_hi = hir
                pieces = []

                def wseg(key, sl, side):
                    kw = byname[("coefslab", f"{ec}:kapw@{side}")][...]
                    sw = byname[("coefslab", f"{ec}:sigw@{side}")][...]
                    slq = _full_slice(ax, sl)
                    e_old = aux_get(key, False)
                    e_new = e_old + (kw + sw) * lin_new[slq] \
                        - (kw - sw) * lin_old[slq]
                    aux_put(key, False, e_new, True)
                    return e_new

                if b_lo > a_lo:
                    pieces.append(wseg(L.key("eh", ec, "lo"),
                                       slice(a_lo, b_lo), "lo"))
                if a_hi > b_lo:
                    pieces.append(lin_new[_full_slice(ax,
                                                      slice(b_lo, a_hi))])
                if b_hi > a_hi:
                    pieces.append(wseg(L.key("eh", ec, "hi"),
                                       slice(a_hi, b_hi), "hi"))
                eff[ec] = jnp.concatenate(pieces, axis=ax) \
                    if len(pieces) > 1 else pieces[0]
            return eff

        # ---- dispersive D-half machinery (mirrors fdtd3d._build_call's
        # disp section; see the _disp_setup invariants) -------------------
        def disp_dhalf(new_f, p_get, pp_get, de_old, cwin, uwin,
                       dmp_pref, dmp_next):
            """One stage's dispersive D-half: dmp = D - sum P over the
            window, NL (chi3 Pade / chi2-Newton) corrections, pol ADE
            leapfrog.  Returns (lin_sub, pnew)."""
            dmp = {}
            for s in ehs_e:
                v = win(new_f[s.dc])
                for (pi2, cpc) in pol_by_dc.get(s.dc, []):
                    v = v - p_get(pi2, cpc)
                dmp[s.dc] = v
            carry_prev = {dc: sc[f"{dmp_pref}:{dc}"][...] for dc in nl_bwd}
            for dc in nl_bwd:
                sc[f"{dmp_pref}:{dc}"][...] = dmp[dc][bx - 1:bx]

            def shift_dmp(dc_name, axis, by):
                g = dmp[dc_name]
                if axis == 0:
                    if by > 0:
                        return jnp.concatenate(
                            [g[1:], dmp_next[dc_name]], axis=0)
                    return jnp.concatenate(
                        [carry_prev[dc_name], g[:-1]], axis=0)
                return shift_yz(g, axis, by)

            def sum4(dc_name, ax_own_, ax_off_):
                """gs_2-style 4-neighbor sum (step_generic.cpp:740)."""
                g = dmp[dc_name]
                g_s = shift_dmp(dc_name, ax_own_, +1)
                g_x = shift_dmp(dc_name, ax_off_, -1)
                if ax_off_ == 0:
                    prv = shift_yz(carry_prev[dc_name], ax_own_, +1)
                    g_sx = jnp.concatenate([prv, g_s[:-1]], axis=0)
                else:
                    g_sx = shift_yz(g_s, ax_off_, -1)
                return g + g_s + g_x + g_sx

            lin_sub: Dict[str, Any] = {}
            for s in ehs_e:
                ec, dc_ = s.ec, s.dc
                if ec not in de_set:
                    continue
                gs = dmp[dc_]
                u_w = uwin(ec)
                l_s = gs * u_w if u_w is not None else gs
                u_nl = u_w if u_w is not None else 1.0
                if s.has_chi3:
                    Dsqr = gs * gs
                    if s.dc1 is not None and s.ax_1 is not None:
                        g1s = sum4(s.dc1, s.ax_own, s.ax_1)
                        Dsqr = Dsqr + 0.0625 * (g1s * g1s)
                    if s.dc2 is not None and s.ax_2 is not None:
                        g2s = sum4(s.dc2, s.ax_own, s.ax_2)
                        Dsqr = Dsqr + 0.0625 * (g2s * g2s)
                    c2 = gs * cwin(f"{ec}:chi2") * (u_nl * u_nl)
                    c3 = Dsqr * cwin(f"{ec}:chi3") \
                        * (u_nl * u_nl * u_nl)
                    l_s = l_s * (1 + c2 + 2 * c3) / (1 + 2 * c2 + 3 * c3)
                if s.has_nr:
                    g_1 = 0.25 * sum4(s.dc1, s.ax_own, s.ax_1) \
                        if s.dc1 is not None else jnp.zeros_like(gs)
                    g_2 = 0.25 * sum4(s.dc2, s.ax_own, s.ax_2) \
                        if s.dc2 is not None else jnp.zeros_like(gs)
                    epsv = cwin(f"{ec}:nreps")
                    chi2v = cwin(f"{ec}:nrchi2")
                    own, _, _ = _nr_solve(gs, g_1, g_2, epsv, chi2v,
                                          de_old[ec], g_1 * u_nl,
                                          g_2 * u_nl)
                    l_s = jnp.where(chi2v != 0, own, l_s)
                lin_sub[ec] = l_s
            pnew: Dict[Tuple[int, str], Any] = {}
            for (pi2, p2, comps) in pol_entries:
                w2pi = 2 * math.pi * p2.omega0
                g2pi = 2 * math.pi * p2.gamma
                omega0dtsqr = (w2pi * dt) ** 2
                g1inv = 1.0 / (1 + 0.5 * g2pi * dt)
                g1c = 1 - 0.5 * g2pi * dt
                denom = 0.0 if p2.drude else omega0dtsqr
                for c in comps:
                    sigv = cwin(f"pol{pi2}:{c}:{c[1]}")
                    pcur = p_get(pi2, c)
                    ppcur = pp_get(pi2, c)
                    pnew[(pi2, c)] = g1inv * (
                        pcur * (2 - denom) - g1c * ppcur
                        + omega0dtsqr * sigv * lin_sub[c])
            return lin_sub, pnew

        def nl_next1(h_eff):
            """Stage-1's dmp at this call's next-block plane q = gx1 + bx:
            interior-rule redundant recompute from host-precomputed
            prev-step halo planes (valid on the NL stencil columns by the
            _disp_setup invariants — garbage elsewhere, masked by the
            chi != 0 selects)."""
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
                    tm = pdiff(s.g_minus, s.minus_axis)
                    total = -tm if total is None else total - tm
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
                    tm = pdiff(s.g_minus, s.minus_axis)
                    total = -tm if total is None else total - tm
                d_new_q = nlh(f"d0:{s.c}") + dtdx * total
                if s.c in pol_by_dc:
                    d_new_q = d_new_q - nlh(f"ps:{s.c}")
                out[s.c] = d_new_q
            return out

        def nl_next2(hF_eff, e1_eff, new_b1, new_d1, ps1_q):
            """Stage-2's dmp at its next plane q = the first plane of
            stage-1's CURRENT block — EXACT from this iteration's
            in-register stage-1 results (no redundant recompute): the
            forward-diff partner E1(q), E1(q+1) are e1_eff planes 0/1
            (bx >= 2), B1(q)/D1(q)/sum-P1(q) stage-1 outputs, and the
            backward-diff H2(q-1) is the stage-2 block's own last
            plane."""
            e_q = {g: win(e1_eff[g][0:1]) for g in e_q_names}
            e_q1 = {g: win(e1_eff[g][1:2]) for g in e_q1_names}
            h_new_q = {}
            for s in b_specs_fwd:
                def pdiff(gname, axis):
                    if axis == 0:
                        return e_q1[gname] - e_q[gname]
                    return shift_yz(e_q[gname], axis, +1) - e_q[gname]
                total = None
                if s.g_plus is not None:
                    total = pdiff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    tm = pdiff(s.g_minus, s.minus_axis)
                    total = -tm if total is None else total - tm
                h_new_q[s.ec] = win(new_b1[s.c][0:1]) - dtdx * total
            out = {}
            for s in d_specs_fwd:
                def pdiff(gname, axis):
                    if axis == 0:
                        return h_new_q[gname] \
                            - win(hF_eff[gname][bx - 1:bx])
                    return h_new_q[gname] \
                        - shift_yz(h_new_q[gname], axis, -1)
                total = None
                if s.g_plus is not None:
                    total = pdiff(s.g_plus, s.plus_axis)
                if s.g_minus is not None:
                    tm = pdiff(s.g_minus, s.minus_axis)
                    total = -tm if total is None else total - tm
                d_new_q = win(new_d1[s.c][0:1]) + dtdx * total
                if s.c in pol_by_dc:
                    d_new_q = d_new_q - ps1_q[s.c]
                out[s.c] = d_new_q
            return out

        # ================= STEP 1 on block s1map(i) =======================
        gx1 = s1map(i) * bx + xoff0

        def aux_get1(key, is_x):
            return byname[("state", key)][...]

        def aux_put1(key, is_x, val, pred):
            ppw(("xaux1:" if is_x else "aux1:") + key, val)

        def f_old1(c):
            return byname[("state", c)][...]

        def u1(ec):
            spec = L.eh_by_ec[ec]
            return coef1(f"{ec}:u") if spec.has_u else None

        de_old1 = {ec: byname[("state", f"de:{ec}")][...]
                   for ec in de_set} if disp else {}

        e_eff_old = {}
        for s in ehs_e:
            d_old = byname[("state", s.dc)][...]
            u = u1(s.ec)
            lin = d_old * u if u is not None else d_old
            if disp and s.ec in de_set:
                lin = overlay_win(lin, sel(dsel1, de_old1[s.ec], win(lin)))
            if s.ec not in L.eh_store:
                e_eff_old[s.ec] = lin
                continue
            ax, lor, hir = L.eh_store[s.ec]
            if ax == 0:
                key = x_here.get(f"eh:{s.ec}")
                e_eff_old[s.ec] = lin if key is None else \
                    sel(xsel1, byname[("state", key)][...], lin)
                continue
            a_lo, b_lo = lor
            a_hi, b_hi = hir
            pieces = []
            if b_lo > a_lo:
                pieces.append(byname[("state", L.key("eh", s.ec, "lo"))][...])
            if a_hi > b_lo:
                pieces.append(lin[_full_slice(ax, slice(b_lo, a_hi))])
            if b_hi > a_hi:
                pieces.append(byname[("state", L.key("eh", s.ec, "hi"))][...])
            e_eff_old[s.ec] = jnp.concatenate(pieces, axis=ax) \
                if len(pieces) > 1 else pieces[0]

        halo_pl = {g: byname[("halo", g)][...] for g in halo_keys}
        new_b1 = curl_half(curls_b, e_eff_old, halo_pl, False, gx1, coef1,
                           f_old1, aux_get1, aux_put1, xsel1, src_jobs1, 0)
        h1_eff = eh_full(ehs_h, new_b1, f_old1, aux_get1, aux_put1, coef1,
                         lambda ec: None, xsel1)
        c1_prev = {g: sc[f"c1:{g}"][...] for g in carry_keys}
        for g in carry_keys:
            sc[f"c1:{g}"][...] = h1_eff[g][bx - 1:bx]
        new_d1 = curl_half(curls_d, h1_eff, c1_prev, True, gx1, coef1,
                           f_old1, aux_get1, aux_put1, xsel1, src_jobs1, 0)

        lin_sub1 = pnew1 = None
        ps1_q: Dict[str, Any] = {}
        if disp:
            def cwin1(k):
                a = coef1(k)
                return a[:, wy0:wy1, :] if a.shape[1] == Y else a

            def uwin1(ec):
                u = u1(ec)
                if u is None:
                    return None
                return u[:, wy0:wy1, :] if u.shape[1] == Y else u

            def p_get1(pi2, c):
                return byname[("state", f"p{pi2}:{c}")][...]

            def pp_get1(pi2, c):
                return byname[("state", f"pp{pi2}:{c}")][...]

            dmp_next1 = nl_next1(h1_eff) if nl_fwd else {}
            lin_sub1, pnew1 = disp_dhalf(new_d1, p_get1, pp_get1, de_old1,
                                         cwin1, uwin1, "dmp1", dmp_next1)
        e1_eff = eh_full(ehs_e, new_d1, f_old1, aux_get1, aux_put1, coef1,
                         u1, xsel1, ov_new=lin_sub1, ov_old=de_old1 or None,
                         ov_pred=dsel1)
        if disp:
            for (pi2, p2, comps) in pol_entries:
                for c in comps:
                    ppw(f"p1:{pi2}:{c}", pnew1[(pi2, c)])
                    ppw(f"pp1:{pi2}:{c}",
                        byname[("state", f"p{pi2}:{c}")][...])
            for ec in L.de_comps:
                ppw(f"de1:{ec}", lin_sub1[ec])
            for dc2, lst in pol_by_dc.items():
                tot = None
                for (pi2, c2c) in lst:
                    v = pnew1[(pi2, c2c)][0:1]
                    tot = v if tot is None else tot + v
                ps1_q[dc2] = sel(dsel1, tot,
                                 jnp.zeros((1, Yw, Z), dtype))
        for s in curls_d:
            ppw(f"d1:{s.c}", new_d1[s.c])
        for s in curls_b:
            ppw(f"b1:{s.c}", new_b1[s.c])
        for s in ehs_e:
            ppw(f"e1:{s.ec}", e1_eff[s.ec])
        cap_write(1, e1_eff, h1_eff)

        zero_pl = jnp.zeros((1, Y, Z), dtype)
        if periodic is not None:
            ph_w, i_wrap, row_wrap = periodic

            @pl.when(i == 0)
            def _():
                # save stage-1's plane-0 E_eff: the wrap ghost source
                for s in ehs_e:
                    sc[f"wrape1:{s.ec}"][...] = e1_eff[s.ec][0:1]

            @pl.when(i == i_wrap)
            def _():
                # stage-2's in-register forward diff at plane num-1
                # reads the dead plane num of the e1 scratch: overwrite
                # its row (in THIS iteration's slot, which stage-2 reads
                # next iteration) with the wrapped ghost ph * E1(0)
                for s in ehs_e:
                    if pp_mode:
                        sc[f"e1:{s.ec}"][pl.ds(par, 1),
                                         row_wrap:row_wrap + 1] = \
                            (ph_w * sc[f"wrape1:{s.ec}"][...])[None]
                    else:
                        sc[f"e1:{s.ec}"][row_wrap:row_wrap + 1] = \
                            ph_w * sc[f"wrape1:{s.ec}"][...]

        # stage-1 produced e1_eff for block s1map(i); its first plane is the
        # forward halo of the NEXT stage (zero past the last real block;
        # the wrapped ghost at an x-Bloch wrap)
        e1_first = {ec: (e1_eff[ec][0:1] if not last
                         else sel(i < n1, e1_eff[ec][0:1], zero_pl))
                    for ec in e1_eff}
        if periodic is not None:
            wrap_pred = (i >= n1) if row_wrap != 0 \
                else ((i >= n1) | (i == i_wrap))
            e1_first = {ec: sel(wrap_pred,
                                ph_w * sc[f"wrape1:{ec}"][...],
                                e1_eff[ec][0:1])
                        for ec in e1_eff}
        if edge_pkg:
            # shard boundary: stage-2's forward ghost past the last
            # block is the host-recomputed right-neighbor plane
            e1_first = {ec: sel(i >= n1,
                                byname[("pkg", f"wrape1:{ec}")][...],
                                e1_eff[ec][0:1])
                        for ec in e1_eff}

        def aux_get2(key, is_x):
            return ppr(("xaux1:" if is_x else "aux1:") + key)

        def f_old2_d(c):
            return ppr(f"d1:{c}")

        def f_old2_b(c):
            return ppr(f"b1:{c}")

        e1p_eff = {s.ec: ppr(f"e1:{s.ec}") for s in ehs_e}

        if depth == 3:
            # ========== MIDDLE STAGE (step 2) on block s2map(i) ==========
            # destination = the P2 scratch package; assembles e2_eff (full
            # u at this stage's block) for the final stage's forward halo
            gx2m = s2map(i) * bx + xoff0

            def aux_put2sc(key, is_x, val, pred):
                ppw(("xaux2:" if is_x else "aux2:") + key, val)

            def u2(ec):
                spec_ = L.eh_by_ec[ec]
                if not spec_.has_u:
                    return None
                uk = f"{ec}:u"
                if uk in cfa_keys:
                    return ppr(f"cfa:{uk}")
                return coef2(uk)

            new_b2 = curl_half(curls_b, e1p_eff, e1_first, False, gx2m,
                               coef2, f_old2_b, aux_get2, aux_put2sc,
                               xsel2m, src_jobs2, 1)
            h2_eff = eh_full(ehs_h, new_b2, f_old2_b, aux_get2, aux_put2sc,
                             coef2, lambda ec: None, xsel2m)
            c2_prev = {g: ppr(f"c2:{g}") for g in carry_keys}
            for g in carry_keys:
                v = h2_eff[g][bx - 1:bx]
                if first:
                    v = sel(i == 0, zero_pl, v)
                ppw(f"c2:{g}", v)
            new_d2 = curl_half(curls_d, h2_eff, c2_prev, True, gx2m, coef2,
                               f_old2_d, aux_get2, aux_put2sc, xsel2m,
                               src_jobs2, 1)
            lin_sub2m = None
            de_old2m: Dict[str, Any] = {}
            if disp:
                # MIDDLE-stage dispersive D-half (pure ADE; supported()
                # rejects nl at depth 3): P state and stored-E come from
                # stage-1's snapshots of the SAME block one iteration
                # ago; window coefs ride the cfw/cfu one-iteration caches
                def cwin2m(k):
                    if k in cfw_keys:
                        return ppr(f"cfw:{k}")
                    a = coef2(k)     # handles full/x-blocked/dyn coefs
                    return a[:, wy0:wy1, :] if a.shape[1] == Y else a

                def uwin2m(ec):
                    s_ = L.eh_by_ec[ec]
                    if not s_.has_u:
                        return None
                    uk = f"{ec}:u"
                    if uk in cfu_keys:
                        return win(ppr(f"cfu:{uk}"))
                    a = coef2(uk)
                    return a[:, wy0:wy1, :] if a.shape[1] == Y else a

                de_old2m = {ec: ppr(f"de1:{ec}") for ec in de_set}
                # NL next-plane rebuild from stage-1's THIS-iteration
                # in-register results (stage-1's block IS the middle
                # stage's next block) — the same relation nl_next2
                # encodes for the depth-2 final stage
                dmp_next2m = nl_next2(h2_eff, e1_eff, new_b1, new_d1,
                                      ps1_q) if nl_fwd else {}
                lin_sub2m, pnew2m = disp_dhalf(
                    new_d2,
                    lambda pi2, c: ppr(f"p1:{pi2}:{c}"),
                    lambda pi2, c: ppr(f"pp1:{pi2}:{c}"),
                    de_old2m, cwin2m, uwin2m, "dmpM", dmp_next2m)
            e2_eff = eh_full(ehs_e, new_d2, f_old2_d, aux_get2, aux_put2sc,
                             coef2, u2, xsel2m, ov_new=lin_sub2m,
                             ov_old=de_old2m or None, ov_pred=dsel2)
            ps2_q: Dict[str, Any] = {}
            if disp:
                for (pi2, p2, comps) in pol_entries:
                    for c in comps:
                        ppw(f"p2:{pi2}:{c}", pnew2m[(pi2, c)])
                        ppw(f"pp2:{pi2}:{c}", ppr(f"p1:{pi2}:{c}"))
                for ec in L.de_comps:
                    ppw(f"de2:{ec}", lin_sub2m[ec])
                for dc2, lst in pol_by_dc.items():
                    tot = None
                    for (pi2, c2c) in lst:
                        v = pnew2m[(pi2, c2c)][0:1]
                        tot = v if tot is None else tot + v
                    ps2_q[dc2] = sel(dsel2, tot,
                                     jnp.zeros((1, Yw, Z), dtype))
            for s_ in curls_d:
                ppw(f"d2:{s_.c}", new_d2[s_.c])
            for s_ in curls_b:
                ppw(f"b2:{s_.c}", new_b2[s_.c])
            for s_ in ehs_e:
                ppw(f"e2:{s_.ec}", e2_eff[s_.ec])
            cap_write(2, e2_eff, h2_eff)

        # ================= FINAL STAGE =================================
        if depth == 3:
            FP, FA, FX = "2", "aux2:", "xaux2:"
            FC = "c3"
            coefF = coef3
            okF = (i >= 2) if first else True
            xselF = xsel3
            rowF, jobsF = 2, src_jobs3
            gx2 = s3map(i) * bx + xoff0
            eF_first = {ec: (e2_eff[ec][0:1] if not last
                             else sel(i < n1 + 1, e2_eff[ec][0:1],
                                      zero_pl))
                        for ec in e2_eff}
            czero = (i <= 1)
        else:
            FP, FA, FX = "1", "aux1:", "xaux1:"
            FC = "c2"
            coefF = coef2
            okF = ok2
            xselF = xsel2
            rowF, jobsF = 1, src_jobs2
            gx2 = s2map(i) * bx + xoff0
            eF_first = e1_first
            czero = (i == 0)

        def aux_getF(key, is_x):
            return ppr((FX if is_x else FA) + key)

        def aux_put2(key, is_x, val, pred):
            if pred is False:
                return
            if pred is True:
                p = okF
            elif okF is True:
                p = pred
            else:
                p = pred & okF
            if p is True:
                outname[("state", key)][...] = val
            else:
                @pl.when(p)
                def _(key=key, val=val):
                    outname[("state", key)][...] = val

        def f_oldF_d(c):
            return ppr(f"d{FP}:{c}")

        def f_oldF_b(c):
            return ppr(f"b{FP}:{c}")

        eFp_eff = {s.ec: ppr(f"e{FP}:{s.ec}") for s in ehs_e}
        new_bF = curl_half(curls_b, eFp_eff, eF_first, False, gx2, coefF,
                           f_oldF_b, aux_getF, aux_put2, xselF, jobsF, rowF)
        hF_eff = eh_full(ehs_h, new_bF, f_oldF_b, aux_getF, aux_put2, coefF,
                         lambda ec: None, xselF)
        cF_prev = {g: ppr(f"{FC}:{g}") for g in carry_keys}
        for g in carry_keys:
            v = hF_eff[g][bx - 1:bx]
            if first:
                # the final stage's block-0 backward ghost: zero (PEC) /
                # the host-recomputed depth-2 boundary carry (x-Bloch
                # wrap or shard boundary)
                v0 = byname[("pkg", f"wrapc2:{g}")][...] \
                    if (periodic is not None or edge_pkg) else zero_pl
                v = sel(czero, v0, v)
            ppw(f"{FC}:{g}", v)
        cap_write(depth, None, hF_eff)
        new_dF = curl_half(curls_d, hF_eff, cF_prev, True, gx2, coefF,
                           f_oldF_d, aux_getF, aux_put2, xselF, jobsF, rowF)

        lin_sub2 = None
        if disp:
            # the final stage's disp inputs come one snapshot level up:
            # stage-1's caches at depth 2, the MIDDLE stage's at depth 3
            PD = "2" if depth == 3 else "1"
            CW, CU = (("cfw2", "cfu2") if depth == 3 else ("cfw", "cfu"))
            coefX = coef3 if depth == 3 else coef2

            def cwin2(k):
                if k in cfw_keys:
                    return ppr(f"{CW}:{k}")
                a = coefX(k)         # handles full/x-blocked/dyn coefs
                return a[:, wy0:wy1, :] if a.shape[1] == Y else a

            def uwin2(ec):
                s_ = L.eh_by_ec[ec]
                if not s_.has_u:
                    return None
                uk = f"{ec}:u"
                if uk in cfu_keys:
                    return win(ppr(f"{CU}:{uk}"))
                a = coefX(uk)
                return a[:, wy0:wy1, :] if a.shape[1] == Y else a

            def p_get2(pi2, c):
                return ppr(f"p{PD}:{pi2}:{c}")

            def pp_get2(pi2, c):
                return ppr(f"pp{PD}:{pi2}:{c}")

            de_old2 = {ec: ppr(f"de{PD}:{ec}") for ec in de_set}
            # NL next-plane rebuild from the immediately-upstream stage's
            # THIS-iteration results (its block is this stage's next
            # block): stage-1's at depth 2, the MIDDLE stage's at depth 3
            if not nl_fwd:
                dmp_next2 = {}
            elif depth == 3:
                dmp_next2 = nl_next2(hF_eff, e2_eff, new_b2, new_d2, ps2_q)
            else:
                dmp_next2 = nl_next2(hF_eff, e1_eff, new_b1, new_d1, ps1_q)
            lin_sub2, pnew2 = disp_dhalf(new_dF, p_get2, pp_get2, de_old2,
                                         cwin2, uwin2, "dmp2", dmp_next2)

            @pl.when(dselF)
            def _():
                for (pi2, p2, comps) in pol_entries:
                    for c in comps:
                        outname[("state", f"p{pi2}:{c}")][...] = \
                            pnew2[(pi2, c)]
                        outname[("state", f"pp{pi2}:{c}")][...] = \
                            ppr(f"p{PD}:{pi2}:{c}")
                for ec in L.de_comps:
                    outname[("state", f"de:{ec}")][...] = lin_sub2[ec]

        # stored-E slabs at the final stage: lin = u_slab * D (slab pieces);
        # de comps additionally need the dispersive window overlay, so
        # their lin is built full-block (u from the prev-iteration cache)
        # and selected against the plain path where the stage-2 block is
        # not a window block
        for s in ehs_e:
            if s.ec not in L.eh_store:
                continue
            ax, lor, hir = L.eh_store[s.ec]
            d2 = new_dF[s.dc]
            d1 = ppr(f"d{FP}:{s.dc}")
            dispc = disp and s.ec in de_set
            if dispc:
                uk = f"{s.ec}:u"
                if uk in cfu_keys:
                    u_f = ppr(f"{CU}:{uk}")
                elif s.has_u:
                    u_f = coefX(uk)
                else:
                    u_f = None
                l2f = d2 * u_f if u_f is not None else d2
                l1f = d1 * u_f if u_f is not None else d1
                lin2f = overlay_win(l2f, lin_sub2[s.ec])
                lin1f = overlay_win(l1f, ppr(f"de{PD}:{s.ec}"))
            if ax == 0:
                key = x_here.get(f"eh:{s.ec}")
                if key is None:
                    continue
                useg = byname[("uslab", f"{s.ec}:u@x{edge_side}")][...] \
                    if s.has_u else None
                lin2 = d2 * useg if useg is not None else d2
                lin1 = d1 * useg if useg is not None else d1
                kw = coefF(f"{s.ec}:kapw")
                sw = coefF(f"{s.ec}:sigw")
                e_new = ppr(f"{FX}{key}") + (kw + sw) * lin2 \
                    - (kw - sw) * lin1
                if dispc:
                    # x_uniform x-stores span the window rows: the chain
                    # must see the overlaid (true-E) lin there (mirrors
                    # the y/z slab branch below)
                    e_disp = ppr(f"{FX}{key}") + (kw + sw) * lin2f \
                        - (kw - sw) * lin1f
                    e_new = sel(dselF, e_disp, e_new)
                aux_put2(key, True, e_new, xselF)
                continue
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b <= a:
                    continue
                key = L.key("eh", s.ec, side)
                slq = _full_slice(ax, slice(a, b))
                useg = byname[("uslab", f"{s.ec}:u@{side}")][...] \
                    if s.has_u else None
                l2 = d2[slq] * useg if useg is not None else d2[slq]
                l1 = d1[slq] * useg if useg is not None else d1[slq]
                kw = byname[("coefslab", f"{s.ec}:kapw@{side}")][...]
                sw = byname[("coefslab", f"{s.ec}:sigw@{side}")][...]
                e_new = ppr(f"{FA}{key}") + (kw + sw) * l2 - (kw - sw) * l1
                if dispc:
                    e_disp = ppr(f"{FA}{key}") \
                        + (kw + sw) * lin2f[slq] - (kw - sw) * lin1f[slq]
                    e_new = sel(dselF, e_disp, e_new)
                aux_put2(key, False, e_new, True)

        for c, v in {**new_bF, **new_dF}.items():
            if okF is True:
                outname[("state", c)][...] = v
            else:
                @pl.when(okF)
                def _(c=c, v=v):
                    outname[("state", c)][...] = v

        # ---- deferred coefficient-cache writes (single-slot, in-order:
        # every read of these happened above, so writing the NEW values
        # last makes the plain scratch carry previous-iteration data
        # without slots or snapshots).  Order matters: the second-level
        # relays read the first level's OLD value.
        if disp and depth == 3:
            for k in cfw_keys:
                ppw(f"cfw2:{k}", ppr(f"cfw:{k}"))
            for k in cfu_keys:
                ppw(f"cfu2:{k}", ppr(f"cfu:{k}"))
        if disp:
            for k in cfw_keys:
                a_ = coef1(k)
                ppw(f"cfw:{k}",
                    a_[:, wy0:wy1, :] if a_.shape[1] == Y else a_)
            for k in cfu_keys:
                ppw(f"cfu:{k}", coef1(k))
        for k in cfa_keys:
            ppw(f"cfa:{k}", coef1(k))

        if not last:
            @pl.when(i == grid - 1)
            def _():
                for name, _shp in pkg_names:
                    outname[("pkgo", name)][...] = \
                        ppc(name) if name in pp_set else sc[name][...]

    # ---------------- wrapper ----------------------------------------------
    in_specs = [spec for (_, _, spec) in in_entries]
    out_specs = [spec for (_, _, spec) in out_entries]
    pkg_shapes = dict(pkg_names)
    if os.environ.get("MNT_D3_DUMP"):
        import sys as _sys
        print(f"--- call b0={b0} b1={b1} side={edge_side!r} first={first} "
              f"last={last} grid={grid} depth={depth} disp={disp}",
              file=_sys.stderr)
        for (tag, key, spec) in in_entries:
            print(f"  in  {tag:9s} {key:24s} {spec.block_shape}",
                  file=_sys.stderr)
        for (tag, key, spec) in out_entries:
            print(f"  out {tag:9s} {key:24s} {spec.block_shape}",
                  file=_sys.stderr)
        for (n, shp) in scratch_entries:
            print(f"  scr {n:24s} {shp}", file=_sys.stderr)

    def run_call(state, halos, pkg_in, C, xscal):
        args = []
        for (tag, key, _) in in_entries:
            if tag == "state":
                args.append(state[key])
            elif tag in ("halo", "nlh"):
                args.append(halos[key])
            elif tag in ("coef", "coef1", "coef2", "coef3"):
                args.append(C[key])
            elif tag == "coefw":
                args.append(C[key][coefw_slices[key]])
            elif tag == "coefslab":
                ckey, sl = coefslab_slices[key]
                args.append(C[ckey][sl])
            elif tag == "uslab":
                ckey, sl = uslab_slices[key]
                args.append(C[ckey][sl])
            elif tag == "pkg":
                args.append(pkg_in[key])
            else:                                   # xs
                args.append(xscal[key])
        out_shapes = []
        for (tag, key, _) in out_entries:
            if tag == "pkgo":
                out_shapes.append(jax.ShapeDtypeStruct(pkg_shapes[key],
                                                       dtype))
            elif tag == "cap":
                out_shapes.append(jax.ShapeDtypeStruct((1, Y, Z), dtype))
            else:
                out_shapes.append(jax.ShapeDtypeStruct(
                    tuple(state[key].shape), state[key].dtype))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            scratch_shapes=[pltpu.VMEM(((2,) + shp) if _n in pp_set
                                       else shp, dtype)
                            for (_n, shp) in scratch_entries],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(os.environ.get(
                    "MNT_T2_VMEM_MB", "127")) * 1024 * 1024),
            interpret=bool(int(os.environ.get("MNT_PALLAS_INTERPRET", "0"))),
        )(*args)
        new_state = dict(state)
        pkg_out = {}
        for (tag, key, _), v in zip(out_entries, outs):
            if tag in ("pkgo", "cap"):
                pkg_out[key] = v
            else:
                new_state[key] = v
        return new_state, pkg_out

    run_call.halo_keys = halo_keys
    run_call.nlh_keys = nlh_keys
    run_call.xs_keys = xs_keys
    run_call.pkg_names = pkg_names
    return run_call


# ---------------------------------------------------------------------------
# public driver
# ---------------------------------------------------------------------------


class Fdtd3dT2Kernel:
    """Two-step fused driver; compact state layout identical to
    Fdtd3dKernel (fdtd3d.py), so conversion helpers are shared."""

    def __init__(self, plan, bx: int = None, z_full: bool = None,
                 depth: int = None, cap_planes=None):
        if depth is None:
            depth = int(os.environ.get("MNT_T2_DEPTH", "2"))
        bx = _pick_bx(plan, bx, depth)
        if not supported(plan, bx, depth=depth):
            raise ValueError("plan outside the fdtd3d_t2 kernel envelope")
        self.depth = depth
        if z_full is None:
            # default ON: trades ~14 B/cell/step of z-aux HBM traffic for
            # relayout-free lane arithmetic — measured 10.15 -> 11.46
            # GCells/s at 255^3 3D-uPML (MNT_T2_ZFULL=0 restores
            # slab-compact z storage)
            z_full = bool(int(os.environ.get("MNT_T2_ZFULL", "1")))
        self.plan = plan
        self.bx = bx
        self.L = _Layout(plan, bx, z_full=z_full)
        L = self.L
        lo, hi0, nblk = L.lo_blocks, L.hi_block0, L.nblk
        segs = []                   # (b0, b1, side, s1_xn, s2_x0, disp)
        if lo > 0:
            segs.append((0, lo + depth - 1, "lo", lo, "all", False))
        mid0 = lo + depth - 1 if lo > 0 else 0
        if L.disp is not None:
            # the disp call owns the window, with its stage-1 running
            # depth-1 blocks past it (the lo-edge pattern applied to the
            # window) so cross-call packages never carry disp state
            db0, db1 = L.disp
            if db0 > mid0:
                segs.append((mid0, db0, "", 0, None, False))
            segs.append((db0, db1 + depth - 1, "", 0, None, True))
            if db1 + depth - 1 < hi0:
                segs.append((db1 + depth - 1, hi0, "", 0, None, False))
        elif mid0 < hi0:
            segs.append((mid0, hi0, "", 0, None, False))
        if hi0 < nblk:
            segs.append((hi0, nblk, "hi", nblk - hi0, 1, False))
        # DFT capture planes: E comps at stages 1..depth-1 (the final
        # step's E is read from the post-call state), H comps at every
        # stage (h_eff is materialized in all of them)
        self.cap_planes = sorted(set(cap_planes or []))
        cap_exp = []
        for (comp, x) in self.cap_planes:
            stages = range(1, depth) if comp[0] == "e" \
                else range(1, depth + 1)
            for s_ in stages:
                cap_exp.append((s_, comp, int(x)))
        calls = []
        for k, (b0, b1, side, s1_xn, s2_x0, dsp) in enumerate(segs):
            calls.append(_build_call2(L, b0, b1, side, k == 0,
                                      k == len(segs) - 1, s1_xn, s2_x0,
                                      depth=depth, disp=dsp,
                                      cap=cap_exp))
        self.calls = calls
        self.halo_keys = sorted({g for c in calls for g in c.halo_keys})
        self.nlh_keys = sorted({k for c in calls for k in c.nlh_keys})
        self.xs_keys = sorted({k for c in calls for k in c.xs_keys})
        # 1-step companion: state init/conversion + odd-step residue
        self._k1 = F1.Fdtd3dKernel(plan, bx, z_full=z_full)

    def init_state(self):
        return self.L.init_state(self.plan.dtype)

    def make_fused_step(self):
        """(state, x_rows, C) -> state advanced `depth` steps; x_rows
        leaves carry a leading dim of `depth` (per-step source scalars)."""
        depth = self.depth

        def step2(state, x_pair, C):
            halos = compute_halos(self.L, self.bx, self.halo_keys, state, C)
            if self.nlh_keys:
                halos = {**halos, **compute_nl_halos(
                    self.L, self.bx, self.nlh_keys, state, C)}
            xscal = {k: jnp.asarray(x_pair[k],
                                    self.plan.dtype).reshape(depth, 1)
                     for k in self.xs_keys}
            pkg: Dict[str, Any] = {}
            for call in self.calls:
                state, pkg = call(state, halos, pkg, C, xscal)
            return {**state, "t": state["t"] + depth}

        return step2

    def make_capture_step(self):
        """(state, x_rows, C) -> (state advanced `depth` steps,
        {cap:{s}:{comp}:{x}: (1, Y, Z) stage-s effective-field plane}).
        Requires cap_planes at construction."""
        depth = self.depth

        def step2c(state, x_pair, C):
            halos = compute_halos(self.L, self.bx, self.halo_keys, state,
                                  C)
            if self.nlh_keys:
                halos = {**halos, **compute_nl_halos(
                    self.L, self.bx, self.nlh_keys, state, C)}
            xscal = {k: jnp.asarray(x_pair[k],
                                    self.plan.dtype).reshape(depth, 1)
                     for k in self.xs_keys}
            pkg: Dict[str, Any] = {}
            caps: Dict[str, Any] = {}
            for call in self.calls:
                state, pkg = call(state, halos, pkg, C, xscal)
                caps.update({k: v for k, v in pkg.items()
                             if k.startswith("cap:")})
            return {**state, "t": state["t"] + depth}, caps

        return step2c

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 2):
        from ...stepper.step import build_xs
        depth = self.depth
        npair = nsteps // depth
        rem = nsteps - depth * npair
        if npair:
            xs_all = build_xs(self.plan, depth * npair, t0)
            xs = {k: np.asarray(v).reshape((npair, depth) + v.shape[1:])
                  for k, v in xs_all.items() if k in self.xs_keys}
            cache = getattr(self, "_run_cache", None)
            if cache is None:
                cache = self._run_cache = {}
            runner_c = cache.get((npair, unroll))
            if runner_c is None:
                step2 = self.make_fused_step()

                def runner(state, xs, C):
                    def body(carry, x):
                        return step2(carry, x, C), None
                    state, _ = jax.lax.scan(
                        body, state, xs, length=npair,
                        unroll=unroll if npair % unroll == 0 else 1)
                    return state

                runner_c = cache[(npair, unroll)] = jax.jit(runner)
            state = runner_c(state, xs, self.plan.coefs)
        if rem:
            state = self._k1.run(state, rem, t0=t0 + depth * npair,
                                 unroll=1)
        return state

    def to_full(self, state, C=None):
        return self._k1.to_full(state, C)

    def from_full(self, full):
        return self._k1.from_full(full)


