"""Periodic-x fused stepping: the production Mosaic kernel on a Bloch/
periodic x axis with a real (+-1) wrap phase.

The fused kernel sweeps x in blocks and is periodicity-blind; the wrap
enters entirely through two external interfaces (the same structure the
sharded driver uses between chips, parallel/fused_mesh.py — itself the
analog of the reference's per-chunk kernels + boundary connections,
step.cpp:226-288 / boundaries.cpp:347 CONNECT_PHASE):

  * the FORWARD ghost: the B half's x-forward difference at the last
    live plane (x = num-1) reads E_eff(num) = phase * E_eff(0) — OLD-
    state data.  Field storage always carries a dead plane at x = num
    (grid.shape = num+1), so the driver refreshes that plane with the
    wrapped old value before every step; the kernel then reads it both
    in-register and through the precomputed strided halos with no
    special cases.  (The masks re-kill the dead plane on output, as in
    the jnp path.)
  * the BACKWARD carry: the D half at plane 0 reads H_eff^new(-1) =
    (1/phase) * H_eff^new(num-1) — NEW-state data from the far end of
    the same step, a cyclic dependency broken by redundantly
    recomputing the one-plane B-half update from the old state
    (fused_mesh.carry_plane), exactly as each shard recomputes its left
    neighbor's boundary plane.

Supported envelope: fdtd3d.supported(plan, allow_periodic_x=True) —
3D, periodic along x ONLY, real wrap phase (k_x = 0 or half-integer),
plus: NL (chi3/chi2-NR) support and the dispersive stored-E window at
least 3 sites / 1 site clear of both wrap ends (the NL next-plane halos
are zero-padded at the sweep edges — the same exactness condition as
the sharded driver's shard boundaries — and the ghost plane carries no
window overlay).  Complex Bloch phases need the real-pair kernel
channel — jnp path for now.

Equivalence vs the jnp stepper's wrap (ops/stencil.shift periodic
branch): test_periodic_fused.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from . import fdtd3d as F1
from .fdtd3d import compute_halos, compute_nl_halos
from ...parallel.fused_mesh import (boundary_statics, carry_plane,
                                    e_eff_plane)


def _nl_clear_of_wrap(plan) -> bool:
    """NL (chi3/chi2-NR) stencil columns must not consume the zero-padded
    NL halos at the sweep edges: require the support boxes >= 3 sites
    clear of both wrap ends (cf. fused_mesh._nl_clear_of_boundaries)."""
    boxes = getattr(plan, "support_boxes", None) or {}
    num0 = plan.gv.num[0]
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
            if x0 < 3 or x1 > num0 - 3:
                return False
    return True


def _no_mirror(plan) -> bool:
    # the wrap strip recompute primitives (ops/pallas/strip.py) have no
    # node-mirror ghost support; mirrored periodic plans stay on jnp
    return not getattr(plan, "mirror_node", ())


def periodic_supported(plan, bx: int = None) -> bool:
    """Envelope check for the periodic-x fused driver."""
    if not _no_mirror(plan):
        return False
    if plan.gv.dim != "3d" or not plan.periodic[0]:
        return False
    if not F1.supported(plan, bx, allow_periodic_x=True):
        return False
    if F1._has_disp(plan):
        if not _nl_clear_of_wrap(plan):
            return False
        # the stored-E window must not reach the wrap planes (the ghost
        # plane at x = num carries no window overlay, and the carry
        # recompute at x = num-1 assumes store-free rows there only for
        # the W chain, not the disp window)
        bxx = F1._pick_bx(plan, bx)
        try:
            L = F1._Layout(plan, bxx)
        except ValueError:
            return False
        if L.disp is not None:
            a, b = L.disp_range()
            if a < 1 or b > plan.gv.num[0] - 1:
                return False
    return True


class PeriodicXKernel(F1.Fdtd3dKernel):
    """Fused-step driver for x-periodic plans: the parent's call chain
    with the wrap ghost refreshed into the dead x = num plane each step
    and the wrap carry redundantly recomputed from the old state."""

    def __init__(self, plan, bx: int = None, z_full: bool = False):
        if not periodic_supported(plan, bx):
            raise ValueError("plan outside the periodic-x fused envelope")
        super().__init__(plan, bx, z_full, allow_periodic_x=True)
        L = self.L
        self.num0 = plan.gv.num[0]
        (self._b_specs, self._e_need, self._pkg_b, self._pkg_fu,
         self._pkg_wst, bkeys) = boundary_statics(plan, L, self.carry_keys)
        # boundary-plane coefficient views at the last live plane
        xb = self.num0 - 1
        self._bc: Dict[str, Any] = {}
        for k in bkeys:
            arr = plan.coefs[k]
            if getattr(arr, "ndim", 0) == 3 and arr.shape[0] == L.S[0]:
                self._bc[k] = arr[xb:xb + 1]
            else:
                self._bc[k] = arr
        self._phase = float(np.real(plan.bloch_phase[0]))
        # the in-kernel E_eff assembly at the ghost plane multiplies the
        # ghosted D by u(num): pin u(num) := u(0) so the assembled ghost
        # equals phase * E_eff(0) (dead plane in every other reader —
        # D there is zero/masked on the jnp path)
        for s in L.ehs:
            k = f"{s.ec}:u"
            if s.has_u:
                arr = plan.coefs[k]
                if getattr(arr, "ndim", 0) == 3 \
                        and arr.shape[0] == L.S[0]:
                    plan.coefs[k] = arr.at[self.num0].set(arr[0])

    def make_step(self):
        plan, L, bx = self.plan, self.L, self.bx
        S0, Y, Z = L.S
        num0 = self.num0
        dtype = plan.dtype
        ph = self._phase
        phinv = 1.0 / ph
        b_specs, e_need = self._b_specs, self._e_need
        pkg_b, pkg_fu, pkg_wst = self._pkg_b, self._pkg_fu, self._pkg_wst
        bc = self._bc
        ghost_dc = [L.eh_by_ec[ec].dc for ec in self.halo_keys]
        ghost_wst = []
        for ec in self.halo_keys:
            if ec in L.eh_store:
                ax, lor, hir = L.eh_store[ec]
                if ax != 0:
                    ghost_wst += [L.key("eh", ec, side)
                                  for side, (a, b) in
                                  (("lo", lor), ("hi", hir)) if b > a]

        def bplane(k):
            return bc[k]

        def step(state, x_t, C):
            # ---- wrap ghost: dead plane x = num <- phase * plane 0 ----
            state = dict(state)
            for dc in ghost_dc:
                state[dc] = state[dc].at[num0:num0 + 1].set(
                    ph * state[dc][0:1])
            for key in ghost_wst:
                state[key] = state[key].at[num0:num0 + 1].set(
                    ph * state[key][0:1])
            halos = compute_halos(L, bx, self.halo_keys, state, C)
            if self.nlh_keys:
                halos = {**halos, **compute_nl_halos(
                    L, bx, self.nlh_keys, state, C)}
            # ---- wrap carry: H_eff^new(-1) = (1/ph) H_eff^new(num-1) --
            xb = num0 - 1
            recv = {}
            for ecn in e_need:
                recv[f"e:{ecn}"] = e_eff_plane(plan, L, state, C, ecn, xb)
            for c in pkg_b:
                recv[f"b:{c}"] = state[c][xb:xb + 1]
            for (c, side, fax, a, b) in pkg_fu:
                recv[f"fu:{c}:{side}"] = state[L.key("fu", c, side)][
                    xb:xb + 1]
            for (ec, side, ax, a, b) in pkg_wst:
                recv[f"w:{ec}:{side}"] = state[L.key("eh", ec, side)][
                    xb:xb + 1]
            e_first = {ecn: ph * e_eff_plane(plan, L, state, C, ecn, 0)
                       for ecn in e_need}
            h_last = carry_plane(plan, L, b_specs, pkg_fu, recv, e_first,
                                 bplane)
            carry = {}
            for g in self.carry_keys:
                if g in h_last:
                    carry[g] = (phinv * h_last[g]).astype(dtype)
                else:
                    carry[g] = jnp.zeros((1, Y, Z), dtype)
            xscal = {k: jnp.asarray(x_t[k], dtype).reshape(1, 1)
                     for k in self.xs_keys}
            for call in self.calls:
                state, carry_out = call(state, halos, carry, C, xscal)
                carry = {**carry, **carry_out}
            return {**state, "t": state["t"] + 1}

        return step

    def to_full(self, state, C=None):
        """jnp-state parity: the jnp path keeps the dead x planes zero
        (masked every step); kill the ghost residue."""
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
# complex Bloch phases: the real-pair channel pair of kernels
# ---------------------------------------------------------------------------


def _real_view(plan):
    """Single-channel view of a real-pair Bloch plan: every interior
    update has REAL coefficients, so the re/im channels evolve as two
    independent real problems — only the x wrap mixes them (the complex
    phase rotation), and that lives entirely in the driver's ghost/carry
    computation.  The view neutralizes the phase (applied externally)."""
    return dataclasses.replace(
        plan, complex_fields=False, real_pair=False,
        bloch_phase=(1.0,) + tuple(plan.bloch_phase[1:]))


def pair_periodic_supported(plan, bx: int = None) -> bool:
    """Envelope: real-pair plan whose ONLY complex coupling is the x
    Bloch phase (arbitrary k_x — oblique-incidence gratings)."""
    if not _no_mirror(plan):
        return False
    if not (getattr(plan, "real_pair", False) and plan.complex_fields):
        return False
    if plan.gv.dim != "3d" or not plan.periodic[0]:
        return False
    ph = complex(plan.bloch_phase[0])
    if abs(abs(ph) - 1.0) > 1e-9:
        return False
    return periodic_supported(_real_view(plan), bx)


class PairPeriodicXKernel:
    """Arbitrary-k_x Bloch stepping through the real Mosaic kernel: two
    single-channel compact states (re, im) advanced by the SAME real
    kernel per step; the wrap ghost E(num) = ph * E(0) and the wrap
    carry H^new(-1) = ph^-1 * H^new(num-1) rotate the channels into each
    other as 2x2 real rotations (the DOCMP unroll of boundaries.cpp:347
    CONNECT_PHASE, confined to two planes).  Sources: the im channel
    reuses the baked complex amps with the waveform rows swapped
    ((w_re, w_im) -> (w_im, -w_re) gives Im[(w a)] pointwise)."""

    def __init__(self, plan, bx: int = None, z_full: bool = False):
        if not pair_periodic_supported(plan, bx):
            raise ValueError("plan outside the pair-periodic envelope")
        self.plan = plan
        self._k = PeriodicXKernel(_real_view(plan), bx, z_full)
        self.xs_keys = self._k.xs_keys
        self.bx = self._k.bx
        self.L = self._k.L
        ph = complex(plan.bloch_phase[0])
        self._a, self._b = float(ph.real), float(ph.imag)

    def init_state(self):
        return {"re": self._k.init_state(), "im": self._k.init_state()}

    @staticmethod
    def _split(full, i):
        def leaf(v):
            if hasattr(v, "ndim") and v.ndim == 4 and v.shape[0] == 2:
                return v[i]
            return v
        return jax.tree.map(leaf, {k: v for k, v in full.items()
                                   if k != "dft"})

    def from_full(self, full):
        return {"re": self._k.from_full(self._split(full, 0)),
                "im": self._k.from_full(self._split(full, 1))}

    def to_full(self, state, C=None):
        fr = self._k.to_full(state["re"], C)
        fi = self._k.to_full(state["im"], C)

        def leaf(a, b):
            if hasattr(a, "ndim") and a.ndim >= 3:
                return jnp.stack([a, b])
            return a
        return jax.tree.map(leaf, fr, fi)

    def make_step(self):
        k = self._k
        plan, L, bx = k.plan, k.L, k.bx
        S0, Y, Z = L.S
        num0 = k.num0
        dtype = plan.dtype
        a, b = self._a, self._b
        b_specs, e_need = k._b_specs, k._e_need
        pkg_b, pkg_fu, pkg_wst = k._pkg_b, k._pkg_fu, k._pkg_wst
        bc = k._bc
        ghost_dc = [L.eh_by_ec[ec].dc for ec in k.halo_keys]
        ghost_wst = []
        for ec in k.halo_keys:
            if ec in L.eh_store:
                ax, lor, hir = L.eh_store[ec]
                if ax != 0:
                    ghost_wst += [L.key("eh", ec, side)
                                  for side, (aa, bb) in
                                  (("lo", lor), ("hi", hir)) if bb > aa]
        src_pairs = [(kk, kk.replace(":cur_re", ":cur_im"))
                     for kk in k.xs_keys if kk.endswith(":cur_re")]

        def bplane(key):
            return bc[key]

        def one_channel(state, halos, carry, C, xscal):
            for call in k.calls:
                state, carry_out = call(state, halos, carry, C, xscal)
                carry = {**carry, **carry_out}
            return {**state, "t": state["t"] + 1}

        def step(state2, x_t, C):
            sre, sim_ = dict(state2["re"]), dict(state2["im"])
            # ---- wrap ghosts: plane num <- ph * plane 0, channel-mixed
            for key in ghost_dc + ghost_wst:
                r0, i0 = sre[key][0:1], sim_[key][0:1]
                sre[key] = sre[key].at[num0:num0 + 1].set(a * r0 - b * i0)
                sim_[key] = sim_[key].at[num0:num0 + 1].set(b * r0 + a * i0)
            halos_re = compute_halos(L, bx, k.halo_keys, sre, C)
            halos_im = compute_halos(L, bx, k.halo_keys, sim_, C)
            if k.nlh_keys:
                halos_re = {**halos_re, **compute_nl_halos(
                    L, bx, k.nlh_keys, sre, C)}
                halos_im = {**halos_im, **compute_nl_halos(
                    L, bx, k.nlh_keys, sim_, C)}
            # ---- wrap carry: ph^-1 * H^new(num-1), channel-mixed ------
            xb = num0 - 1

            def recv_of(st):
                recv = {}
                for ecn in e_need:
                    recv[f"e:{ecn}"] = e_eff_plane(plan, L, st, C, ecn, xb)
                for c in pkg_b:
                    recv[f"b:{c}"] = st[c][xb:xb + 1]
                for (c, side, fax, aa, bb) in pkg_fu:
                    recv[f"fu:{c}:{side}"] = st[L.key("fu", c, side)][
                        xb:xb + 1]
                for (ec, side, ax, aa, bb) in pkg_wst:
                    recv[f"w:{ec}:{side}"] = st[L.key("eh", ec, side)][
                        xb:xb + 1]
                return recv

            e0r = {ec: e_eff_plane(plan, L, sre, C, ec, 0) for ec in e_need}
            e0i = {ec: e_eff_plane(plan, L, sim_, C, ec, 0)
                   for ec in e_need}
            ef_re = {ec: a * e0r[ec] - b * e0i[ec] for ec in e_need}
            ef_im = {ec: b * e0r[ec] + a * e0i[ec] for ec in e_need}
            h_re = carry_plane(plan, L, b_specs, pkg_fu, recv_of(sre),
                               ef_re, bplane)
            h_im = carry_plane(plan, L, b_specs, pkg_fu, recv_of(sim_),
                               ef_im, bplane)
            carry_re, carry_im = {}, {}
            for g in k.carry_keys:
                if g in h_re:
                    # ph^-1 = conj(ph) on the unit circle
                    carry_re[g] = (a * h_re[g] + b * h_im[g]).astype(dtype)
                    carry_im[g] = (a * h_im[g] - b * h_re[g]).astype(dtype)
                else:
                    carry_re[g] = jnp.zeros((1, Y, Z), dtype)
                    carry_im[g] = jnp.zeros((1, Y, Z), dtype)
            xs_re = {kk: jnp.asarray(x_t[kk], dtype).reshape(1, 1)
                     for kk in k.xs_keys}
            xs_im = dict(xs_re)
            for kre, kim in src_pairs:
                xs_im[kre] = jnp.asarray(x_t[kim], dtype).reshape(1, 1)
                xs_im[kim] = -jnp.asarray(x_t[kre], dtype).reshape(1, 1)
            return {"re": one_channel(sre, halos_re, carry_re, C, xs_re),
                    "im": one_channel(sim_, halos_im, carry_im, C, xs_im)}

        return step

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 4):
        from ...stepper.step import build_xs
        xs_all = build_xs(self.plan, nsteps, t0)
        xs = {kk: v for kk, v in xs_all.items() if kk in self.xs_keys}
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


# ---------------------------------------------------------------------------
# depth-2 temporal fusion across the wrap: halo-in-time recompute
# ---------------------------------------------------------------------------


def _strip_state(plan, L, state, x):
    """Old-state planes at x for the strip primitives (ops/pallas/strip):
    'b:{c}' / 'd:{c}' full planes plus the slab-compact fu / W-store
    pieces."""
    st = {}
    for s in plan.curl_specs_b:
        st[f"b:{s.c}"] = state[s.c][x:x + 1]
    for s in plan.curl_specs_d:
        st[f"d:{s.c}"] = state[s.c][x:x + 1]
    for kind, pref, store in (("fu", "fu", L.fu), ("eh", "w", L.eh_store)):
        for c, (ax, lor, hir) in store.items():
            for side, (a, b) in (("lo", lor), ("hi", hir)):
                if b <= a:
                    continue
                key = L.key(kind, c, side)
                arr = state[key]
                if ax == 0:
                    if a <= x < b:
                        st[f"{pref}:{c}:{side}"] = arr[x - a:x - a + 1]
                else:
                    st[f"{pref}:{c}:{side}"] = arr[x:x + 1]
    return st


def wrap2_carries(plan, L, state, C, ph, carry_keys):
    """The depth-2 wrap carries, redundantly recomputed from the old
    state (the halo-in-time of the reference's chunk pipelining):

      wrapc1 = (1/ph) * H^new_1(num-1)   (stage-1's D-half at plane 0)
      wrapc2 = (1/ph) * H^new_2(num-1)   (stage-2's D-half at plane 0)

    H^new_2(num-1) chains one full step at the two far planes plus the
    wrapped plane 0: B1 on {num-2, num-1, 0}, D1 + E-assembly on
    {num-1, 0}, then B2 at num-1 from the step-1-updated auxiliaries."""
    from .strip import b_half_plane, d_half_plane, e_assemble_plane
    num0 = plan.gv.num[0]
    S0 = L.S[0]

    def bp(key, x):
        arr = C[key]
        if getattr(arr, "ndim", 0) == 3 and arr.shape[0] == S0:
            return arr[x:x + 1]
        return arr

    e_need = []
    for s in plan.curl_specs_b:
        for g in (s.g_plus, s.g_minus):
            if g is not None and g not in e_need:
                e_need.append(g)

    def e_old(x):
        return {g: e_eff_plane(plan, L, state, C, g, x) for g in e_need}

    em2, em1 = e_old(num0 - 2), e_old(num0 - 1)
    e0, e1p = e_old(0), e_old(1)
    stm2 = _strip_state(plan, L, state, num0 - 2)
    stm1 = _strip_state(plan, L, state, num0 - 1)
    st0 = _strip_state(plan, L, state, 0)

    h1m2, _ = b_half_plane(plan, L, num0 - 2, em2, em1, stm2, bp)
    h1m1, new_m1 = b_half_plane(plan, L, num0 - 1, em1,
                                {g: ph * e0[g] for g in e0}, stm1, bp)
    h10, new_0 = b_half_plane(plan, L, 0, e0, e1p, st0, bp)
    wrapc1 = {g: (1.0 / ph) * h1m1[g] for g in carry_keys if g in h1m1}

    d1m1, newd_m1 = d_half_plane(plan, L, num0 - 1, h1m1, h1m2, stm1, bp)
    d1_0, newd_0 = d_half_plane(plan, L, 0, h10,
                                {g: (1.0 / ph) * h1m1[g] for g in h1m1},
                                st0, bp)
    d_old_m1 = {s.c: stm1[f"d:{s.c}"] for s in plan.curl_specs_d}
    d_old_0 = {s.c: st0[f"d:{s.c}"] for s in plan.curl_specs_d}
    e1m1 = e_assemble_plane(plan, L, num0 - 1, d1m1, d_old_m1, stm1, bp,
                            newd_m1)
    e1_0 = e_assemble_plane(plan, L, 0, d1_0, d_old_0, st0, bp, newd_0)

    st2 = dict(stm1)
    st2.update(new_m1)
    st2.update(newd_m1)
    h2m1, _ = b_half_plane(plan, L, num0 - 1, e1m1,
                           {g: ph * e1_0[g] for g in e1_0}, st2, bp)
    wrapc2 = {g: (1.0 / ph) * h2m1[g] for g in carry_keys if g in h2m1}
    return wrapc1, wrapc2, e1_0


def periodic_t2_supported(plan, bx: int = None) -> bool:
    """Envelope for the depth-2 temporally-fused periodic driver:
    linear (no dispersive window), real wrap phase, no x-compact aux
    (no x-PML — guaranteed on a periodic axis), and every source at
    least 2 sites clear of the wrap planes (the halo-in-time recompute
    does not re-inject currents)."""
    if not periodic_supported(plan, bx):
        return False
    if F1._has_disp(plan):
        return False
    from . import fdtd3d_t2 as T2
    bxx = T2._pick_bx(plan, bx, 2)
    if not F1.supported(plan, bxx, allow_periodic_x=True):
        return False
    for s in plan.eh_specs_h:
        if s.has_u:
            return False
    try:
        L = T2._Layout(plan, bxx)
    except ValueError:
        return False
    if L.lo_blocks != 0 or L.hi_block0 != L.nblk or L.nblk < 2:
        return False
    num0 = plan.gv.num[0]
    if num0 < 6:
        return False
    for s in plan.sources:
        idxs = np.asarray(s.indices)
        if np.any((idxs[:, 0] < 2) | (idxs[:, 0] > num0 - 3)):
            return False
    return True


class PeriodicXT2Kernel:
    """Depth-2 temporally-fused stepping across an x-Bloch wrap (real
    phase): the single linear _build_call2 sweep with (a) the step-1
    wrap ghost in the dead x = num plane, (b) stage-1's plane-0 E_eff
    saved in-kernel and substituted (times phase) as stage-2's wrap
    ghost, and (c) both stages' wrap carries redundantly recomputed
    from the old state (wrap2_carries — the halo-in-time pattern)."""

    depth = 2

    def __init__(self, plan, bx: int = None, z_full: bool = None):
        if not periodic_t2_supported(plan, bx):
            raise ValueError("plan outside the periodic t2 envelope")
        from . import fdtd3d_t2 as T2
        bx = T2._pick_bx(plan, bx, 2)
        if z_full is None:
            z_full = bool(int(os.environ.get("MNT_T2_ZFULL", "1")))
        self.plan = plan
        self.bx = bx
        self.L = T2._Layout(plan, bx, z_full=z_full)
        L = self.L
        self.num0 = plan.gv.num[0]
        self._phase = float(np.real(plan.bloch_phase[0]))
        i_wrap, row_wrap = self.num0 // bx, self.num0 % bx
        self.call = T2._build_call2(
            L, 0, L.nblk, "", True, True, 0, None, depth=2, disp=False,
            periodic=(self._phase, i_wrap, row_wrap))
        self.xs_keys = list(self.call.xs_keys)
        # 1-step companion: shared layout, state conversions, odd steps,
        # ghost statics (and it pins u(num) := u(0) at construction)
        self._k1 = PeriodicXKernel(plan, bx, z_full=z_full)
        self.k3 = None
        self._ghost_dc = [L.eh_by_ec[ec].dc for ec in self.call.halo_keys]
        self._ghost_wst = []
        for ec in self.call.halo_keys:
            if ec in L.eh_store:
                ax, lor, hir = L.eh_store[ec]
                if ax != 0:
                    self._ghost_wst += [
                        L.key("eh", ec, side)
                        for side, (a, b) in (("lo", lor), ("hi", hir))
                        if b > a]

    def init_state(self):
        return self.L.init_state(self.plan.dtype)

    def make_fused_step(self):
        plan, L, bx = self.plan, self.L, self.bx
        num0, ph = self.num0, self._phase
        dtype = plan.dtype
        call = self.call

        def step2(state, x_pair, C):
            state = dict(state)
            for dc in self._ghost_dc:
                state[dc] = state[dc].at[num0:num0 + 1].set(
                    ph * state[dc][0:1])
            for key in self._ghost_wst:
                state[key] = state[key].at[num0:num0 + 1].set(
                    ph * state[key][0:1])
            halos = compute_halos(L, bx, call.halo_keys, state, C)
            wc1, wc2, _ = wrap2_carries(plan, L, state, C, ph,
                                        self._carry_keys())
            pkg = {}
            for g in self._carry_keys():
                pkg[f"wrapc1:{g}"] = wc1[g].astype(dtype)
                pkg[f"wrapc2:{g}"] = wc2[g].astype(dtype)
            xscal = {k: jnp.asarray(x_pair[k], dtype).reshape(2, 1)
                     for k in call.xs_keys}
            state, _ = call(state, halos, pkg, C, xscal)
            return {**state, "t": state["t"] + 2}

        return step2

    def _carry_keys(self):
        return self._k1.carry_keys

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 2):
        from ...stepper.step import build_xs
        npair = nsteps // 2
        rem = nsteps - 2 * npair
        if npair:
            xs_all = build_xs(self.plan, 2 * npair, t0)
            xs = {k: np.asarray(v).reshape((npair, 2) + v.shape[1:])
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
            state = self._k1.run(state, rem, t0=t0 + 2 * npair, unroll=1)
        return state

    def to_full(self, state, C=None):
        return self._k1.to_full(state, C)

    def from_full(self, full):
        return self._k1.from_full(full)


# ---------------------------------------------------------------------------
# Ghost-ring periodic driver: Bloch-wrapped overlap zones, plain kernel
# ---------------------------------------------------------------------------

def _ghost_ring_ext(plan, bx=None, margin: int = 12, img_ph=None):
    """(ext_plan, Gl, Gr, N, ph, bx) for the ghost-ring layout, or None.

    The x-period [0, N) is embedded in an APERIODIC extended grid with
    `margin` ghost planes per side (right side padded up to block
    alignment): left ghosts are the period's last planes x ph^-1, right
    ghosts its first planes x ph, with coefficients wrapped the same
    way and boundary-adjacent sources given phase-scaled images in the
    opposite ghost zone.  The PLAIN temporally-fused kernel then runs
    at full speed — no wrap-strip recompute — and the per-sweep
    corruption front from the extended edges (<= 2 planes per
    half-step + the NL stencil reach ~= 8 at depth 3) dies inside the
    ghost margin, which is re-seeded from the interior every fused
    step.  Dispersive/NL windows are admitted wherever the interior
    call split admits them (ref: boundaries.cpp:88 + susceptibility
    halos — here the halo IS the physics, by construction)."""
    from . import fdtd3d_t2 as T2
    if plan.gv.dim != "3d" or not plan.periodic[0]:
        return None
    if plan.periodic[1] or plan.periodic[2]:
        return None
    if not _no_mirror(plan):
        return None
    if getattr(plan, "complex_fields", False) \
            or getattr(plan, "real_pair", False):
        return None
    if plan.dfts:
        return None
    ph_c = complex(plan.bloch_phase[0])
    if abs(ph_c.imag) > 1e-12 or abs(abs(ph_c.real) - 1.0) > 1e-12:
        return None                     # real wrap phase only (+1 / -1)
    ph = float(ph_c.real)
    # complex wrap phase for SOURCE IMAGES only (the pair driver embeds
    # a phase-free real view and applies the complex rotation itself);
    # left-ghost images carry ph^-1 = conj(ph) for |ph| = 1
    pha = complex(img_ph) if img_ph is not None else complex(ph)
    N = plan.gv.num[0]
    # x mask planes at i >= N kill the storage-padding dead region,
    # which the extended layout replaces with live ghosts — drop them.
    # True interior x masks (PEC planes) don't exist on a periodic axis;
    # reject defensively if one appears.
    ext_masks: Dict[str, Any] = {}
    for c, planes in (plan.mask_planes or {}).items():
        kept = []
        for (ax, i) in planes or []:
            if ax == 0:
                if i < N:
                    return None
                continue
            kept.append((ax, i))
        ext_masks[c] = kept
    S = tuple(plan.storage_shape or plan.gv.shape)
    if margin >= N:
        return None
    bxx = bx or T2._pick_bx(plan, None, 2)
    Gl = margin
    ext = Gl + N + margin
    ext += (-ext) % bxx
    Gr = ext - N - Gl

    def wrapx(arr):
        # material coefficients are PERIODIC — they wrap WITHOUT the
        # Bloch phase (the phase lives on the fields and sources only:
        # F(x+L) = ph F(x), c(x+L) = c(x))
        a = np.asarray(arr)
        if a.ndim == 3 and a.shape[0] == S[0]:
            live = a[:N]
            return np.concatenate([live[N - Gl:], live, live[:Gr]],
                                  axis=0)
        return a

    ext_coefs = {k: wrapx(v) for k, v in plan.coefs.items()}
    # sources: shift into ext coords; boundary-adjacent points get a
    # phase-scaled image in the opposite ghost zone so the ghost-region
    # evolution matches the wrapped physics
    ext_sources = []
    for s in plan.sources:
        idx = np.asarray(s.indices).copy()
        amps = np.asarray(s.amps).copy()
        rows = [np.concatenate([idx[:, :1] + Gl, idx[:, 1:]], axis=1)]
        arows = [amps]
        left = idx[:, 0] >= N - Gl          # images into the left ghost
        if np.any(left):
            im = idx[left].copy()
            im[:, 0] = im[:, 0] - N + Gl
            rows.append(im)
            arows.append(amps[left] * np.conj(pha))
        right = idx[:, 0] < Gr              # images into the right ghost
        if np.any(right):
            im = idx[right].copy()
            im[:, 0] = im[:, 0] + N + Gl
            rows.append(im)
            arows.append(amps[right] * pha)
        ext_sources.append(dataclasses.replace(
            s, indices=np.concatenate(rows, axis=0),
            amps=np.concatenate(arows, axis=0)))
    boxes = getattr(plan, "support_boxes", None)
    ext_boxes = None
    if boxes is not None:
        ext_boxes = {}
        for k, b in boxes.items():
            if b is None:
                ext_boxes[k] = None
            else:
                ext_boxes[k] = (((b[0][0] + Gl), (b[0][1] + Gl)),
                                b[1], b[2])
    ext_plan = dataclasses.replace(
        plan, storage_shape=(ext,) + tuple(S[1:]), coefs=ext_coefs,
        sources=ext_sources, periodic=(False,) + tuple(plan.periodic[1:]),
        bloch_phase=(1.0,) + tuple(plan.bloch_phase[1:]),
        support_boxes=ext_boxes, mask_planes=ext_masks)
    return ext_plan, Gl, Gr, N, ph, bxx


def periodic_ghost_supported(plan, bx: int = None) -> bool:
    """Envelope for the ghost-ring periodic driver (real wrap phase,
    unmonitored; dispersive/NL windows wherever the plain kernel's
    interior call split admits them)."""
    from . import fdtd3d_t2 as T2
    p = _ghost_ring_ext(plan, bx)
    if p is None:
        return False
    ext_plan, _Gl, _Gr, _N, _ph, bxx = p
    try:
        return T2.supported(ext_plan, bxx, depth=2)
    except Exception:                    # noqa: BLE001
        return False


class PeriodicGhostT2Kernel:
    """Bloch ghost-ring driver: the plain depth-2/3 fused kernel on the
    extended aperiodic grid, ghosts re-seeded (x ph) from the interior
    every fused sweep.  State lives permanently in the EXTENDED compact
    layout; from_full/to_full wrap/slice the x planes."""

    def __init__(self, plan, bx: int = None, depth: int = None):
        from . import fdtd3d_t2 as T2
        p = _ghost_ring_ext(plan, bx)
        if p is None:
            raise ValueError("plan outside the ghost-ring envelope")
        self.plan = plan
        self.ext_plan, self.Gl, self.Gr, self.N, self.ph, bxx = p
        if not T2.supported(self.ext_plan, bxx, depth=2):
            raise ValueError("extended plan outside the t2 envelope")
        if depth is None:
            depth = 3 if T2.supported(self.ext_plan, bxx, depth=3) else 2
        self.ker = T2.Fdtd3dT2Kernel(self.ext_plan, bxx, depth=depth)
        self.bx = bxx
        self.depth = self.ker.depth
        self.xs_keys = self.ker.xs_keys
        # NOTE: no `_k1` attribute on purpose — the hybrid's probed/
        # cycle paths would step the raw 1-step companion WITHOUT the
        # ghost refresh; they must fall back (plan.dfts excludes the
        # ghost driver from cycle paths anyway)
        self.k3 = None
        ext = self.ext_plan.storage_shape[0]
        self._ext = ext
        # x-leading ext-state arrays that carry the ghost refresh
        self._ring_keys = [k for k, v in self.ker.init_state().items()
                           if getattr(v, "ndim", 0) == 3
                           and v.shape[0] == ext]

    # -- state ---------------------------------------------------------
    def init_state(self):
        return self.ker.init_state()

    def from_full(self, full):
        """Wrap-extend the x planes of every grid-shaped array, then
        convert through the extended kernel's layout."""
        Gl, Gr, N, ph = self.Gl, self.Gr, self.N, self.ph
        S0 = (self.plan.storage_shape or self.plan.gv.shape)[0]

        def ext(a):
            if getattr(a, "ndim", 0) >= 3 and a.shape[-3] == S0:
                live = a[..., :N, :, :]
                return jnp.concatenate(
                    [ph * live[..., N - Gl:, :, :], live,
                     ph * live[..., :Gr, :, :]], axis=-3)
            return a

        full_e = jax.tree.map(ext, {k: full[k] for k in ("f", "f_u",
                                                         "f_w")
                                    if k in full})
        full_e = {**full, **full_e}
        if full.get("pol"):
            full_e["pol"] = jax.tree.map(ext, full["pol"])
        return self.ker.from_full(full_e)

    def to_full(self, state, C=None):
        Gl, N = self.Gl, self.N
        S0 = (self.plan.storage_shape or self.plan.gv.shape)[0]
        full_e = self.ker.to_full(state, C)

        def cut(a):
            if getattr(a, "ndim", 0) >= 3 and a.shape[-3] == self._ext:
                live = a[..., Gl:Gl + N, :, :]
                pad = S0 - N
                if pad:
                    zshape = live.shape[:-3] + (pad,) + live.shape[-2:]
                    live = jnp.concatenate(
                        [live, jnp.zeros(zshape, live.dtype)], axis=-3)
                return live
            return a

        out = {k: (jax.tree.map(cut, v) if k in ("f", "f_u", "f_w",
                                                 "pol") else v)
               for k, v in full_e.items()}
        return out

    # -- stepping ------------------------------------------------------
    def _refresh(self, state):
        Gl, Gr, N, ph = self.Gl, self.Gr, self.N, self.ph
        out = dict(state)
        for k in self._ring_keys:
            v = state[k]
            v = v.at[:Gl].set(ph * v[N:N + Gl])
            v = v.at[Gl + N:].set(ph * v[Gl:Gl + Gr])
            out[k] = v
        return out

    def make_fused_step(self):
        stepk = self.ker.make_fused_step()

        def step(state, x_rows, C):
            return stepk(self._refresh(state), x_rows, C)

        return step

    def make_step(self):
        step1 = self.ker._k1.make_step()

        def step(state, xt, C):
            return step1(self._refresh(state), xt, C)

        return step

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 2):
        from ...stepper.step import build_xs
        depth = self.depth
        npair = nsteps // depth
        rem = nsteps - depth * npair
        C = self.ext_plan.coefs
        if npair:
            xs_all = build_xs(self.ext_plan, depth * npair, t0)
            xs = {k: np.asarray(v).reshape((npair, depth) + v.shape[1:])
                  for k, v in xs_all.items() if k in self.xs_keys}
            cache = getattr(self, "_run_cache", None)
            if cache is None:
                cache = self._run_cache = {}
            runner_c = cache.get((npair, unroll))
            if runner_c is None:
                stepd = self.make_fused_step()

                def runner(state, xs, C):
                    def body(carry, x):
                        return stepd(carry, x, C), None
                    state, _ = jax.lax.scan(
                        body, state, xs, length=npair,
                        unroll=unroll if npair % unroll == 0 else 1)
                    return state

                runner_c = cache[(npair, unroll)] = jax.jit(runner)
            state = runner_c(state, xs, C)
        if rem:
            step1 = self.make_step()
            xs_all = build_xs(self.ext_plan, rem, t0 + depth * npair)
            for j in range(rem):
                state = step1(state,
                              {k: v[j] for k, v in xs_all.items()}, C)
        return state


def pair_periodic_ghost_supported(plan, bx: int = None) -> bool:
    """Envelope for the PAIR ghost-ring driver: real-pair plan whose
    only complex coupling is an arbitrary-unit-modulus x Bloch phase
    (oblique-incidence gratings), unmonitored."""
    if not (getattr(plan, "real_pair", False) and plan.complex_fields):
        return False
    if plan.gv.dim != "3d" or not plan.periodic[0]:
        return False
    ph = complex(plan.bloch_phase[0])
    if abs(abs(ph) - 1.0) > 1e-9:
        return False
    return periodic_ghost_supported(_real_view(plan))


class PairPeriodicGhostT2Kernel:
    """Arbitrary-k_x Bloch ghost-ring stepping: two single-channel
    real compact states advanced by the SAME plain fused kernel on the
    Bloch-wrapped extended grid; the complex wrap phase enters ONLY
    through (a) the per-sweep ghost refresh (2x2 channel rotation) and
    (b) the baked complex source-image amplitudes, with the im channel
    consuming the waveform rows swapped ((w_re, w_im) -> (w_im, -w_re)
    = Im[w a] pointwise) — the ghost-ring analog of
    PairPeriodicXKernel (DOCMP unroll of boundaries.cpp:347)."""

    def __init__(self, plan, bx: int = None, depth: int = None):
        from . import fdtd3d_t2 as T2
        if not pair_periodic_ghost_supported(plan, bx):
            raise ValueError("plan outside the pair ghost-ring envelope")
        self.plan = plan
        rv = _real_view(plan)
        ph = complex(plan.bloch_phase[0])
        p = _ghost_ring_ext(rv, bx, img_ph=ph)
        if p is None:
            raise ValueError("plan outside the ghost-ring envelope")
        self.ext_plan, self.Gl, self.Gr, self.N, _one, bxx = p
        if not T2.supported(self.ext_plan, bxx, depth=2):
            raise ValueError("extended plan outside the t2 envelope")
        if depth is None:
            depth = 3 if T2.supported(self.ext_plan, bxx, depth=3) else 2
        self.ker = T2.Fdtd3dT2Kernel(self.ext_plan, bxx, depth=depth)
        self.bx = bxx
        self.depth = self.ker.depth
        self.xs_keys = self.ker.xs_keys
        self._a, self._b = float(ph.real), float(ph.imag)
        ext = self.ext_plan.storage_shape[0]
        self._ext = ext
        self._ring_keys = [k for k, v in self.ker.init_state().items()
                           if getattr(v, "ndim", 0) == 3
                           and v.shape[0] == ext]
        self._src_pairs = [(kk, kk.replace(":cur_re", ":cur_im"))
                           for kk in self.xs_keys
                           if kk.endswith(":cur_re")]

    # -- state ---------------------------------------------------------
    def init_state(self):
        return {"re": self.ker.init_state(), "im": self.ker.init_state()}

    def _ext_pair_full(self, ar, ai):
        """Wrap-extend a (…, S0, Y, Z) channel pair with the 2x2 phase
        rotation: left ghost = conj(ph) F, right ghost = ph F."""
        Gl, Gr, N = self.Gl, self.Gr, self.N
        a, b = self._a, self._b
        lr_r = ar[..., N - Gl:N, :, :]
        lr_i = ai[..., N - Gl:N, :, :]
        rr_r = ar[..., :Gr, :, :]
        rr_i = ai[..., :Gr, :, :]
        er = jnp.concatenate([a * lr_r + b * lr_i, ar[..., :N, :, :],
                              a * rr_r - b * rr_i], axis=-3)
        ei = jnp.concatenate([-b * lr_r + a * lr_i, ai[..., :N, :, :],
                              b * rr_r + a * rr_i], axis=-3)
        return er, ei

    @staticmethod
    def _split(full, i):
        def leaf(v):
            if hasattr(v, "ndim") and v.ndim == 4 and v.shape[0] == 2:
                return v[i]
            return v
        return jax.tree.map(leaf, {k: v for k, v in full.items()
                                   if k != "dft"})

    def from_full(self, full):
        S0 = (self.plan.storage_shape or self.plan.gv.shape)[0]
        fr = self._split(full, 0)
        fi = self._split(full, 1)

        def ext_tree(tr, ti):
            out_r, out_i = {}, {}
            for k in tr:
                vr, vi = tr[k], ti[k]
                if isinstance(vr, dict):
                    out_r[k], out_i[k] = ext_tree(vr, vi)
                elif getattr(vr, "ndim", 0) >= 3 and vr.shape[-3] == S0:
                    out_r[k], out_i[k] = self._ext_pair_full(vr, vi)
                else:
                    out_r[k], out_i[k] = vr, vi
            return out_r, out_i

        keys = [k for k in ("f", "f_u", "f_w", "pol") if fr.get(k)]
        er, ei = ext_tree({k: fr[k] for k in keys},
                          {k: fi[k] for k in keys})
        fr = {**fr, **er}
        fi = {**fi, **ei}
        return {"re": self.ker.from_full(fr),
                "im": self.ker.from_full(fi)}

    def to_full(self, state, C=None):
        Gl, N = self.Gl, self.N
        S0 = (self.plan.storage_shape or self.plan.gv.shape)[0]
        fr = self.ker.to_full(state["re"], C)
        fi = self.ker.to_full(state["im"], C)

        def cut(a):
            if getattr(a, "ndim", 0) >= 3 and a.shape[-3] == self._ext:
                live = a[..., Gl:Gl + N, :, :]
                pad = S0 - N
                if pad:
                    z = jnp.zeros(live.shape[:-3] + (pad,)
                                  + live.shape[-2:], live.dtype)
                    live = jnp.concatenate([live, z], axis=-3)
                return live
            return a

        def leaf(a, b):
            if hasattr(a, "ndim") and a.ndim >= 3:
                return jnp.stack([cut(a), cut(b)])
            return a
        return jax.tree.map(leaf, fr, fi)

    # -- stepping ------------------------------------------------------
    def _refresh(self, state2):
        Gl, Gr, N = self.Gl, self.Gr, self.N
        a, b = self._a, self._b
        sre = dict(state2["re"])
        sim_ = dict(state2["im"])
        for k in self._ring_keys:
            vr, vi = sre[k], sim_[k]
            lr_r, lr_i = vr[N:N + Gl], vi[N:N + Gl]
            rr_r, rr_i = vr[Gl:Gl + Gr], vi[Gl:Gl + Gr]
            sre[k] = vr.at[:Gl].set(a * lr_r + b * lr_i) \
                .at[Gl + N:].set(a * rr_r - b * rr_i)
            sim_[k] = vi.at[:Gl].set(-b * lr_r + a * lr_i) \
                .at[Gl + N:].set(b * rr_r + a * rr_i)
        return sre, sim_

    def _xs_im(self, x_rows):
        out = dict(x_rows)
        for (kre, kim) in self._src_pairs:
            out[kre] = x_rows[kim]
            out[kim] = -x_rows[kre]
        return out

    def make_fused_step(self):
        stepk = self.ker.make_fused_step()

        def step(state2, x_rows, C):
            sre, sim_ = self._refresh(state2)
            sre = stepk(sre, x_rows, C)
            sim_ = stepk(sim_, self._xs_im(x_rows), C)
            return {"re": sre, "im": sim_}

        return step

    def run(self, state, nsteps: int, t0: int = 0, unroll: int = 2):
        from ...stepper.step import build_xs
        depth = self.depth
        npair = nsteps // depth
        rem = nsteps - depth * npair
        C = self.ext_plan.coefs
        if npair:
            xs_all = build_xs(self.ext_plan, depth * npair, t0)
            xs = {k: np.asarray(v).reshape((npair, depth) + v.shape[1:])
                  for k, v in xs_all.items() if k in self.xs_keys}
            cache = getattr(self, "_run_cache", None)
            if cache is None:
                cache = self._run_cache = {}
            runner_c = cache.get((npair, unroll))
            if runner_c is None:
                stepd = self.make_fused_step()

                def runner(state, xs, C):
                    def body(carry, x):
                        return stepd(carry, x, C), None
                    state, _ = jax.lax.scan(
                        body, state, xs, length=npair,
                        unroll=unroll if npair % unroll == 0 else 1)
                    return state

                runner_c = cache[(npair, unroll)] = jax.jit(runner)
            state = runner_c(state, xs, C)
        if rem:
            step1k = self.ker._k1.make_step()
            xs_all = build_xs(self.ext_plan, rem, t0 + depth * npair)
            for j in range(rem):
                xt = {k: v[j] for k, v in xs_all.items()}
                sre, sim_ = self._refresh(state)
                state = {"re": step1k(sre, xt, C),
                         "im": step1k(sim_, self._xs_im(xt), C)}
        return state
