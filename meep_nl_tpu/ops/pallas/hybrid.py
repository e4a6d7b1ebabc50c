"""Hybrid production run path: ALL steps through the fused Mosaic
kernel; DFT accumulation from a read-only full-state view on sample
steps.

`build_xs` zeroes every monitor's phase rows on non-sample steps (the
automatic Nyquist decimation, dft.cpp:195-216), so the run splits into
uniform cycles of `d` steps: all d advance through the temporally-fused
kernel (fdtd3d_t2 / the 1-step dispersive kernel) on the compact D/B
state, then the cycle's sample step accumulates its DTFT directly from
`to_full(comp)` -- a pure read (u*D + stored-slab/disp-window overlays),
no jnp stepper pass and no from_full: the compact state carries on
unchanged.  Sampling the post-step state is exactly what the jnp
stepper's in-step `_dft_update` sees (E at (t+1)dt, H at (t+1/2)dt).

Round-3 history: the first hybrid ran (d-1) fused steps + one full jnp
step per cycle; that jnp step (~20 fused-step equivalents) dominated
monitored runs.  The DFT-only sample view cuts the per-cycle overhead
to ~one to_full read.  Falls back to the jnp path whenever the plan is
outside the kernel envelope or the sample steps are not uniformly
spaced."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _sample_steps(plan, t0: int, nsteps: int) -> np.ndarray:
    """Steps whose xs rows carry a nonzero DFT phase.  Mirrors build_xs's
    decimation rule ((step+1) % decimation == 0) in closed form — no
    device reads (the axon tunnel only supports scalar d2h)."""
    steps = t0 + np.arange(nsteps)
    active = np.zeros(nsteps, bool)
    for m in plan.dfts:
        active |= ((steps + 1) % max(int(m.decimation), 1)) == 0
    return active


def cycle_structure(plan, t0: int, nsteps: int):
    """Split a monitored stretch into (prefix, d, ncyc, suffix) uniform
    decimation cycles whose last step is the DFT sample step, or None
    when the sampling isn't uniformly spaced / there is no room for a
    fused stretch.  Shared by the single-device hybrid and the sharded
    hybrid (parallel/fused_mesh.sharded_hybrid_run)."""
    active = _sample_steps(plan, t0, nsteps)
    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return None                      # caller: fully fused, no cycles
    gaps = np.diff(idx)
    if len(gaps) and len(set(gaps.tolist())) != 1:
        return None
    d = int(gaps[0]) if len(gaps) else nsteps - int(idx[0])
    if d < 1:
        return None
    # d == 1 (every step sampled — the reference disables decimation for
    # nonlinear media, dft.cpp:195) still runs fused: each cycle is one
    # 1-step kernel call + the plane-sampled DFT read, ~2x the jnp path
    a0 = int(idx[0])
    prefix = a0 + 1 - d if a0 + 1 >= d else a0 + 1
    ncyc = (nsteps - prefix) // d
    suffix = nsteps - prefix - ncyc * d
    if ncyc < 1:
        return None
    return prefix, d, ncyc, suffix


def _get_kernel(plan):
    """The fastest fused kernel covering this plan: the temporally fused
    kernel for the linear/pure-ADE envelope (with a depth-3 companion
    when the plan supports it — the cycle driver mixes 3/2/1-step calls
    to cover arbitrary sample spacings), the 1-step kernel for the NL
    dispersive (chi2/chi3) envelope."""
    ker = getattr(plan, "_t2_kernel", None)
    if ker is None:
        from . import fdtd3d, fdtd3d_t2
        if any(plan.periodic):
            # x-periodic plans (ops/pallas/periodicx.py): depth-2
            # temporal fusion across the wrap when the halo-in-time
            # envelope fits, else the 1-step wrap ghost/carry driver.
            # Complex Bloch phases ride the real-pair channel pair.
            from .periodicx import (PeriodicXKernel, PairPeriodicXKernel,
                                    PeriodicXT2Kernel,
                                    PeriodicGhostT2Kernel,
                                    PairPeriodicGhostT2Kernel,
                                    pair_periodic_supported,
                                    periodic_t2_supported,
                                    periodic_ghost_supported,
                                    pair_periodic_ghost_supported)
            if plan.complex_fields and pair_periodic_ghost_supported(plan):
                ker = PairPeriodicGhostT2Kernel(plan, depth=2)
                try:
                    ker.k3 = PairPeriodicGhostT2Kernel(plan, bx=ker.bx,
                                                       depth=3)
                except ValueError:
                    ker.k3 = None
            elif plan.complex_fields and pair_periodic_supported(plan):
                ker = _K1Adapter(PairPeriodicXKernel(plan))
                ker.k3 = None
            elif periodic_ghost_supported(plan):
                # ghost-ring driver (round 5): plain fused kernel on
                # the Bloch-wrapped extended grid, depth-3 companion
                # sharing the extended layout
                ker = PeriodicGhostT2Kernel(plan, depth=2)
                try:
                    ker.k3 = PeriodicGhostT2Kernel(plan, bx=ker.bx,
                                                   depth=3)
                except ValueError:
                    ker.k3 = None
            elif periodic_t2_supported(plan):
                ker = PeriodicXT2Kernel(plan)
                ker.k3 = None
            else:
                ker = _K1Adapter(PeriodicXKernel(plan))
                ker.k3 = None
        elif fdtd3d_t2.supported(plan, depth=2):
            # depth-3 companion: both kernels must SHARE one bx so they
            # drive the same compact state layout (the layout depends on
            # (plan, bx, z_full), not on the schedule depth) — and the
            # depth-3 envelope usually needs the smaller bx (finer
            # blocks clear the disp-window/edge overruns)
            ker = None
            if os.environ.get("MNT_HYBRID_DEPTH3", "1") == "1":
                bx3 = fdtd3d_t2._pick_bx(plan, None, 3)
                if fdtd3d_t2.supported(plan, bx3, depth=3) \
                        and fdtd3d_t2.supported(plan, bx3, depth=2):
                    try:
                        ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx3, depth=2)
                        ker.k3 = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx3,
                                                          depth=3)
                    except ValueError:
                        ker = None
            if ker is None:
                ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, depth=2)
                ker.k3 = None
        else:
            ker = _K1Adapter(fdtd3d.Fdtd3dKernel(plan))
            ker.k3 = None
        plan._t2_kernel = ker
    return ker


class _K1Adapter:
    """Present the 1-step kernel through the 2-step interface the hybrid
    cycle driver expects (a 'pair' is two sequential 1-step calls)."""

    def __init__(self, k1):
        self._k1 = k1
        self.xs_keys = k1.xs_keys
        self.depth = 2

    def from_full(self, full):
        return self._k1.from_full(full)

    def to_full(self, comp, C=None):
        return self._k1.to_full(comp, C)

    def run(self, state, nsteps, t0=0):
        return self._k1.run(state, nsteps, t0=t0)

    def make_fused_step(self):
        step1 = self._k1.make_step()

        def step2(state, x_pair, C):
            state = step1(state, {k: v[0] for k, v in x_pair.items()}, C)
            return step1(state, {k: v[1] for k, v in x_pair.items()}, C)

        return step2


def hybrid_applicable(plan) -> bool:
    import os
    import jax
    # Mosaic kernels need a TPU backend.  On CPU the hybrid only engages
    # with the EXPLICIT opt-in MNT_HYBRID_CPU=1 (which implies interpret
    # mode) — NOT on MNT_PALLAS_INTERPRET, which kernel test modules
    # export at import time and would leak into every test in a session.
    if jax.default_backend() == "cpu":
        if os.environ.get("MNT_HYBRID_CPU") != "1":
            return False
        os.environ.setdefault("MNT_PALLAS_INTERPRET", "1")
    from . import fdtd3d, fdtd3d_t2
    if any(plan.periodic):
        from .periodicx import periodic_supported, pair_periodic_supported
        if plan.complex_fields:
            return pair_periodic_supported(plan)
        return periodic_supported(plan)
    return fdtd3d_t2.supported(plan) or fdtd3d.supported(plan)


def fused_probed_run(plan, state: Dict[str, Any], nsteps: int, t0: int,
                     probes) -> Optional[tuple]:
    """Probe-emitting fused run: the 1-step Mosaic kernel per step, with
    each probe's weighted point sample gathered from the COMPACT state
    (E/H assembled on the probed x-planes only, fused_mesh.e_eff_plane)
    — so Harminv / field-probe collectors leave the jnp path.  Returns
    (full_state, {name: (nsteps,) series}) or None outside the envelope
    (pair/complex plans, DFT monitors active, non-field components)."""
    if getattr(plan, "_hybrid_broken", False):
        return None
    if plan.dfts or plan.complex_fields:
        return None
    run_plan = plan
    has_cond = any(s.has_cond
                   for s in plan.curl_specs_d + plan.curl_specs_b)
    if has_cond:
        from .condfold import cond_fold_of
        run_plan = cond_fold_of(plan)
        if run_plan is None:
            return None
    if not hybrid_applicable(run_plan):
        return None
    from ...parallel.fused_mesh import e_eff_plane
    from ...stepper.step import build_xs
    try:
        ker = _get_kernel(run_plan)
    except Exception:                            # noqa: BLE001
        plan._hybrid_broken = True
        return None
    k1 = getattr(ker, "_k1", None)
    if k1 is None:
        return None
    L = k1.L
    # static probe gather plans: indices grouped by x-plane
    gathers = []
    for p in probes:
        comp = p.component
        if comp not in L.eh_by_ec and comp not in state.get("f", {}):
            return None
        idx = np.asarray(p.indices)
        w = np.asarray(p.weights)
        if np.iscomplexobj(w):
            if np.abs(w.imag).max() > 0:
                return None
            w = w.real
        by_x = {}
        for k in range(len(idx)):
            by_x.setdefault(int(idx[k][0]), []).append(
                (int(idx[k][1]), int(idx[k][2]), float(w[k])))
        gathers.append((p.name, comp, sorted(by_x.items())))

    C = run_plan.coefs
    dtype = run_plan.dtype

    def probe_val(comp_state, comp, by_x):
        tot = 0.0
        for x, pts in by_x:
            if comp in L.eh_by_ec:
                pl_ = e_eff_plane(run_plan, L, comp_state, C, comp, x)
            else:
                pl_ = comp_state[comp][x:x + 1]
            iy = np.array([q[0] for q in pts])
            iz = np.array([q[1] for q in pts])
            ww = jnp.asarray(np.array([q[2] for q in pts]), dtype)
            tot = tot + jnp.sum(pl_[0, iy, iz] * ww)
        return tot

    cache = getattr(plan, "_fused_probe_cache", None)
    if cache is None:
        cache = plan._fused_probe_cache = {}
    import hashlib
    key = (nsteps, tuple(
        (p.name, p.component,
         hashlib.sha1(np.ascontiguousarray(p.indices).tobytes()
                      + np.ascontiguousarray(p.weights).tobytes())
         .hexdigest()) for p in probes))
    runner_c = cache.get(key)
    if runner_c is None:
        step1 = k1.make_step()

        def runner(full_state, xs, C):
            comp0 = ker.from_full(full_state)

            def body(carry, x):
                ns = step1(carry, x, C)
                out = {name: probe_val(ns, comp, by_x)
                       for (name, comp, by_x) in gathers}
                return ns, out

            comp, ys = jax.lax.scan(body, comp0, xs, length=nsteps)
            full = ker.to_full(comp, C)
            return full, ys

        runner_c = cache[key] = jax.jit(runner)
    xs_all = build_xs(run_plan, nsteps, t0)
    xs = {k: v for k, v in xs_all.items() if k in k1.xs_keys}
    try:
        full, ys = runner_c(state, xs, C)
    except Exception as e:                       # noqa: BLE001
        import warnings
        plan._hybrid_broken = True
        warnings.warn(
            "fused probed path failed to build "
            f"({type(e).__name__}: {str(e)[:200]}); jnp fallback",
            stacklevel=2)
        return None
    keep = ["f", "f_u", "f_w"] + (["pol"] if full.get("pol") else [])
    out_state = {**state, **{k: full[k] for k in keep}, "t": full["t"]}
    if has_cond:
        from .condfold import resync_cond_state
        out_state = resync_cond_state(plan, out_state)
    return out_state, ys


def _dft_plane_meta(plan, L):
    """Static per-monitor gather plan for the plane-sampled DFT update:
    (component, x0, x1e, avg_axes, yz_slices) per monitor, or None when
    any monitor falls outside the exact envelope (component not
    assemblable from the compact state, x-centered averaging touching
    the live edge, pair/complex fields, periodic wraps) or the gather
    would not clearly beat the full-grid reconstruction."""
    from ...core import grid as G
    gv = plan.gv
    if gv.dim != "3d" or not plan.dfts:
        return None
    if any(plan.periodic) or getattr(plan, "complex_fields", False) \
            or getattr(plan, "real_pair", False):
        return None
    S0 = (plan.storage_shape or gv.shape)[0]
    meta, total = [], 0
    for m in plan.dfts:
        c = m.component
        if c not in L.eh_by_ec or len(m.region) != 3:
            return None
        ys = G.yee_shift(c, gv.dim)
        avg = tuple(ax for ax, d2 in enumerate(gv.axes)
                    if ys[d2] == 0) if m.centered else ()
        x0, x1 = int(m.region[0][0]), int(m.region[0][1])
        x1e = x1 + (1 if 0 in avg else 0)
        if x1e > S0 or (0 in avg and x1 >= gv.num[0]):
            return None
        meta.append((c, x0, x1e, avg,
                     (slice(*m.region[1]), slice(*m.region[2]))))
        total += x1e - x0
    if total > max(8, S0 // 3):
        return None                 # to_full is no worse at this size
    return meta


def _fv_from_planes(plan, planes, meta_mi):
    """Region-sliced, centered-averaged monitor values from a list of
    already-assembled effective-field x-planes."""
    from ...stepper.step import _sh
    c, x0, x1e, avg, sl_yz = meta_mi
    sub = planes[0] if len(planes) == 1 else jnp.concatenate(planes, 0)
    if 0 in avg:                    # dft.cpp:277 avg along x: gathered
        sub = 0.5 * (sub[:-1] + sub[1:])   # one extra plane above
    for ax in avg:
        if ax != 0:                 # in-plane axes: full extent, exact
            sub = 0.5 * (sub + _sh(plan, sub, ax, +1))
    return sub[(slice(None),) + sl_yz]


def _fv_planes(plan, L, C, comp_state, meta_mi):
    """Region-sliced, centered-averaged monitor values assembled from
    the kernel's COMPACT state: E_eff/H_eff on the monitor's x-planes
    only (fused_mesh.e_eff_plane — overlays included, identical to
    to_full's view), so the DFT cycle never reconstructs the grid."""
    from ...parallel.fused_mesh import e_eff_plane
    c, x0, x1e, avg, sl_yz = meta_mi
    planes = [e_eff_plane(plan, L, comp_state, C, c, x)
              for x in range(x0, x1e)]
    return _fv_from_planes(plan, planes, meta_mi)


def _capture_run(plan, ker, deep, k1, plane_meta, state, xs_cyc, ncyc,
                 cache, C):
    """d == 1 monitored stretch through the CAPTURE kernel: supercycles
    of `deep.depth` steps per fused sweep, with every intermediate
    step's monitor planes emitted by the kernel itself (in-kernel
    dft.cpp:265 sampling) and the final step's E planes assembled from
    the post-sweep compact state.  Returns the runner's full-state
    output (caller merges + handles the suffix)."""
    from . import fdtd3d_t2 as _T2
    from ...parallel.fused_mesh import e_eff_plane
    from ...stepper.step import _dft_update

    dd = deep.depth
    nsuper = ncyc // dd
    tail = ncyc - nsuper * dd
    cap_planes = sorted({(m[0], x) for m in plane_meta
                         for x in range(m[1], m[2])})
    capker = getattr(plan, "_cap_kernel", None)
    if capker is None or capker.depth != dd \
            or capker.cap_planes != sorted(cap_planes):
        capker = plan._cap_kernel = _T2.Fdtd3dT2Kernel(
            plan, ker.bx, depth=dd, cap_planes=cap_planes)
    runner_c = cache.get(("cap", dd, ncyc))
    if runner_c is None:
        stepC = capker.make_capture_step()
        step1 = ker._k1.make_step()

        def runner(full_state, xs_sup, xs_tail, C):
            comp0 = ker.from_full(full_state)
            aux = {k: v for k, v in full_state.items()
                   if k not in ("f", "f_u", "f_w", "f_cond", "t")}

            def body(carry, xc):
                comp, dft = carry
                comp, caps = stepC(comp, xc, C)
                for u in range(1, dd + 1):
                    x_u = {k: xc[k][u - 1] for k in xc}

                    def fv_of(mi, m, u=u, comp=comp, caps=caps):
                        c, x0, x1e, avg, sl_yz = plane_meta[mi]
                        if c[0] == "h" or u < dd:
                            planes = [caps[f"cap:{u}:{c}:{x}"]
                                      for x in range(x0, x1e)]
                        else:
                            # final step's E: read from the advanced
                            # compact state (same view to_full builds)
                            planes = [e_eff_plane(plan, k1.L, comp, C,
                                                  c, x)
                                      for x in range(x0, x1e)]
                        return _fv_from_planes(plan, planes,
                                               plane_meta[mi])

                    dft = _dft_update(plan, C, {"dft": dft}, x_u,
                                      fv_of=fv_of)["dft"]
                return (comp, dft), None

            def tbody(carry, x1):
                comp, dft = carry
                comp = step1(comp, {k: v for k, v in x1.items()
                                    if k in ker._k1.xs_keys}, C)
                dft = _dft_update(
                    plan, C, {"dft": dft}, x1,
                    fv_of=lambda mi, m, comp=comp: _fv_planes(
                        plan, k1.L, C, comp, plane_meta[mi]))["dft"]
                return (comp, dft), None

            carry = (comp0, full_state["dft"])
            if nsuper:
                carry, _ = jax.lax.scan(body, carry, xs_sup,
                                        length=nsuper)
            if tail:
                carry, _ = jax.lax.scan(tbody, carry, xs_tail,
                                        length=tail)
            comp, dft = carry
            full = ker.to_full(comp, C)
            full["dft"] = dft
            for k, v in aux.items():
                if k not in full:
                    full[k] = v
            return full

        runner_c = cache[("cap", dd, ncyc)] = jax.jit(runner)
    rows = {k: np.asarray(v).reshape((ncyc,) + np.asarray(v).shape[2:])
            for k, v in xs_cyc.items()}
    xs_sup = {k: v[:nsuper * dd].reshape((nsuper, dd) + v.shape[1:])
              for k, v in rows.items()}
    xs_tail = {k: v[nsuper * dd:] for k, v in rows.items()}
    return runner_c(state, xs_sup, xs_tail, C)


def hybrid_run(plan, state: Dict[str, Any], nsteps: int, t0: int
               ) -> Optional[Dict[str, Any]]:
    """Advance the FULL jnp state by nsteps via the hybrid path.
    Returns None when the cycle structure doesn't apply OR the kernel
    fails to build/compile for this plan (caller falls back to jnp —
    the envelope checks are static, but Mosaic lowering can still
    reject specific geometry/layout combinations).

    Plans with D/B conductivity run on their folded equivalent
    (ops/pallas/condfold): the cond update rides the chain1 coefs, the
    fused kernels see an ordinary cond-free plan, and the original
    plan's f_cond family is re-synced afterwards (f_cond == f at the
    conductive sites — the invariant the fold rests on)."""
    if getattr(plan, "_hybrid_broken", False):
        return None
    run_plan = plan
    has_cond = any(s.has_cond
                   for s in plan.curl_specs_d + plan.curl_specs_b)
    if has_cond:
        from .condfold import cond_fold_of, resync_cond_state
        run_plan = cond_fold_of(plan)
        if run_plan is None:
            return None                 # inexact fold: jnp path owns it
    try:
        out = _hybrid_run_inner(run_plan, state, nsteps, t0)
    except Exception as e:                       # noqa: BLE001
        import warnings
        plan._hybrid_broken = True
        warnings.warn(
            "fused hybrid path failed to build for this plan "
            f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
            "jnp stepper", stacklevel=2)
        return None
    if out is not None and has_cond:
        out = resync_cond_state(plan, out)
    return out


def _hybrid_run_inner(plan, state: Dict[str, Any], nsteps: int, t0: int
                      ) -> Optional[Dict[str, Any]]:
    from ...stepper.step import build_xs, make_step

    if not hybrid_applicable(plan) or nsteps < 4:
        return None
    # the kernel's compact<->full conversions produce slab-semantic aux
    # state (f_u/f_w zero outside the true-sigma ranges); the jnp steps in
    # the cycle must use the slab-local path, which never reads outside
    # those ranges (equivalence: test_slab_opt)
    plan.slab_opt = True
    ker = _get_kernel(plan)
    # the ghost-ring periodic kernel steps/converts against its EXTENDED
    # plan's coefficients (it never reaches the DFT cycle paths — its
    # envelope requires plan.dfts empty, so C is only consumed by the
    # kernel itself here)
    C = getattr(ker, "ext_plan", plan).coefs

    if not np.any(_sample_steps(plan, t0, nsteps)):
        # no sampling at all in this stretch: fully fused (the depth-3
        # companion when available).  from_full -> scan -> to_full runs
        # as ONE cached jit: the eager conversions cost ~100 op
        # dispatches each — latency-bound through the axon tunnel — and
        # dominated repeated public-API runs (measured 2.4 vs 7+
        # GCells/s at 127^3)
        deep = ker.k3 if getattr(ker, "k3", None) is not None else ker
        dd = getattr(deep, "depth", 2)
        if nsteps % dd:
            # step remainder: rare (callers advance in multiples); the
            # unfused-tail path handles it
            comp = ker.from_full(state)
            comp = deep.run(comp, nsteps, t0=t0)
            full = ker.to_full(comp, C)
            keep = ["f", "f_u", "f_w"] + (["pol"] if full.get("pol")
                                          else [])
            return {**state, **{k: full[k] for k in keep},
                    "t": full["t"]}
        cache = getattr(plan, "_hybrid_cache", None)
        if cache is None:
            cache = plan._hybrid_cache = {}
        npair = nsteps // dd
        runner_c = cache.get(("nosample", nsteps))
        if runner_c is None:
            step_d = deep.make_fused_step()

            def runner(full_state, xs, C):
                comp = ker.from_full(full_state)

                def body(carry, x):
                    return step_d(carry, x, C), None

                comp, _ = jax.lax.scan(body, comp, xs, length=npair,
                                       unroll=2 if npair % 2 == 0 else 1)
                return ker.to_full(comp, C)

            runner_c = cache[("nosample", nsteps)] = jax.jit(runner)
        from ...stepper.step import build_xs
        xs_all = build_xs(plan, nsteps, t0)
        xs = {k: np.asarray(v).reshape((npair, dd) + v.shape[1:])
              for k, v in xs_all.items() if k in deep.xs_keys}
        full = runner_c(state, xs, C)
        keep = ["f", "f_u", "f_w"] + (["pol"] if full.get("pol") else [])
        return {**state, **{k: full[k] for k in keep}, "t": full["t"]}

    cs = cycle_structure(plan, t0, nsteps)
    if cs is None:
        return None
    prefix, d, ncyc, suffix = cs

    # decompose the d-step fused stretch into 3/2/1-step kernel calls,
    # preferring the deepest schedule (fewest HBM traversals): d = 3a +
    # 2b + c with c only for d == 1
    if getattr(ker, "k3", None) is not None and d >= 3:
        r3 = d % 3
        if r3 == 0:
            n3, npair, rem = d // 3, 0, 0
        elif r3 == 2:
            n3, npair, rem = d // 3, 1, 0
        else:                      # r3 == 1, d >= 4
            n3, npair, rem = (d - 4) // 3, 2, 0
    else:
        n3 = 0
        npair = d // 2
        rem = d % 2

    from ...stepper.step import run as jnp_run, _dft_update
    t = t0
    if prefix:
        state = jnp_run(plan, state, prefix, t0=t)
        t += prefix

    xs_cyc_full = build_xs(plan, ncyc * d, t)
    xs_cyc = {k: np.asarray(v).reshape((ncyc, d) + np.asarray(v).shape[1:])
              for k, v in xs_cyc_full.items()}

    cache = getattr(plan, "_hybrid_cache", None)
    if cache is None:
        cache = plan._hybrid_cache = {}
    k1 = getattr(ker, "_k1", None)
    plane_meta = (_dft_plane_meta(plan, k1.L)
                  if k1 is not None and hasattr(k1, "L")
                  and os.environ.get("MNT_HYBRID_PLANE_DFT", "1") == "1"
                  else None)

    # ---- d == 1 supercycles: in-kernel DFT plane capture -------------
    # NL media disable decimation (dft.cpp:195-216) so EVERY step
    # samples; without capture each cycle degenerates to one 1-step
    # kernel call.  The capture kernel advances `depth` steps per fused
    # sweep and emits every intermediate stage's monitor planes as
    # dedicated outputs (dft.cpp:265 inside step.cpp:127), keeping the
    # deep temporal fusion for monitored nonlinear runs.
    from . import fdtd3d_t2 as _T2
    deep = ker.k3 if getattr(ker, "k3", None) is not None else ker
    use_cap = (d == 1 and plane_meta is not None
               and isinstance(ker, _T2.Fdtd3dT2Kernel)
               and os.environ.get("MNT_HYBRID_CAPTURE", "1") == "1"
               and getattr(deep, "depth", 1) >= 2
               and ncyc >= getattr(deep, "depth", 1))
    if use_cap:
        out = _capture_run(plan, ker, deep, k1, plane_meta, state,
                           xs_cyc, ncyc, cache, C)
        keep = ["f", "f_u", "f_w", "dft"] + (["pol"] if out.get("pol")
                                             else [])
        state = {**state, **{k: out[k] for k in keep}, "t": out["t"]}
        t += ncyc * d
        if suffix:
            state = jnp_run(plan, state, suffix, t0=t)
        return state

    runner_c = cache.get((d, ncyc))
    if runner_c is None:
        step2 = ker.make_fused_step()
        step3 = ker.k3.make_fused_step() if n3 else None
        step1 = ker._k1.make_step()
        kxs = set(ker.xs_keys) | set(ker._k1.xs_keys)
        if n3:
            kxs |= set(ker.k3.xs_keys)

        def runner(full_state, xs, C):
            comp0 = ker.from_full(full_state)
            aux = {k: v for k, v in full_state.items()
                   if k not in ("f", "f_u", "f_w", "f_cond", "t")}

            def body(carry, xc):
                comp, dft = carry
                # ALL d steps fused; the cycle's last step is the sample
                o = 0
                for _ in range(n3):
                    xp = {k: xc[k][o:o + 3] for k in xc if k in kxs}
                    comp = step3(comp, xp, C)
                    o += 3
                for _ in range(npair):
                    xp = {k: xc[k][o:o + 2] for k in xc if k in kxs}
                    comp = step2(comp, xp, C)
                    o += 2
                if rem:
                    x1 = {k: xc[k][d - 1] for k in xc if k in kxs}
                    comp = step1(comp, x1, C)
                x_last = {k: xc[k][d - 1] for k in xc}
                if plane_meta is not None:
                    # plane-sampled DFT (dft.cpp:265 in-step semantics):
                    # monitor x-planes assembled straight from the
                    # COMPACT state — no full-grid reconstruction per
                    # DFT cycle
                    dft = _dft_update(
                        plan, C, {"dft": dft}, x_last,
                        fv_of=lambda mi, m: _fv_planes(
                            plan, k1.L, C, comp,
                            plane_meta[mi]))["dft"]
                else:
                    # DFT-only sample from the read-only full view (E at
                    # (t+1)dt, H at (t+1/2)dt == the jnp in-step
                    # sampling)
                    full = ker.to_full(comp, C)
                    dft = _dft_update(plan, C,
                                      {"f": full["f"], "dft": dft},
                                      x_last)["dft"]
                return (comp, dft), None

            (comp, dft), _ = jax.lax.scan(body, (comp0, full_state["dft"]),
                                          xs, length=ncyc)
            full = ker.to_full(comp, C)
            full["dft"] = dft
            for k, v in aux.items():
                if k not in full:
                    full[k] = v
            return full

        runner_c = cache[(d, ncyc)] = jax.jit(runner)
    out = runner_c(state, xs_cyc, C)
    keep = ["f", "f_u", "f_w", "dft"] + (["pol"] if out.get("pol") else [])
    state = {**state, **{k: out[k] for k in keep}, "t": out["t"]}
    t += ncyc * d
    if suffix:
        state = jnp_run(plan, state, suffix, t0=t)
    return state
