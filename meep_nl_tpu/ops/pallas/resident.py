"""VMEM-resident whole-grid FDTD stepping (Mosaic/Pallas).

The 3D production kernels (fdtd3d*.py) optimize the HBM-streaming regime:
grids far larger than VMEM, with each x-slab loaded once per (temporally
fused) step.  Small and medium grids — every 1D/2D/cylindrical simulation
and small 3D cells — sit in the opposite regime: the ENTIRE simulation
state fits in the core's ~128 MB VMEM.  There the speed-of-light design is
to load the state once, run the whole time loop on-chip, and write the
final state back: ZERO HBM traffic per step and zero per-step dispatch
overhead.  On the reference's typical 2D configs (ring resonator,
waveguide flux: ~1e5 cells — cf. reference tests/bench.cpp:33-90 and
python/tests/test_ring.py) per-step dispatch + HBM round trips dominate
the jnp path's cost, so residency is worth an order of magnitude.

The kernel body is the UNMODIFIED jnp stepper (stepper/step.make_step)
traced inside a lax.fori_loop: the same update functions that define
correctness on the jnp path (step.cpp:35-140 ordering) become the Mosaic
program, so the envelope is every plan the stepper supports minus the few
constructs whose primitives do not lower to Mosaic:

  * per-index scatter-adds (sources): replaced by dense pre-scattered
    amplitude arrays (plan.scatter_free, stepper/step._apply_sources);
  * value dynamic-update-slice (cylindrical axis rings, slab-local
    stores): where-variants / the full-grid chain path (slab_opt=False);
  * RNG (noisy media) and the multilevel transition stack: jnp-only.

Complex fields ride the real-pair channel layout (plan.real_pair), which
is mandatory off-CPU anyway — so Bloch k-points, cylindrical m != 0 and
BFAST all run resident.  Per-step inputs ride refs indexed by the loop
counter: source waveforms as SMEM scalars, DFT phase rows as dynamic VMEM
row slices.  DFT accumulators live in the loop carry, so monitored runs
never leave the chip either (dft.cpp:265 update_dft inside the loop).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: VMEM budget for (2x state + coefs + xs): the loop carry and its source
#: copy are both live across the fori_loop, plus revolving I/O buffers.
VMEM_BUDGET = int(os.environ.get("MNT_RESIDENT_BUDGET", 112 * 2 ** 20))

#: max steps per pallas_call (bounds the xs tables and compile variants)
MAX_CHUNK = int(os.environ.get("MNT_RESIDENT_CHUNK", 8192))


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def resident_plan(plan):
    """A shallow clone of `plan` prepared for in-kernel stepping:
    full-grid chain updates (no slab-local .at[] stores), dense
    pre-scattered source arrays, where-based axis-ring writes."""
    cached = getattr(plan, "_resident_plan", None)
    if cached is not None:
        return cached
    p = copy.copy(plan)
    for attr in ("_t2_kernel", "_hybrid_cache", "_fused_probe_cache",
                 "_hybrid_broken", "_resident_plan", "_resident_kernel",
                 "_resident_broken"):
        if hasattr(p, attr):
            delattr(p, attr)
    p.slab_opt = False
    p.slab_store = False
    p.use_pallas = False
    p.scatter_free = True
    p.dft_front = True
    coefs = dict(plan.coefs)
    shape = tuple(plan.storage_shape or plan.gv.shape)
    for si, s in enumerate(plan.sources):
        if f"src{si}:idx" not in coefs:
            continue
        idx = np.asarray(coefs[f"src{si}:idx"])
        are = np.asarray(coefs[f"src{si}:amp_re"], np.float64)
        aim = np.asarray(coefs[f"src{si}:amp_im"], np.float64)
        if not s.is_integrated and f"src{si}:cndinv" in coefs:
            cnd = np.asarray(coefs[f"src{si}:cndinv"], np.float64)
            are, aim = are * cnd, aim * cnd
        dre = np.zeros(shape, np.float64)
        dim_ = np.zeros(shape, np.float64)
        np.add.at(dre, tuple(idx.T), are)
        np.add.at(dim_, tuple(idx.T), aim)
        coefs[f"src{si}:dense_re"] = jnp.asarray(dre, plan.dtype)
        coefs[f"src{si}:dense_im"] = jnp.asarray(dim_, plan.dtype)
    p.coefs = coefs
    plan._resident_plan = p
    return p


def _state_bytes(plan) -> int:
    """Bytes of the stepper state for `plan` (shape-only evaluation)."""
    from ...stepper import step as S
    try:
        tree = jax.eval_shape(lambda: S.init_state(plan, _slab_ok=False))
    except Exception:                                # noqa: BLE001
        return 1 << 62
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree.leaves(tree))


def _coef_bytes(coefs) -> int:
    tot = 0
    for v in coefs.values():
        a = np.asarray(v) if not hasattr(v, "nbytes") else v
        tot += int(a.nbytes)
    return tot


class _CoefRecorder(dict):
    """Read-through coef dict that records which keys the step touches
    (so only the referenced arrays ride into VMEM)."""

    def __init__(self, base):
        super().__init__()
        self._base = base
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self._base[k]

    def __contains__(self, k):
        return k in self._base

    def get(self, k, default=None):
        if k in self._base:
            self.used.add(k)
            return self._base[k]
        return default


def _used_coef_keys(rplan) -> List[str]:
    """Trace one step abstractly and return the coef keys it reads."""
    from ...stepper.step import make_step, build_xs, init_state
    step = make_step(rplan)
    rec = _CoefRecorder(rplan.coefs)
    xs = build_xs(rplan, 1, 0)
    xs1 = {k: v[0] for k, v in xs.items()}
    state = jax.eval_shape(lambda: init_state(rplan, _slab_ok=False))
    state = jax.tree.map(
        lambda l: jnp.zeros(l.shape, l.dtype), state)
    state["dft"] = {k: jnp.moveaxis(v, (-2, -1), (0, 1))
                    for k, v in state.get("dft", {}).items()}
    jax.eval_shape(lambda s: step(s, xs1, rec), state)
    return sorted(rec.used)


def resident_supported(plan) -> bool:
    """Static envelope: everything the jnp stepper supports except RNG
    (noisy media), the multilevel stack, complex-dtype storage (the pair
    layout is admitted), fp64, 1D grids (Mosaic wants >= 2D arrays), and
    plans whose state overflows the VMEM budget (the precise used-coefs
    accounting happens at kernel build).  Symmetry folds (mirror and
    rot2/rot4) are in: their ghost-plane writes take the where-based
    form under plan.scatter_free (step._curl set_plane0)."""
    if plan.gv.ndim < 2:
        return False
    if plan.dtype == np.float64:
        return False
    if plan.complex_fields and not getattr(plan, "real_pair", False):
        return False
    for p in plan.pol_specs_e + plan.pol_specs_h:
        # noisy media draw jax.random inside the step (no Mosaic
        # lowering for threefry); multilevel's population einsum +
        # transition stack trace to dense ops and ride the kernel
        # (gate: test_resident.test_multilevel_gain)
        if p.kind == "noisy":
            return False
    rp = resident_plan(plan)
    if 2 * _state_bytes(rp) > VMEM_BUDGET:
        return False
    return True


def _xs_spec(v) -> Any:
    """BlockSpec for one xs table: per-step scalars in SMEM, phase-row
    tables in VMEM (read as dynamic row slices)."""
    if v.ndim == 1:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec(memory_space=pltpu.VMEM)


class ResidentKernel:
    """Whole-state-in-VMEM runner for one plan."""

    def __init__(self, plan):
        if not resident_supported(plan):
            raise ValueError("plan outside the resident envelope")
        self.plan = plan
        self.rplan = resident_plan(plan)
        self.coef_keys = _used_coef_keys(self.rplan)
        used = {k: self.rplan.coefs[k] for k in self.coef_keys}
        if 2 * _state_bytes(self.rplan) + _coef_bytes(used) > VMEM_BUDGET:
            raise ValueError("plan state + coefs exceed the VMEM budget")
        # Mosaic wants >= 2-D arrays; pad scalar/vector coefs with
        # leading 1s (broadcast-equivalent against the >= 2-D fields)
        self._C_list = []
        for k in self.coef_keys:
            v = jnp.asarray(used[k])
            if v.ndim < 2:
                v = v.reshape((1,) * (2 - v.ndim) + v.shape)
            self._C_list.append(v)
        self._runners: Dict[Any, Any] = {}

    # -- state <-> leaves ---------------------------------------------------
    def _split_state(self, state):
        """(t, leaves, treedef) with 't' stripped (its increment is
        re-applied on the host; nothing inside the step reads it)."""
        st = {k: v for k, v in state.items() if k != "t"}
        leaves, treedef = jax.tree_util.tree_flatten(st)
        return state.get("t", 0), leaves, treedef

    def _runner(self, nchunk: int, treedef, xs_keys, coef_keys):
        key = (nchunk, tuple(xs_keys), tuple(coef_keys))
        r = self._runners.get(key)
        if r is not None:
            return r
        from ...stepper.step import make_step
        rplan = self.rplan
        step = make_step(rplan)
        n_state = treedef.num_leaves
        n_coef = len(coef_keys)
        n_xs = len(xs_keys)

        def kernel(*refs):
            srefs = refs[:n_state]
            crefs = refs[n_state:n_state + n_coef]
            xrefs = refs[n_state + n_coef:n_state + n_coef + n_xs]
            orefs = refs[n_state + n_coef + n_xs:]
            C = {k: r[...] for k, r in zip(coef_keys, crefs)}

            def body(i, leaves):
                st = jax.tree_util.tree_unflatten(treedef, leaves)
                st = dict(st)
                st["t"] = jnp.int32(0)      # unused inside (xs carries t)
                xt = {}
                for k, r in zip(xs_keys, xrefs):
                    if len(r.shape) == 1:
                        xt[k] = r[i]
                    else:
                        # keep the (1, nfreq) row: broadcast-equivalent
                        # to the (nfreq,) slice the jnp path sees, and
                        # Mosaic prefers >= 2-D values
                        xt[k] = r[pl.ds(i, 1)]
                st = step(st, xt, C)
                del st["t"]
                return tuple(jax.tree_util.tree_leaves(st))

            leaves0 = tuple(r[...] for r in srefs)
            out = jax.lax.fori_loop(0, nchunk, body, leaves0)
            for r, v in zip(orefs, out):
                r[...] = v

        def build(state_leaves, C_list, xs_list):
            out_shape = [jax.ShapeDtypeStruct(l.shape, l.dtype)
                         for l in state_leaves]
            in_specs = (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_coef
                + [_xs_spec(v) for v in xs_list])
            fn = pl.pallas_call(
                kernel,
                in_specs=in_specs,
                out_shape=out_shape,
                input_output_aliases={i: i for i in range(n_state)},
                compiler_params=pltpu.CompilerParams(
                    # whole-grid state lives on the kernel "stack": the
                    # backend's default scoped-vmem limit (16 MB) rejects
                    # any grid past ~300^2 ("Ran out of memory in memory
                    # space vmem while allocating on stack")
                    vmem_limit_bytes=127 * 1024 * 1024),
                interpret=_interpret(),
            )
            return fn(*state_leaves, *C_list, *xs_list)

        r = self._runners[key] = jax.jit(build)
        return r

    def _runner_probed(self, nchunk: int, treedef, xs_keys, coef_keys,
                       pdefs):
        """Probed variant: per-step weighted point samples written to
        SMEM series outputs at the loop index (the analog of stepper
        run()'s scan-emitted probes, monitor.cpp get_field series)."""
        key = ("probed", nchunk, tuple(xs_keys), tuple(coef_keys), pdefs)
        r = self._runners.get(key)
        if r is not None:
            return r
        from ...stepper.step import make_step
        step = make_step(self.rplan)
        n_state = treedef.num_leaves
        n_coef = len(coef_keys)
        n_xs = len(xs_keys)
        n_probe = len(pdefs)
        pair = bool(getattr(self.rplan, "real_pair", False)
                    and self.rplan.complex_fields)

        def kernel(*refs):
            srefs = refs[:n_state]
            crefs = refs[n_state:n_state + n_coef]
            xrefs = refs[n_state + n_coef:n_state + n_coef + n_xs]
            orefs = refs[n_state + n_coef + n_xs:
                         n_state + n_coef + n_xs + n_state]
            prefs = refs[n_state + n_coef + n_xs + n_state:]
            C = {k: r[...] for k, r in zip(coef_keys, crefs)}

            def body(i, leaves):
                st = dict(jax.tree_util.tree_unflatten(treedef, leaves))
                st["t"] = jnp.int32(0)
                xt = {}
                for k, r in zip(xs_keys, xrefs):
                    xt[k] = r[i] if len(r.shape) == 1 else r[pl.ds(i, 1)]
                st = step(st, xt, C)
                for pr, (name, comp, pts, wr, wi) in zip(prefs, pdefs):
                    arr = st["f"][comp]
                    if pair:
                        vr = jnp.float32(0.0)
                        vi = jnp.float32(0.0)
                        for (ij, a, b) in zip(pts, wr, wi):
                            fr = arr[(0,) + ij]
                            fi = arr[(1,) + ij]
                            vr = vr + fr * a - fi * b
                            vi = vi + fr * b + fi * a
                        pr[i, 0] = vr
                        pr[i, 1] = vi
                    else:
                        v = jnp.float32(0.0)
                        for (ij, a) in zip(pts, wr):
                            v = v + arr[ij] * a
                        pr[i] = v
                del st["t"]
                return tuple(jax.tree_util.tree_leaves(st))

            leaves0 = tuple(r[...] for r in srefs)
            out = jax.lax.fori_loop(0, nchunk, body, leaves0)
            for r, v in zip(orefs, out):
                r[...] = v

        def build(state_leaves, C_list, xs_list):
            out_shape = (
                [jax.ShapeDtypeStruct(l.shape, l.dtype)
                 for l in state_leaves]
                + [jax.ShapeDtypeStruct((nchunk, 2) if pair
                                        else (nchunk,), jnp.float32)
                   for _ in range(n_probe)])
            in_specs = (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_coef
                + [_xs_spec(v) for v in xs_list])
            out_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
                         + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                         * n_probe)
            fn = pl.pallas_call(
                kernel,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases={i: i for i in range(n_state)},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024),
                interpret=_interpret(),
            )
            res = fn(*state_leaves, *C_list, *xs_list)
            return res[:n_state], res[n_state:]

        r = self._runners[key] = jax.jit(build)
        return r

    def run_probed(self, state, nsteps: int, t0: int, probes):
        """(state, {name: series}) with per-step probe samples; series
        are (nsteps,) real or (nsteps, 2) pair rows."""
        from ...stepper.step import build_xs
        rplan = self.rplan
        pair = bool(getattr(rplan, "real_pair", False)
                    and rplan.complex_fields)
        pdefs = []
        for p in probes:
            idx = np.asarray(p.indices)
            w = np.asarray(p.weights)
            if not pair and np.iscomplexobj(w) \
                    and np.abs(w.imag).max() > 0:
                raise ValueError("complex probe weights need pair fields")
            pts = tuple(tuple(int(q) for q in row) for row in idx)
            wr = tuple(float(x) for x in np.real(w))
            wi = tuple(float(x) for x in np.imag(w))
            pdefs.append((p.name, p.component, pts, wr, wi))
        pdefs = tuple(pdefs)
        state = dict(state)
        state["dft"] = {k: jnp.moveaxis(v, (-2, -1), (0, 1))
                        for k, v in state.get("dft", {}).items()}
        t, leaves, treedef = self._split_state(state)
        series = {p.name: [] for p in probes}
        done = 0
        while done < nsteps:
            n = min(nsteps - done, MAX_CHUNK)
            xs = build_xs(rplan, n, t0 + done)
            xs_keys = sorted(xs)
            xs_list = [xs[k] for k in xs_keys]
            runner = self._runner_probed(n, treedef, xs_keys,
                                         self.coef_keys, pdefs)
            leaves, ys = runner(leaves, self._C_list, xs_list)
            for p, arr in zip(probes, ys):
                series[p.name].append(arr)
            done += n
        out = dict(jax.tree_util.tree_unflatten(treedef, leaves))
        out["dft"] = {k: jnp.moveaxis(v, (0, 1), (-2, -1))
                      for k, v in out.get("dft", {}).items()}
        out["t"] = t + nsteps
        ys = {k: jnp.concatenate(v) if len(v) > 1 else v[0]
              for k, v in series.items()}
        return out, ys

    # -----------------------------------------------------------------------
    def run(self, state, nsteps: int, t0: int = 0):
        """Advance `state` by nsteps entirely on-chip (chunked pallas
        calls when nsteps > MAX_CHUNK)."""
        from ...stepper.step import build_xs
        rplan = self.rplan
        # frequency-major DFT layout inside the kernel (see _dft_update)
        state = dict(state)
        state["dft"] = {k: jnp.moveaxis(v, (-2, -1), (0, 1))
                        for k, v in state.get("dft", {}).items()}
        t, leaves, treedef = self._split_state(state)
        done = 0
        while done < nsteps:
            n = min(nsteps - done, MAX_CHUNK)
            xs = build_xs(rplan, n, t0 + done)
            xs_keys = sorted(xs)
            C_list = self._C_list
            xs_list = [xs[k] for k in xs_keys]
            runner = self._runner(n, treedef, xs_keys, self.coef_keys)
            leaves = runner(leaves, C_list, xs_list)
            done += n
        out = dict(jax.tree_util.tree_unflatten(treedef, leaves))
        out["dft"] = {k: jnp.moveaxis(v, (0, 1), (-2, -1))
                      for k, v in out.get("dft", {}).items()}
        out["t"] = t + nsteps
        return out


def validate_lowering(plan, nsteps: int = 8) -> int:
    """AOT-lower the resident runner for the TPU backend (no hardware
    needed: jax.export runs the full Pallas->Mosaic lowering pipeline,
    which is where unsupported primitives surface).  Returns the MLIR
    module size; raises on lowering failure.  Used by the test suite to
    prove Mosaic-compilability of every envelope family from the CPU."""
    from ...stepper.step import build_xs, init_state
    from jax import export
    ker = ResidentKernel(plan)
    state = init_state(ker.rplan, _slab_ok=False)
    state = dict(state)
    state["dft"] = {k: jnp.moveaxis(v, (-2, -1), (0, 1))
                    for k, v in state.get("dft", {}).items()}
    _, leaves, treedef = ker._split_state(state)
    xs = build_xs(ker.rplan, nsteps, 0)
    xs_keys = sorted(xs)
    xs_list = [xs[k] for k in xs_keys]
    runner = ker._runner(nsteps, treedef, xs_keys, ker.coef_keys)

    def sds(lst):
        return [jax.ShapeDtypeStruct(np.asarray(v).shape,
                                     np.asarray(v).dtype) for v in lst]

    exp = export.export(runner, platforms=["tpu"])(
        sds(leaves), sds(ker._C_list), sds(xs_list))
    return len(exp.mlir_module())


def resident_probed_run(plan, state, nsteps: int, t0: int, probes
                        ) -> Optional[tuple]:
    """Probe-emitting production entry: (state, {name: series}) through
    the resident kernel, or None outside the envelope (caller falls back
    to fused_probed_run / the jnp scan)."""
    if getattr(plan, "_resident_broken", False):
        return None
    if jax.default_backend() == "cpu" \
            and os.environ.get("MNT_RESIDENT_CPU") != "1":
        return None
    if getattr(plan, "slab_store", False):
        return None
    if not resident_supported(plan):
        return None
    for p in probes:
        if p.component not in state.get("f", {}):
            return None
    try:
        ker = getattr(plan, "_resident_kernel", None)
        if ker is None:
            ker = plan._resident_kernel = ResidentKernel(plan)
        return ker.run_probed(state, nsteps, t0, probes)
    except Exception as e:                       # noqa: BLE001
        import warnings
        plan._resident_broken = True
        warnings.warn(
            "resident probed kernel failed to build "
            f"({type(e).__name__}: {str(e)[:200]}); falling back",
            stacklevel=2)
        return None


def resident_run(plan, state, nsteps: int, t0: int
                 ) -> Optional[Dict[str, Any]]:
    """Production entry: advance the full jnp state by nsteps through the
    resident kernel, or None when the plan is outside the envelope / the
    backend is CPU without the interpret opt-in / the kernel fails to
    build (caller falls back to the hybrid / jnp paths)."""
    if getattr(plan, "_resident_broken", False):
        return None
    if jax.default_backend() == "cpu" \
            and os.environ.get("MNT_RESIDENT_CPU") != "1":
        return None
    if getattr(plan, "slab_store", False):
        return None
    if not resident_supported(plan):
        return None
    if plan.gv.dim == "3d" \
            and 2 * _state_bytes(resident_plan(plan)) \
            > int(os.environ.get("MNT_RESIDENT_PREFER", 32 * 2 ** 20)):
        # medium 3D grids: the HBM-streaming temporally-fused kernels
        # (fdtd3d_t2) are tuned for this regime; keep residency for the
        # small grids where per-step dispatch dominates
        from . import fdtd3d, fdtd3d_t2
        if fdtd3d_t2.supported(plan) or fdtd3d.supported(plan):
            return None
    try:
        ker = getattr(plan, "_resident_kernel", None)
        if ker is None:
            ker = plan._resident_kernel = ResidentKernel(plan)
        return ker.run(state, nsteps, t0)
    except Exception as e:                           # noqa: BLE001
        import warnings
        plan._resident_broken = True
        warnings.warn(
            "resident kernel failed to build for this plan "
            f"({type(e).__name__}: {str(e)[:200]}); falling back",
            stacklevel=2)
        return None
