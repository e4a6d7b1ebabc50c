"""Fused Pallas half-step kernels for the hot path.

Fuses, for each half-step (B then H, D then E), the curl update, the
PML sigma/sigma_u chains, the E(H)-from-D(B) transform, and the W chain into
ONE kernel, eliminating the intermediate materializations and the mask-array
reads of the jnp path:

  * tiles along x; y/z stay whole inside the block, so their stencil shifts
    are in-register slices;
  * x-derivative neighbors come from a second, shifted BlockSpec of the same
    input (clamped at the grid edge: the affected columns are provably
    masked points, see _dead_planes);
  * boundary masks are applied with broadcasted-iota compares instead of
    mask arrays (zero HBM cost).

Supported plan shape (the benchmark + common production case): 3D cartesian,
real fields, diagonal (or vacuum) materials, uPML, no conductivity /
dispersion / nonlinearity / BFAST.  Everything else falls back to the
uniform jnp path.  (The reference's analogous specialization is the 8-way
case split of step_generic.cpp:82.)
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import grid as G


def pallas_supported(plan) -> bool:
    if getattr(plan, 'rot2', None) is not None or getattr(plan, 'rot4', None) is not None:
        return False
    if getattr(plan, 'mirror_node', ()):
        return False
    if plan.gv.dim != "3d" or plan.complex_fields or plan.bfast_k is not None:
        return False
    if plan.pol_specs_e or plan.pol_specs_h:
        return False
    if plan.have_fmp_e or plan.have_fmp_h:
        return False
    for s in plan.curl_specs_d + plan.curl_specs_b:
        if s.has_cond:
            return False
    for s in plan.eh_specs_e + plan.eh_specs_h:
        if s.has_u1 or s.has_u2 or s.has_chi3 or s.has_nr:
            return False
    if any(plan.periodic):
        return False
    for c, planes in (plan.mask_planes or {}).items():
        if planes is None:
            return False
    return True


def _plane_lists(plan, c) -> Tuple[List[int], List[int], List[int]]:
    """dead plane indices per axis for component (few per axis, so the
    kernel masks them with iota compares instead of mask arrays)."""
    planes: Tuple[List[int], List[int], List[int]] = ([], [], [])
    for ax, i in plan.mask_planes.get(c, []):
        planes[ax].append(int(i))
    return planes


def build_half_step(plan, ft2: str, tx: int = 8):
    """Compile the fused kernel for one half-step ('b' or 'd').

    Returns f(state_f, state_fu, state_fw, coefs) -> (f, fu, fw) dicts."""
    gv = plan.gv
    S = plan.storage_shape
    nx = S[0]
    while nx % tx:
        tx //= 2
    tx = max(tx, 1)
    # fit in scoped VMEM (~16MB): every non-vector input and every output
    # is a (tx, S1, S2) block, double-buffered across grid steps
    itemsize = np.dtype(plan.dtype).itemsize
    plane_bytes = S[1] * S[2] * itemsize
    n_bufs = 2 * (17 + 12)   # upper bound on blocks in flight
    # default scoped-VMEM limit is 16MB; raise together with
    # XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib for larger tiles
    budget = int(os.environ.get("MNT_PALLAS_VMEM_KIB", 12 * 1024)) * 1024
    while tx > 1 and n_bufs * tx * plane_bytes > budget:
        tx //= 2
    while nx % tx:
        tx //= 2
    tx = max(tx, 1)
    ntiles = nx // tx
    is_d = ft2 == "d"
    curls = plan.curl_specs_d if is_d else plan.curl_specs_b
    ehs = plan.eh_specs_e if is_d else plan.eh_specs_h
    gcomps = ["hx", "hy", "hz"] if is_d else ["ex", "ey", "ez"]
    C = plan.coefs
    dtdx = plan.courant

    # which g components need an x-shifted copy (x-derivative terms)
    need_shift = set()
    for s in curls:
        if s.plus_axis == 0 and s.g_plus:
            need_shift.add(s.g_plus)
        if s.minus_axis == 0 and s.g_minus:
            need_shift.add(s.g_minus)

    # ---- assemble the ordered input list --------------------------------
    # [g main x3] [g shifted xK] [f x3] [fu xN] [e x3] [fw xM] [vectors...]
    in_names: List[Tuple[str, str]] = []   # (kind, key)
    for g in gcomps:
        in_names.append(("main", g))
    for g in sorted(need_shift):
        in_names.append(("shift", g))
    fu_comps = [s.c for s in curls if s.dsigu_axis is not None]
    fw_comps = [s.ec for s in ehs if s.dsigw_axis is not None]
    for s in curls:
        in_names.append(("main", s.c))
    for c in fu_comps:
        in_names.append(("fu", c))
    for s in ehs:
        in_names.append(("main_e", s.ec))
    for c in fw_comps:
        in_names.append(("fw", c))
    # coefficient vectors, tiled if x-aligned
    vec_keys = []
    for s in curls:
        c = s.c
        if s.dsig_axis is not None:
            for nm in ("sig", "kap", "siginv"):
                vec_keys.append(f"{c}:{nm}")
        if s.dsigu_axis is not None:
            for nm in ("sigu", "kapu", "siginvu"):
                vec_keys.append(f"{c}:{nm}")
    for s in ehs:
        if s.has_u:
            vec_keys.append(f"{s.ec}:u")
        if s.dsigw_axis is not None:
            vec_keys.append(f"{s.ec}:sigw")
            vec_keys.append(f"{s.ec}:kapw")
    for k in vec_keys:
        in_names.append(("vec", k))

    shift_sign = -1 if is_d else +1

    def in_spec(kind, key):
        if kind in ("main", "fu", "main_e", "fw", "shift"):
            # 'shift' inputs are x-shifted copies materialized by the
            # caller (a +-1-element block offset is inexpressible in
            # BlockSpec), read as ordinary tiles
            return pl.BlockSpec((tx, S[1], S[2]), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        # coefficient arrays: tile the x dim when it spans the grid
        # (PML vectors are broadcastable (N,1,1)/(1,N,1)/(1,1,N); u can be
        # full-3D for inhomogeneous media)
        arr = C[key]
        if arr.shape[0] == S[0]:
            return pl.BlockSpec((tx,) + tuple(arr.shape[1:]),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(arr.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_comps = ([s.c for s in curls] + fu_comps
                 + [s.ec for s in ehs] + fw_comps)

    # precompute per-component mask data
    mask_info = {}
    for c in set([s.c for s in curls] + [s.ec for s in ehs]):
        mask_info[c] = _plane_lists(plan, c)

    def kernel(*refs):
        ins = refs[: len(in_names)]
        outs = refs[len(in_names):]
        byname: Dict[Tuple[str, str], Any] = {}
        for (kind, key), r in zip(in_names, ins):
            byname[(kind, key)] = r
        i = pl.program_id(0)

        def blk(kind, key):
            return byname[(kind, key)][...]

        def shift_yz(a, axis, by):
            # in-block shift with zero fill (axis 1 or 2)
            if by == 0:
                return a
            pad = [(0, 0)] * 3
            slc = [slice(None)] * 3
            if by > 0:
                pad[axis] = (0, by)
                slc[axis] = slice(by, None)
            else:
                pad[axis] = (-by, 0)
                slc[axis] = slice(None, by)
            return jnp.pad(a[tuple(slc)], pad)

        def diff(kind_main, g, axis):
            a = blk(kind_main, g)
            if axis == 0:
                b = blk("shift", g)
                return (a - b) if is_d else (b - a)
            if is_d:
                return a - shift_yz(a, axis, -1)
            return shift_yz(a, axis, +1) - a

        def apply_mask(c, val):
            xplanes, yplanes, zplanes = mask_info[c]
            if xplanes:
                xg = i * tx + jax.lax.broadcasted_iota(jnp.int32,
                                                       (tx, 1, 1), 0)
                alive = jnp.ones((tx, 1, 1), jnp.bool_)
                for p in xplanes:
                    alive = alive & (xg != p)
                val = jnp.where(alive, val, 0.0)
            if yplanes:
                yg = jax.lax.broadcasted_iota(jnp.int32, (1, S[1], 1), 1)
                alive = jnp.ones((1, S[1], 1), jnp.bool_)
                for p in yplanes:
                    alive = alive & (yg != p)
                val = jnp.where(alive, val, 0.0)
            if zplanes:
                zg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S[2]), 2)
                alive = jnp.ones((1, 1, S[2]), jnp.bool_)
                for p in zplanes:
                    alive = alive & (zg != p)
                val = jnp.where(alive, val, 0.0)
            return val

        results: Dict[str, Any] = {}
        sgn = 1.0 if is_d else -1.0
        for s in curls:
            c = s.c
            total = None
            if s.g_plus is not None:
                total = diff("main", s.g_plus, s.plus_axis)
            if s.g_minus is not None:
                t2 = diff("main", s.g_minus, s.minus_axis)
                total = -t2 if total is None else total - t2
            dfl = sgn * dtdx * total
            fold = blk("main", c)

            def vec(nm):
                v = byname[("vec", f"{c}:{nm}")][...]
                return v

            if s.dsig_axis is not None:
                inner = lambda g: ((vec("kap") - vec("sig")) * g + dfl) \
                    * vec("siginv")
            else:
                inner = lambda g: g + dfl
            if s.dsigu_axis is not None:
                fu_old = blk("fu", c)
                fu_new = inner(fu_old)
                fnew = vec("siginvu") * ((vec("kapu") - vec("sigu")) * fold
                                         + fu_new - fu_old)
                results[("fu", c)] = fu_new
            else:
                fnew = inner(fold)
            results[("f", c)] = apply_mask(c, fnew)

        for s in ehs:
            ec = s.ec
            dnew = results[("f", s.dc)]
            if s.has_u:
                u = byname[("vec", f"{ec}:u")][...]
                lin = dnew * u
            else:
                lin = dnew
            if s.dsigw_axis is not None:
                kapw = byname[("vec", f"{ec}:kapw")][...]
                sigw = byname[("vec", f"{ec}:sigw")][...]
                fw_old = blk("fw", ec)
                enew = blk("main_e", ec) + (kapw + sigw) * lin \
                    - (kapw - sigw) * fw_old
                results[("fw", ec)] = lin
            else:
                enew = lin
            results[("f", ec)] = apply_mask(ec, enew)

        # write outputs in their declared order: curl-f, fu, eh-f, fw
        k = 0
        for s in curls:
            outs[k][...] = results[("f", s.c)]
            k += 1
        for c in fu_comps:
            outs[k][...] = results[("fu", c)]
            k += 1
        for s in ehs:
            outs[k][...] = results[("f", s.ec)]
            k += 1
        for c in fw_comps:
            outs[k][...] = results[("fw", c)]
            k += 1

    out_shapes = [jax.ShapeDtypeStruct(S, plan.dtype) for _ in out_comps]
    out_specs = [pl.BlockSpec((tx, S[1], S[2]), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) for _ in out_comps]
    in_specs = [in_spec(kind, key) for kind, key in in_names]

    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=max(2 * n_bufs * tx * plane_bytes,
                                 32 * 2 ** 20)),
        interpret=bool(int(os.environ.get("MNT_PALLAS_INTERPRET", "0"))),
    )

    def make_shifted(arr):
        """x-shifted copy: out[i] = arr[i +- 1], zero fill (materialized on
        device; one extra traversal per shifted component)."""
        if is_d:
            return jnp.pad(arr[:-1], ((1, 0), (0, 0), (0, 0)))
        return jnp.pad(arr[1:], ((0, 1), (0, 0), (0, 0)))

    def run_half(f: Dict[str, Any], fu: Dict[str, Any], fw: Dict[str, Any],
                 coefs: Dict[str, Any]):
        args = []
        for kind, key in in_names:
            if kind == "main":
                args.append(f[key])
            elif kind == "shift":
                args.append(make_shifted(f[key]))
            elif kind == "fu":
                args.append(fu[key])
            elif kind == "main_e":
                args.append(f[key])
            elif kind == "fw":
                args.append(fw[key])
            else:
                args.append(coefs[key])
        outs = call(*args)
        f2, fu2, fw2 = dict(f), dict(fu), dict(fw)
        k = 0
        for s in curls:
            f2[s.c] = outs[k]
            k += 1
        for c in fu_comps:
            fu2[c] = outs[k]
            k += 1
        for s in ehs:
            f2[s.ec] = outs[k]
            k += 1
        for c in fw_comps:
            fw2[c] = outs[k]
            k += 1
        return f2, fu2, fw2

    return run_half


def build_source_fixup(plan, ft2: str):
    """Post-half current-source injection for the fused path.

    The jnp step injects currents into D/B BETWEEN the curl and the eh
    transform (step.cpp:296-319); the fused kernel does curl+eh in one shot,
    so the source contribution is scattered in afterwards and propagated
    through the (linear) eh transform at the handful of source points:
    dD = -J*dt;  dlin = u*dD;  fw += dlin;  E += (kapw+sigw)*dlin [masked].
    Returns fixup(f, fw, coefs, xs) -> (f, fw)."""
    is_d = ft2 == "d"
    ehs = plan.eh_specs_e if is_d else plan.eh_specs_h
    eh_by_dc = {s.dc: s for s in ehs}
    dt = plan.dt

    jobs = []
    for si, s in enumerate(plan.sources):
        ftc = "d" if s.component[0] == "e" else "b"
        if ftc != ft2 or s.is_integrated:
            continue
        dc = ft2 + s.component[1]
        if dc not in eh_by_dc:
            continue
        spec = eh_by_dc[dc]
        # host-side liveness of the source points (dead planes kill the E
        # contribution but not the stored D, matching the jnp ordering)
        idx_np = np.asarray(s.indices)
        alive = np.ones(len(idx_np), np.float32)
        for ax, p in plan.mask_planes.get(spec.ec, []):
            alive *= (idx_np[:, ax] != p).astype(np.float32)
        jobs.append((si, spec, alive))

    if not jobs:
        return None

    def gather(A, idx):
        ii = tuple(jnp.minimum(idx[:, k], A.shape[k] - 1) for k in range(3))
        return A[ii]

    def fixup(f, fw, C, xs):
        f = dict(f)
        fw = dict(fw)
        for si, spec, alive in jobs:
            dc, ec = spec.dc, spec.ec
            key = f"src{si}:cur_re"
            if key not in xs:
                continue
            w_re, w_im = xs[key], xs[f"src{si}:cur_im"]
            a_re, a_im = C[f"src{si}:amp_re"], C[f"src{si}:amp_im"]
            dD = -(w_re * a_re - w_im * a_im) * dt
            if f"src{si}:cndinv" in C:
                dD = dD * C[f"src{si}:cndinv"]
            idx = C[f"src{si}:idx"]
            pts = tuple(idx.T)
            f[dc] = f[dc].at[pts].add(dD)
            dlin = dD * gather(C[f"{ec}:u"], idx) if spec.has_u else dD
            am = jnp.asarray(alive, f[ec].dtype)
            if spec.dsigw_axis is not None:
                kw = gather(C[f"{ec}:kapw"], idx)
                sw = gather(C[f"{ec}:sigw"], idx)
                fw[ec] = fw[ec].at[pts].add(dlin)
                f[ec] = f[ec].at[pts].add((kw + sw) * dlin * am)
            else:
                f[ec] = f[ec].at[pts].add(dlin * am)
        return f, fw

    return fixup
