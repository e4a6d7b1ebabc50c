"""Conductivity folding: rewrite a plan with interior D/B conductivity
as an equivalent cond-free plan, so the fused Mosaic kernels (which
statically reject ``has_cond``) cover lossy media.

The reference integrates conductivity through a dedicated auxiliary
(the ``fcnd`` bookkeeping of step_generic.cpp:58-62; here the
``{c}:cnd``/``{c}:cndinv`` coefs and the ``f_cond`` state family).  But
wherever the conductive sites are clear of the same component's PML
sigma slabs, the auxiliary is redundant: ``f == fcnd`` holds there
inductively (equal increments, and sources mirror into the aux,
step._apply_sources), so the update collapses to the pointwise affine

    f_new = (1 - dt*sig_c/2) * cndinv * f  +  cndinv * dfl

which is exactly the shape of the dsig chain

    f_new = ((kap - sig) * f + dfl) * siginv      (step_generic.cpp:89)

Folding ``kap - sig <- 1 - dt*sig_c/2`` and ``siginv <- cndinv`` at the
conductive sites therefore yields a plan with ``has_cond=False`` that
every stepper path — the jnp full chain, the jnp slab-local chain, and
the fused depth-1 Mosaic kernel — executes exactly.  (The temporally
fused kernels reject folded plans for now: their piecewise dsig-chain
specialization assumes identity outside the PML slabs.)

Exactness conditions (checked below; ``fold_conductivity`` returns None
when any fails, and the caller falls back to the jnp path):

  * every conductive site of comp ``c`` has ``kap==1, sig==0,
    siginv==1`` (clear of c's dsig PML slabs), ``kapu==1, sigu==0,
    siginvu==1`` (clear of its dsigu slabs), and ``mask==1`` (not a
    dead plane) — evaluated directly on the coefficient arrays;
  * no BFAST (step._bfast_update reads the cond coefs separately).

Source bookkeeping: the reference scales injected currents by
``cndinv`` at conductive sites (the ``src{si}:cndinv`` coef); the fold
bakes that scale into the per-site amplitudes (both ``spec.amps``,
which the Mosaic kernels specialize on, and the ``amp_re/amp_im``
coefs the jnp path reads) and drops the runtime key.  Sources at
conductive sites also mirror into ``f_u`` — the inner chain is
value-dependent there — which ``step._apply_sources`` extends to
folded comps via ``CurlSpec.folded_cond``.

After a folded stretch the caller owes the ORIGINAL plan's state one
repair: ``f_cond[c] = f[c]`` (``resync_cond_state``).  This is exact at
conductive sites (where the invariant holds) and immaterial elsewhere
(only the aux's increments enter the chain away from conductivity).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp


def _bc(arr, shape):
    return np.broadcast_to(np.asarray(arr, np.float64), shape)


def fold_conductivity(plan) -> Optional[Any]:
    """Equivalent cond-free plan, or None when the fold is not exact
    for this plan (conductivity overlapping PML slabs / BFAST)."""
    cond_specs = [s for s in plan.curl_specs_d + plan.curl_specs_b
                  if s.has_cond]
    if not cond_specs:
        return None
    if plan.bfast_k is not None:
        return None
    C = plan.coefs
    newC: Dict[str, Any] = dict(C)
    dt = plan.dt
    S = tuple(plan.storage_shape or plan.gv.shape)
    boxes = dict(getattr(plan, "support_boxes", None) or {})

    folded_c = set()
    for s in cond_specs:
        c = s.c
        cnd = np.asarray(C[f"{c}:cnd"], np.float64)
        cndinv = np.asarray(C[f"{c}:cndinv"], np.float64)
        site = _bc(cnd, S) != 0.0
        mk = C.get(f"mask:{c}")
        if mk is not None:
            site = site & (_bc(mk, S) == 1.0)
        # --- exactness: conductive sites clear of the PML chains -------
        if s.dsig_axis is not None:
            pmlish = ((_bc(C[f"{c}:kap"], S) != 1.0)
                      | (_bc(C[f"{c}:sig"], S) != 0.0)
                      | (_bc(C[f"{c}:siginv"], S) != 1.0))
            if np.any(pmlish & site):
                return None
        if s.dsigu_axis is not None:
            pmlish = ((_bc(C[f"{c}:kapu"], S) != 1.0)
                      | (_bc(C[f"{c}:sigu"], S) != 0.0)
                      | (_bc(C[f"{c}:siginvu"], S) != 1.0))
            if np.any(pmlish & site):
                return None
        # --- fold into (or synthesize) the chain1 coefficients ---------
        a = _bc(1.0 - 0.5 * dt * cnd, S)
        b = _bc(cndinv, S)
        cdtype = np.asarray(C[f"{c}:cnd"]).dtype
        if s.dsig_axis is not None:
            kap_f = np.where(site, a, _bc(C[f"{c}:kap"], S))
            sig_f = np.where(site, 0.0, _bc(C[f"{c}:sig"], S))
            sinv_f = np.where(site, b, _bc(C[f"{c}:siginv"], S))
        else:
            kap_f = np.where(site, a, 1.0)
            sig_f = np.zeros(S)
            sinv_f = np.where(site, b, 1.0)
        newC[f"{c}:kap"] = jnp.asarray(kap_f, cdtype)
        newC[f"{c}:sig"] = jnp.asarray(sig_f, cdtype)
        newC[f"{c}:siginv"] = jnp.asarray(sinv_f, cdtype)
        del newC[f"{c}:cnd"]
        del newC[f"{c}:cndinv"]
        # bounding box of the conductive sites, for downstream envelope
        # checks (the temporally-fused kernel's NL next-plane rebuild
        # assumes chain-identity columns — fdtd3d_t2.supported keeps the
        # fold clear of the dispersive window via these)
        nz = np.nonzero(site)
        boxes[f"{c}:condfold"] = tuple(
            (int(ix.min()), int(ix.max()) + 1) for ix in nz)
        folded_c.add(c)

    def fold_spec(s):
        if not s.has_cond:
            return s
        return dataclasses.replace(
            s, has_cond=False, folded_cond=True,
            dsig_axis=s.dsig_axis if s.dsig_axis is not None else 0)

    new_d = [fold_spec(s) for s in plan.curl_specs_d]
    new_b = [fold_spec(s) for s in plan.curl_specs_b]

    # --- bake the source cndinv scaling into the amplitudes -------------
    new_sources = list(plan.sources)
    for si, s in enumerate(plan.sources):
        key = f"src{si}:cndinv"
        if key not in C:
            continue
        scale = np.asarray(C[key], np.float64)
        amps = np.asarray(s.amps) * scale
        new_sources[si] = dataclasses.replace(s, amps=amps)
        newC[f"src{si}:amp_re"] = jnp.asarray(
            np.real(amps), np.asarray(C[f"src{si}:amp_re"]).dtype)
        newC[f"src{si}:amp_im"] = jnp.asarray(
            np.imag(amps), np.asarray(C[f"src{si}:amp_im"]).dtype)
        del newC[key]

    return dataclasses.replace(plan, curl_specs_d=new_d, curl_specs_b=new_b,
                               sources=new_sources, coefs=newC,
                               support_boxes=boxes)


def cond_fold_of(plan) -> Optional[Any]:
    """Cached fold (plans are long-lived; the fold scans full coef
    arrays once).  None when the plan has no conductivity or the fold
    is inexact."""
    cached = getattr(plan, "_cond_fold", None)
    if cached is None:
        fold = fold_conductivity(plan)
        plan._cond_fold = fold if fold is not None else False
        return fold
    return cached or None


def resync_cond_state(plan, state: Dict[str, Any]) -> Dict[str, Any]:
    """Repair the ORIGINAL plan's f_cond family after a stretch executed
    on the folded plan: fcnd == f at conductive sites (the invariant the
    fold rests on), and its value is immaterial elsewhere."""
    cond_c = [s.c for s in plan.curl_specs_d + plan.curl_specs_b
              if s.has_cond]
    if not cond_c:
        return state
    fc = dict(state.get("f_cond", {}))
    for c in cond_c:
        if c in fc and c in state["f"]:
            fc[c] = state["f"][c]
    return {**state, "f_cond": fc}
