"""Differentiable objective quantities (the ObjectiveQuantity family of
python/adjoint/objective.py: EigenmodeCoefficient 157, FourierFields 308).

Each factory precomputes the static data (mode profiles, un-weighting
maps) on the host and returns a pure-jnp function of the DTFT accumulator
dict, so it can sit inside OptimizationProblem's objective and be
differentiated by jax.grad through the time loop."""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import numpy as np
import jax.numpy as jnp

from ..stepper.step import dft_view as _dv


def fourier_fields(sim, dft_handle, component: str) -> Callable:
    """FourierFields (objective.py:308): the raw DTFT array of one
    monitor component; returns f(dfts) -> complex array."""
    name = dft_handle.name if hasattr(dft_handle, "name") else dft_handle
    key = f"{name}:{component}"

    def fn(dfts: Dict[str, Any]):
        return _dv(dfts[key])

    return fn


def eigenmode_coefficient(sim, flux_handle, band: int = 1,
                          forward: bool = True) -> Callable:
    """EigenmodeCoefficient (objective.py:157): the complex mode
    amplitude a+/- per frequency on a flux monitor, as a differentiable
    function of the DTFT dict.  2D TM implementation (the standard
    inverse-design setting); the mode solve and un-weighting maps are
    host-precomputed, only the overlap is traced."""
    from ..analysis.modes import solve_tm_modes
    from ..models import scene as _scene

    sim.init_sim()
    if sim.gv.dim == "3d":
        return _eigenmode_coefficient_3d(sim, flux_handle, band, forward)
    if sim.gv.dim != "2d":
        raise NotImplementedError("eigenmode_coefficient objective: 2D/3D")
    plan = sim._plan
    name = flux_handle.name
    freqs = np.asarray(flux_handle.freqs)
    key_e = f"{name}:0:e1"
    key_h = f"{name}:0:h1"
    spec_e = next(s for s in plan.dfts if s.name == key_e)
    wgt = spec_e.weights
    scale = spec_e.scale
    reg = spec_e.region
    extents = [b - a for a, b in reg]
    tang_ax = int(np.argmax(extents))
    norm_pos = 1 - tang_ax
    w_t_dv = wgt.sum(axis=norm_pos)
    w_n = wgt.sum(axis=tang_ax)
    w_n = w_n / max(w_n.sum(), 1e-300)

    # epsilon line and modes per frequency (host)
    ys = (np.arange(reg[tang_ax][0], reg[tang_ax][1]) + 0.5) * sim.gv.dx \
        + sim.gv.origin[tang_ax]
    xpos = (reg[norm_pos][0] + 0.5) * sim.gv.dx + sim.gv.origin[norm_pos]
    pts = np.zeros((len(ys), 3))
    pts[:, tang_ax] = ys
    pts[:, norm_pos] = xpos
    idxm = _scene._material_at(pts, sim.geometry, sim.default_material)
    eps_line = _scene._eps_of(idxm, sim.geometry, sim.default_material, 2)

    em = np.zeros((len(freqs), len(ys)))
    hm = np.zeros((len(freqs), len(ys)))
    for fi, f in enumerate(freqs):
        modes = solve_tm_modes(eps_line, sim.gv.dx, float(f),
                               num_modes=band)
        if len(modes) < band:
            raise ValueError(f"only {len(modes)} guided modes at f={f}")
        m = modes[band - 1]
        em[fi] = m.ez
        hm[fi] = -(m.beta / (2 * np.pi * f)) * m.ez

    dx = sim.gv.dx
    sgn = 1.0 if forward else -1.0
    em_j = jnp.asarray(em)
    hm_j = jnp.asarray(hm)
    w_t_j = jnp.asarray(np.where(w_t_dv == 0, 1.0, w_t_dv))
    w_t_mask = jnp.asarray((w_t_dv != 0).astype(float))
    w_n_j = jnp.asarray(w_n)

    def fn(dfts: Dict[str, Any]):
        dE = _dv(dfts[key_e])     # (n_t, n_n, nf) or (n_n, n_t, nf)
        dH = _dv(dfts[key_h])
        dE_p = jnp.sum(dE, axis=norm_pos) / scale
        ez = (dE_p / w_t_j[:, None]) * w_t_mask[:, None]
        hy = jnp.tensordot(w_n_j, jnp.moveaxis(dH, norm_pos, 0), axes=1)
        # overlaps per frequency: a+/- = (<em,hy> +/- <hm,ez>)/2
        c1 = jnp.sum(jnp.conj(em_j).T * hy, axis=0) * dx
        c2 = jnp.sum(jnp.conj(hm_j).T * ez, axis=0) * dx
        return 0.5 * (c1 + sgn * c2)

    return fn


def _eigenmode_coefficient_3d(sim, flux_handle, band: int,
                              forward: bool) -> Callable:
    """Differentiable 3D eigenmode coefficient: the full-vector mode solve
    (analysis.modes.solve_vector_modes, the libMPB replacement) runs once
    on the host; the DTFT un-weighting and the cross-product overlap
    (mpb.cpp:925 get_eigenmode_coefficients) are traced in jnp so jax.grad
    flows through the time loop into the design variables
    (objective.py:157 EigenmodeCoefficient parity, 3D)."""
    from ..analysis.modes import solve_vector_modes

    plan = sim._plan
    name = flux_handle.name
    freqs = np.asarray(flux_handle.freqs)
    spec_e0 = next(s for s in plan.dfts if s.name == f"{name}:0:e0")
    reg = spec_e0.region
    extents = [b - a for a, b in reg]
    n_ax = int(np.argmin(extents))
    u_ax, v_ax = (n_ax + 1) % 3, (n_ax + 2) % 3
    rem = [a for a in range(3) if a != n_ax]
    swap_uv = rem[0] != u_ax

    # static per-pair un-weighting data
    pair_meta = {}
    for i in (0, 1):
        spec = next(s for s in plan.dfts if s.name == f"{name}:0:e{i}")
        wgt = spec.weights
        w_t = wgt.sum(axis=n_ax)
        w_n = wgt.sum(axis=tuple(a for a in range(3) if a != n_ax))
        w_n = w_n / max(np.abs(w_n.sum()), 1e-300)
        pair_meta[i] = (jnp.asarray(np.where(w_t == 0, 1.0, w_t)),
                        jnp.asarray((w_t != 0).astype(float)),
                        jnp.asarray(w_n), spec.scale)

    # host mode solve per frequency
    sel_u = np.arange(reg[u_ax][0], reg[u_ax][1])
    sel_v = np.arange(reg[v_ax][0], reg[v_ax][1])
    c_ax = [0.0, 0.0, 0.0]
    c_ax[n_ax] = (reg[n_ax][0] + 0.5) * sim.gv.dx + sim.gv.origin[n_ax]
    eps_u, eps_v, eps_n = sim._plane_eps(n_ax, u_ax, v_ax, c_ax,
                                         None, None, sel_u, sel_v)
    eu = []
    ev = []
    hu = []
    hv = []
    for f in freqs:
        modes = solve_vector_modes(eps_u, eps_v, eps_n, sim.gv.dx,
                                   float(f), num_modes=band)
        if len(modes) < band:
            raise ValueError(f"only {len(modes)} guided modes at f={f}")
        m = modes[band - 1]
        eu.append(m.eu)
        ev.append(m.ev)
        hu.append(m.hu)
        hv.append(m.hv)
    eu = jnp.asarray(np.stack(eu, axis=-1))   # (nu, nv, nf)
    ev = jnp.asarray(np.stack(ev, axis=-1))
    hu = jnp.asarray(np.stack(hu, axis=-1))
    hv = jnp.asarray(np.stack(hv, axis=-1))
    dA = sim.gv.dx ** 2
    sgn = 1.0 if forward else -1.0

    def plane(dE, dH, meta):
        w_t, w_mask, w_n, scale = meta
        dE_p = jnp.sum(dE, axis=n_ax) / scale
        E = (dE_p / w_t[..., None]) * w_mask[..., None]
        H = jnp.tensordot(w_n, jnp.moveaxis(dH, n_ax, 0), axes=1)
        if swap_uv:
            E = jnp.swapaxes(E, 0, 1)
            H = jnp.swapaxes(H, 0, 1)
        return E, H

    def fn(dfts: Dict[str, Any]):
        E_u, H_v = plane(_dv(dfts[f"{name}:0:e0"]), _dv(dfts[f"{name}:0:h0"]),
                         pair_meta[0])
        E_v, H_u = plane(_dv(dfts[f"{name}:0:e1"]), _dv(dfts[f"{name}:0:h1"]),
                         pair_meta[1])
        c1 = jnp.sum(jnp.conj(eu) * H_v - jnp.conj(ev) * H_u,
                     axis=(0, 1)) * dA
        c2 = jnp.sum(E_u * jnp.conj(hv) - E_v * jnp.conj(hu),
                     axis=(0, 1)) * dA
        return 0.5 * (c1 + sgn * c2)

    return fn


def near2far_fields(sim, n2f_handle, far_pts) -> Callable:
    """Near2FarFields (objective.py:435): far fields at a list of points,
    as a differentiable function of the DTFT dict.

    The far field is a LINEAR map of the DTFT near-surface fields with
    design-independent Green's-function weights (farfield_lowlevel,
    near2far.cpp:340), so the weights — including the scipy Hankel
    functions in 2D — are precomputed on the host and the traced
    computation is a single complex contraction per surface.  This is the
    native-differentiation analog of the reference building adjoint
    sources from `near_sourcedata` (near2far.cpp:186, objective.py:497).

    Returns fn(dfts) -> (n_far_pts, 6, nfreq) complex far fields
    (Ex,Ey,Ez,Hx,Hy,Hz)."""
    from ..analysis.near2far import green2d_w, green3d_w
    from ..models.simulation import _vec_to_axes

    sim.init_sim()
    dim = sim.gv.dim
    if dim not in ("2d", "3d"):
        raise NotImplementedError("near2far_fields objective: 2D/3D only")
    gw = green2d_w if dim == "2d" else green3d_w
    freqs = np.asarray(n2f_handle.freqs)
    pts = [np.asarray(_vec_to_axes(sim.gv, p), np.float64) for p in far_pts]

    # host precompute: per surface, W (n_far, 6, nfreq, npts_surf)
    weights = []
    for surf in n2f_handle.surfaces:
        W = np.stack([
            np.stack([gw(x, f, 1.0, 1.0, surf.coords, surf.c0)
                      for f in freqs], axis=1)      # (6, nfreq, npts)
            for x in pts])                          # (n_far, 6, nfreq, npts)
        weights.append((surf.dft_name, jnp.asarray(W)))

    nfreq = len(freqs)

    def fn(dfts: Dict[str, Any]):
        EH = 0.0
        for name, W in weights:
            f0 = _dv(dfts[name]).reshape(-1, nfreq)  # (npts, nfreq)
            EH = EH + jnp.einsum("pcfs,sf->pcf", W, f0.astype(W.dtype))
        return EH

    return fn


def ldos_objective(sim, ldos_handle=None) -> Callable:
    """LDOS (objective.py:545): differentiable LDOS spectrum from the
    work-done DTFT accumulators registered by add_ldos."""
    sim.init_sim()
    plan = sim._plan
    prefix = getattr(sim, "_ldos_name", "ldos")
    keys = [m.name for m in plan.dfts if m.name.startswith(f"{prefix}:")]
    if not keys:
        raise ValueError("no LDOS monitors: call add_ldos first")
    specs = {m.name: m for m in plan.dfts if m.name in keys}

    def fn(dfts: Dict[str, Any]):
        total = 0.0
        for k in keys:
            d = _dv(dfts[k])
            total = total + jnp.sum(jnp.real(d.reshape(-1, d.shape[-1])),
                                    axis=0)
        return total

    return fn
