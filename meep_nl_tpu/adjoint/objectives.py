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


def fourier_fields(sim, dft_handle, component: str) -> Callable:
    """FourierFields (objective.py:308): the raw DTFT array of one
    monitor component; returns f(dfts) -> complex array."""
    name = dft_handle.name if hasattr(dft_handle, "name") else dft_handle
    key = f"{name}:{component}"

    def fn(dfts: Dict[str, Any]):
        return dfts[key]

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
    if sim.gv.dim != "2d":
        raise NotImplementedError("eigenmode_coefficient objective: 2D TM")
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
        dE = dfts[key_e]          # (n_t, n_n, nf) or (n_n, n_t, nf)
        dH = dfts[key_h]
        dE_p = jnp.sum(dE, axis=norm_pos) / scale
        ez = (dE_p / w_t_j[:, None]) * w_t_mask[:, None]
        hy = jnp.tensordot(w_n_j, jnp.moveaxis(dH, norm_pos, 0), axes=1)
        # overlaps per frequency: a+/- = (<em,hy> +/- <hm,ez>)/2
        c1 = jnp.sum(jnp.conj(em_j).T * hy, axis=0) * dx
        c2 = jnp.sum(jnp.conj(hm_j).T * ez, axis=0) * dx
        return 0.5 * (c1 + sgn * c2)

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
            d = dfts[k]
            total = total + jnp.sum(jnp.real(d.reshape(-1, d.shape[-1])),
                                    axis=0)
        return total

    return fn
