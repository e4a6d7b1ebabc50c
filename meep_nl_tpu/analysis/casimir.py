"""Casimir forces by the time-domain stress-tensor method (reference
src/casimir.cpp:1-325 + scheme/casimir.scm; the method of Rodriguez /
McCauley et al., "Casimir forces in the time domain").

The zero-temperature Casimir force on a body is

    F_i = \\oint_S dS_j \\int_0^inf dt  g(t) Gamma_ij(x, x; t)

where Gamma_ij is the causal field response measured by ordinary FDTD
pulse runs -- one run per (surface point, field component): inject a
delta-function current at x, record the same component at x -- and g(t)
is a geometry-independent kernel.

Kernel derivation (c = hbar = 1).  The vacuum correlation is
<F_c^2>(w) = (1/pi) Im[w^2 G(x,x;w)] with G the Green function of
(curl curl - w^2 eps).  An FDTD current pulse J measures
Gamma_hat(w) = i w G, so the force integrand is Im[-i w Gamma_hat(w)]
and

    g(t) = (1/pi) Im[-i int_0^inf dw  w e^{i w t}] = 1/(pi t^2).

The 1/t^2 tail converges slowly, so (as in the reference) the runs can
instead be performed in a globally dissipative medium with D conductivity
sigma (eps_eff(xi) = 1 + i sigma/xi; mu untouched -- this choice keeps
w(0) = 0 so the frequency contour w(xi) = xi sqrt(1 + i sigma/xi) starts
at the origin and no boundary term appears).  In that medium the E and H
pulse responses analytically continue the vacuum Green function with
DIFFERENT source factors ((curlcurl - w^2)E = i xi J but
(curlcurl - w^2)H = i(xi + i sigma) K), so the kernel differs per field
type; rotating xi onto the imaginary axis (xi = i u) gives the real,
exponentially convergent quadratures

    g_E(t) = (1/pi) int_0^inf du e^{-u t} (u + sigma/2) sqrt((u+sigma)/u)
    g_H(t) = (1/pi) int_0^inf du e^{-u t} (u + sigma/2) sqrt(u/(u+sigma))

both reducing to 1/(pi t^2) at sigma = 0.  The t -> 0 divergence is the
geometry-independent bulk vacuum pressure: it cancels exactly between the
two sides of each surface.

Validation (test_casimir.py, 1D parallel plates vs exact -pi/(24 a^2)):
sigma = 0 converges to 3% (res 20, mirror eps 1e6) with the correct
1/a^2 scaling.  The sigma > 0 acceleration currently carries an O(sigma)
bias (ratio 0.90 at sigma=0.25, 0.84 at sigma=0.5): the continuum kernels
above ignore the discrete Yee dispersion, which the reference corrects by
building g from the discrete-time transform (casimir.cpp make_casimir_g);
planned refinement.  Use sigma = 0 for quantitative results.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np


def casimir_g(tvec: np.ndarray, sigma: float = 0.0, ft: str = "e",
              n_quad: int = 3000) -> np.ndarray:
    """The Casimir time kernel g(t) (t > 0) for runs in a medium with
    global D conductivity `sigma` (0 = vacuum runs); `ft` = 'e' or 'h'
    selects the field-type kernel (see module docstring)."""
    t = np.asarray(tvec, np.float64)
    out = np.zeros_like(t)
    m = t > 0
    if sigma == 0.0:
        out[m] = 1.0 / (np.pi * t[m] ** 2)
        return out
    tmin = float(t[m].min())
    u_max = 60.0 / tmin
    # u = v^2 regularizes the u^{-1/2} endpoint of the E kernel
    v, wq = np.polynomial.legendre.leggauss(n_quad)
    vmax = np.sqrt(u_max)
    v = 0.5 * (v + 1.0) * vmax
    wq = wq * 0.5 * vmax
    u = v * v
    du = 2.0 * v * wq
    if ft == "e":
        pref = (u + sigma / 2.0) * np.sqrt((u + sigma) / u)
    else:
        pref = (u + sigma / 2.0) * np.sqrt(u / (u + sigma))
    out[m] = (pref * du) @ np.exp(-np.outer(u, t[m])) / np.pi
    return out


def _stress_weight(comp: str, force_dir: str, normal_dir: str,
                   eps: float = 1.0) -> float:
    """Stress-tensor weight of <F_c^2> in T_{force,normal}
    (stress.cpp convention: T_ij = eps(E_i E_j - delta_ij E^2/2) + (E->H)).

    Same-point diagonal correlations only: component c along the force
    direction contributes +eps/2, transverse components -eps/2."""
    if force_dir != normal_dir:
        raise NotImplementedError("off-diagonal stress terms need "
                                  "two-point correlations (round 2+)")
    return 0.5 * eps if comp[1] == force_dir else -0.5 * eps


def correlation_run(sim_factory: Callable, comp: str, pt, T: float,
                    sigma: float = 0.0) -> Tuple[np.ndarray, float]:
    """One pulse run: inject a delta current of `comp` at `pt`, record the
    same component there every step (in-scan FieldProbe, no host sync).
    Returns (Gamma(t), dt) with t = (n+1) dt."""
    import meep_nl_tpu as mp
    from ..models.run_control import FieldProbe

    sim = sim_factory()
    # NOTE: when sigma > 0 the caller's sim_factory must set the global
    # dissipation itself (D_conductivity = sigma on default_material AND
    # every geometry material; B_conductivity stays 0); sigma here is
    # only documentation of the kernel pairing.
    dt = sim.dt
    src_time = mp.CustomSource(
        func=lambda t, dt=dt: (1.0 / dt) if t < dt else 0.0,
        end_time=2 * dt)
    sim.sources = list(sim.sources) + [
        mp.Source(src_time, component=comp, center=pt)]
    probe = FieldProbe(comp, pt)
    sim.run(probe, until=T)
    return np.real(np.asarray(probe.data, np.complex128)), dt


def casimir_force_1d(sim_factory: Callable, z_surfaces: Sequence[float],
                     normals: Sequence[int], sigma: float = 0.0,
                     T: float = 60.0,
                     components=("ex", "hy")) -> float:
    """Casimir force (per unit area) along z on a body in a 1D simulation.

    `sim_factory()` must return a fresh source-free Simulation of the
    geometry; `z_surfaces`/`normals` give the enclosing surface points and
    their outward normals (+1/-1).  One pulse run per (point, component);
    F = sum_s n_s sum_c w_c int dt g(t) Gamma_c(z_s, t).
    (casimir.cpp casimir_stress_dct_integral specialized to 1D, where the
    transverse harmonic expansion collapses to the single k=0 term.)

    Validated against the exact 1D parallel-plate result
    F = -pi/(24 a^2): 1.8% at mirror eps 1e6, res 40 (test_casimir.py)."""
    import meep_nl_tpu as mp

    total = 0.0
    for zs, nrm in zip(z_surfaces, normals):
        for comp in components:
            gam, dt = correlation_run(
                sim_factory, comp, mp.Vector3(0, 0, zs), T, sigma)
            ts = (np.arange(len(gam)) + 1) * dt
            g = casimir_g(ts, sigma, ft=comp[0])
            w = _stress_weight(comp, "z", "z")
            total += nrm * w * float(np.sum(g * gam) * dt)
    return total
