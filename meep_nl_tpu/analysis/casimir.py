"""Casimir forces by the time-domain stress-tensor method (reference
src/casimir.cpp:1-325 + scheme/casimir.scm; the method of Rodriguez /
McCauley et al., "Casimir forces in the time domain").

The zero-temperature Casimir force on a body is

    F_i = \\oint_S dS_j \\int_0^inf dt  g(t) Gamma_ij(x, x; t)

where Gamma_ij is the causal field response measured by ordinary FDTD
pulse runs -- one run per (surface point, field component): inject a
delta-function current at x, record the same component at x -- and g(t)
is a geometry-independent kernel.

Kernel (c = hbar = 1; Rodriguez/McCauley et al., PRA 80, 012115 (2009)).
The vacuum kernel is g(t) = 1/(pi t^2), whose slow 1/t^2 tail is
accelerated by running in a globally dissipative medium with D
conductivity sigma (eps_eff(xi) = 1 + i sigma/xi keeps w(0) = 0 so the
deformed frequency contour w(xi) = xi sqrt(1 + i sigma/xi) starts at the
origin with no boundary term).  The frequency-domain kernel is then

    dg(xi) = -i xi sqrt(1 + i sigma/xi) (1 + sigma/(2 xi))

whose Fourier transform make_casimir_g() evaluates the reference's way
(casimir.cpp:56 make_casimir_gfunc): subtract the analytically
transformable singular parts (sigma - i xi) + (eps0/2) sqrt(i sigma^3/xi),
FFT the smooth remainder numerically, and add the singular transforms
2i[(1/t^2 + sigma/t)/(2 pi) + (eps0/4) sqrt(sigma^3/(pi t))] back in
closed form.  H-field correlations are sampled at (n - 1/2) dt, so the
H kernel carries a tshift = -dt/2 phase.  The force assembly is
F = sum_t dt Im[g(t)] Gamma(t) for real pulse responses Gamma
(scheme/casimir.scm:182).

For systems translation-invariant in one direction, the integral over
that direction's wavevector collapses analytically: solve the kz = 0
(lower-dimensional) system and use the modified kernel

    g_kz(t) = i/(2 pi) [2/t^3 + 3 sigma/(2 t^2) + sigma^2/(2 t)]

(casimir.cpp:300 make_casimir_gfunc_kz), with the H kernel shifted by
+dt.  The t -> 0 divergence is the geometry-independent bulk vacuum
pressure: it cancels exactly between the two sides of each surface.

Validation (test_casimir.py, 1D parallel plates vs exact -pi/(24 a^2)):
res 20, mirror eps 1e6 gives F/exact = {0.980, 0.999, 0.998} at
sigma = {0, 0.25, 0.5} with T = 60, and the acceleration works as
advertised: at T = 20 the dissipative runs hold {0.995, 0.992} while
sigma = 0 truncates to 0.940.

Rounds 2-3 shipped a +19%/+29% sigma bias that round 3's endgame traced
to TWO stacked defects (partially cancelling, which is why no kernel
variant alone was sigma-invariant):
  1. A stepper ghost-charge bug: current sources were added to f but not
     to the increment-coupled PML auxiliaries (f_cond / the sigu-chain
     f_u), so the injected charge was never damped by the global
     conductivity — the dissipative Gamma carried an undamped static
     dipole.  Fixed in step._apply_sources; diagnosed by a PML vs
     long-PEC-cell response diff (identical at sigma = 0, diverging at
     the source step for sigma > 0).
  2. The contour-measure factor: the correct kernel carries the COMPLEX
     factor (1 + i sigma/2xi) (casimir.cpp:73) = -i w (dw/dxi)(w/xi) —
     the dissipative-run response is Gamma_sigma(xi) =
     (xi/w) Gamma_vac(w(xi)), so the measure needs the extra (w/xi).
     Proven sigma-invariant by a numerically exact continuum image-sum
     model of the 1D geometry (each mirror image contributes
     (xi/w) e^{i w x}; only this kernel leaves the contraction
     sigma-independent: {0.98, 0.99} vs {0.66, 0.53} for the round-2
     real-factor variant).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np


def make_casimir_g(T: float, dt: float, sigma: float = 0.0, ft: str = "e",
                   Tfft: Optional[float] = None) -> np.ndarray:
    """Complex Casimir kernel g[n] at times n dt (+ the H half-step shift)
    for runs in a medium with global D conductivity `sigma`
    (casimir.cpp:56 make_casimir_gfunc; see module docstring).  Pair with
    real pulse responses as F = sum_n dt Im(g[n]) Gamma[n]."""
    tshift = 0.0 if ft in ("e", "d") else -0.5 * dt
    T = T + 5 * dt
    if Tfft is None or Tfft <= T:
        Tfft = max(T * 400, 4000.0)
    N = int(np.ceil(T / dt))
    t = np.arange(1, N) * dt + tshift
    eps0 = 1.0

    def smooth_part(Nfft):
        i = np.arange(1, Nfft // 2)
        xi = 2 * np.pi * i / (Nfft * dt)
        dg = np.zeros(Nfft, complex)
        # smooth remainder: kernel minus analytically-transformable parts.
        # The contour factor is the COMPLEX (1 + i sigma/2xi)
        # (casimir.cpp:73 C(1.0, 0.5*sigma/xi)) = -i w (dw/dxi)(w/xi)
        # with w(xi) = xi sqrt(1 + i sigma/xi): the dissipative-run
        # response is Gamma_sigma(xi) = (xi/w) Gamma_vac(w(xi)), so the
        # measure must carry the inverse (w/xi) on top of -i w dw/dxi.
        # (Round 3 shipped the real factor 1 + sigma/2xi; the continuum
        # image-sum model shows only the complex one is sigma-invariant.)
        dg[1:Nfft // 2] = ((-1j * xi) * np.sqrt(1 + 1j * sigma / xi)
                           * (1 + 0.5j * sigma / xi)
                           - ((sigma - 1j * xi)
                              + 0.5 * eps0 * np.sqrt(1j * sigma ** 3 / xi)))
        dg[0] = -sigma
        if tshift != 0.0:
            dg[1:Nfft // 2] *= np.exp(1j * xi * tshift)
        # FFTW BACKWARD = unnormalized inverse
        return np.fft.ifft(dg)[:N] * Nfft / (Nfft * dt)

    # the xi^-1/2 endpoint converges like Nfft^-1/2: Richardson-extrapolate
    # from Nfft and 4 Nfft (2 g_4N - g_N removes the leading term)
    Nfft = int(np.ceil(Tfft / dt))
    dgt = 2.0 * smooth_part(4 * Nfft) - smooth_part(Nfft)
    g = np.zeros(N, complex)
    g[1:] = 2.0 * (dgt[1:N]
                   + 1j * ((1 / t ** 2 + sigma / t) / (2 * np.pi)
                           + 0.25 * eps0 * np.sqrt(sigma ** 3 / (t * np.pi))))
    return g


def make_casimir_g_kz(T: float, dt: float, sigma: float = 0.0,
                      ft: str = "e") -> np.ndarray:
    """Kernel for systems translation-invariant in one direction: solve the
    kz = 0 lower-dimensional system and integrate with this g instead
    (casimir.cpp:300 make_casimir_gfunc_kz; closed form)."""
    tshift = 0.0 if ft in ("e", "d") else dt
    T = T + 5 * dt
    N = int(np.ceil(T / dt))
    g = np.zeros(N, complex)
    t = np.arange(1, N) * dt + tshift
    g[1:] = (1j / (2 * np.pi)) * (2.0 / t ** 3 + 1.5 * sigma / t ** 2
                                  + 0.5 * sigma ** 2 / t)
    return g


def casimir_g(tvec: np.ndarray, sigma: float = 0.0, ft: str = "e") -> np.ndarray:
    """Im g(t) sampled at arbitrary times (vacuum closed form at sigma=0;
    FFT-built kernel interpolated otherwise).  Prefer make_casimir_g for
    step-aligned series."""
    t = np.asarray(tvec, np.float64)
    out = np.zeros_like(t)
    m = t > 0
    if sigma == 0.0:
        out[m] = 1.0 / (np.pi * t[m] ** 2)
        return out
    dt = float(np.min(np.diff(np.unique(np.concatenate([[0.0], t[m]])))))
    g = make_casimir_g(float(t[m].max()) + 2 * dt, dt, sigma, ft)
    tg = np.arange(len(g)) * dt + (0.0 if ft in ("e", "d") else -0.5 * dt)
    out[m] = np.interp(t[m], tg[1:], g[1:].imag)
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


def _set_global_sigma(sim, sigma: float, ft: str) -> None:
    """Apply the global Casimir dissipation: D conductivity for E-source
    runs, B conductivity for H-source runs (scheme/casimir.scm:144-149
    global-D/B-conductivity switch) — the kernel's analytic continuation
    pairs eps(xi) with E responses and mu(xi) with H responses."""
    if sigma == 0.0:
        return
    import dataclasses as dc

    def mod(m):
        if ft == "e":
            return dc.replace(m, D_conductivity=sigma, B_conductivity=0.0)
        return dc.replace(m, B_conductivity=sigma, D_conductivity=0.0)

    sim.default_material = mod(sim.default_material)
    for g in sim.geometry:
        g.material = mod(g.material)


def correlation_run(sim_factory: Callable, comp: str, pt, T: float,
                    sigma: float = 0.0) -> Tuple[np.ndarray, float]:
    """One pulse run: inject a delta current of `comp` at `pt`, record the
    same component there every step (in-scan FieldProbe, no host sync).
    Returns (Gamma(t), dt) with t = (n+1) dt.  When sigma > 0 the global
    dissipation is injected per field type (D for E runs, B for H runs)."""
    import meep_nl_tpu as mp
    from ..models.run_control import FieldProbe

    sim = sim_factory()
    _set_global_sigma(sim, sigma, comp[0])
    dt = sim.dt
    src_time = mp.CustomSource(
        func=lambda t, dt=dt: (1.0 / dt) if t < dt else 0.0,
        end_time=2 * dt)
    sim.sources = list(sim.sources) + [
        mp.Source(src_time, component=comp, center=pt)]
    probe = FieldProbe(comp, pt)
    sim.run(probe, until=T)
    return np.real(np.asarray(probe.data, np.complex128)), dt


def _m_per_axis(m, n_ext: int):
    """Normalize the harmonic index argument: an int replicates over all
    extended axes (the 2D segment case); a tuple gives one index per
    extended axis in axis order (the 3D face case,
    casimir_stress_dct_integral's independent mx/my/mz)."""
    if np.isscalar(m):
        return (int(m),) * n_ext
    m = tuple(int(v) for v in m)
    if len(m) != n_ext:
        raise ValueError(f"{len(m)} harmonic indices for {n_ext} "
                         "extended axes")
    return m


def _dct_sites(sim, comp: str, center, size, m):
    """(indices, weights) of component `comp`'s sites on a surface
    element (line segment in 2D, rectangle in 3D), weighted by the
    normalized cosine-harmonic product times the surface measure
    (casimir.cpp stress_chunkloop: cos(mx pi (u-u0)/Lx) * cos(my ...) *
    loop weight * dV, coefficient sqrt((m==0 ? 1 : 2)/L) per axis).
    `m` is an int (same index on every extended axis) or a tuple with
    one index per extended axis."""
    from ..models.simulation import _volume_sites, _vec_to_axes
    gv = sim.gv
    c_ax = _vec_to_axes(gv, center)
    s_ax = _vec_to_axes(gv, size)
    slices, w = _volume_sites(gv, comp, c_ax, s_ax)
    # extended (tangent) axes: the ones with nonzero extent
    ext = [ax for ax in range(gv.ndim) if s_ax[ax] > gv.dx * 0.5]
    ms = _m_per_axis(m, len(ext))
    wfull = np.asarray(w, np.float64).copy()
    norm = 1.0
    for ax, mi in zip(ext, ms):
        L = s_ax[ax]
        u0 = c_ax[ax] - L / 2
        coords = gv.comp_coords(comp, ax)[slices[ax]]
        cosw = np.cos(mi * np.pi * (coords - u0) / L)
        shape = [1] * wfull.ndim
        shape[ax] = len(coords)
        wfull = wfull * cosw.reshape(shape)
        norm *= np.sqrt((1.0 if mi == 0 else 2.0) / L) * gv.dx
    idx = np.stack(np.meshgrid(*[np.arange(s.start, s.stop) for s in slices],
                               indexing="ij"), -1).reshape(-1, gv.ndim)
    return idx, (wfull * norm).ravel()


def casimir_force_contrib(sim_factory: Callable, force_dir: str, center,
                          size, outward: int, source_comp: str, m: int,
                          T: float, sigma: float = 0.0,
                          kz_invariant: bool = True,
                          vacuum_ref: bool = True,
                          t_cut: float = 0.0,
                          ref_factory: Optional[Callable] = None) -> float:
    """One (side, source component, cosine harmonic) contribution to the
    Casimir force: inject a delta pulse of `source_comp` with the m-th
    cosine amplitude pattern over the side, record the DCT-weighted stress
    integrand every step, and contract with the kernel
    (scheme/casimir.scm:114 casimir-force-contrib +
    casimir_stress_dct_integral's term table, casimir.cpp:225-240)."""
    import meep_nl_tpu as mp
    from ..models.run_control import WeightedProbe

    ft = source_comp[0]
    dsource = source_comp[1]
    # normal direction: the zero-extent direction of the side (2D: the
    # in-plane zero-extent one; 3D faces have two extended axes)
    sz = _v3c(size)
    ext_i = [i for i in range(3) if sz[i] > 0]
    zero_i = [i for i in range(2 if len(ext_i) == 1 else 3)
              if sz[i] == 0]
    dn = "xyz"[zero_i[0]]
    if force_dir != dn and dsource != dn:
        return 0.0
    if force_dir != dn:                 # force-source off-diagonal term
        dmeas, coef = force_dir, 1.0
    elif dsource == dn:                 # +source-source/2 diagonal
        dmeas, coef = dsource, 0.5
    else:                               # -source-source/2 diagonal
        dmeas, coef = dsource, -0.5
    meas_comp = ft + dmeas
    ms = _m_per_axis(m, len(ext_i))

    def one_run(strip_geometry):
        if strip_geometry and ref_factory is not None:
            # reference-style vacuum subtraction (Casimir_Forces.md
            # "Vacuum Subtraction"): the reference configuration keeps the
            # ENCLOSED body (removing only the others), so the body's own
            # finite-resolution self-force artifact — which does NOT vanish
            # for staircased surfaces — cancels in the difference, not just
            # the bulk vacuum term
            sim = ref_factory()
        else:
            sim = sim_factory()
            if strip_geometry:
                sim.geometry = []
        _set_global_sigma(sim, sigma, ft)
        dt = sim.dt
        # cosine-product source pattern over the side, delta pulse in
        # time (one normalized cos per extended axis)
        terms = []                      # (coord index, L, m_i)
        Nu = 1.0
        for i, mi in zip(ext_i, ms):
            Nu *= np.sqrt((1.0 if mi == 0 else 2.0) / sz[i])
            terms.append((i, sz[i], mi))

        def amp(p):                     # p is relative to the source center
            pc = (p.x, p.y, p.z) if hasattr(p, "x") else tuple(p)
            out = Nu
            for (i, L, mi) in terms:
                out *= np.cos(mi * np.pi * (pc[i] + L / 2) / L)
            return out

        src_time = mp.CustomSource(
            func=lambda t, dt=dt: (1.0 / dt) if t < dt else 0.0,
            end_time=2 * dt)
        sim.sources = list(sim.sources) + [
            mp.Source(src_time, component=source_comp, center=center,
                      size=size, amp_func=amp)]
        idx, ws = _dct_sites(sim, meas_comp, center, size, m)
        probe = WeightedProbe(meas_comp, idx, ws)
        sim.run(probe, until=T)
        return np.real(np.asarray(probe.data, np.complex128)), dt

    gam, dt = one_run(False)
    if vacuum_ref:
        # subtract the geometry-free response: removes the divergent bulk
        # vacuum pressure (and any boundary artifact) from each side
        # BEFORE the surface sum, instead of relying on its cancellation
        # between opposite sides (the t->0 cancellation note in the
        # module docstring, done per-probe)
        gam_vac, _ = one_run(True)
        gam = gam - gam_vac
    if t_cut > 0:
        # causality window: after vacuum subtraction the net response is
        # identically zero until the first scattered signal arrives
        # (2 x the surface-to-body distance); before that, only fp32
        # roundoff remains, amplified by the kernel's t->0 divergence
        n_cut = int(t_cut / dt)
        gam = gam.copy()
        gam[:n_cut] = 0.0
    gfn = make_casimir_g_kz if kz_invariant else make_casimir_g
    g = gfn((len(gam) + 2) * dt, dt, sigma, ft=ft)
    gi = g[1:len(gam) + 1].imag
    return float(outward) * coef * float(np.sum(gi * gam) * dt)


def casimir_force_2d(sim_factory: Callable, force_dir: str,
                     sides: Sequence[Tuple], T: float = 40.0,
                     sigma: float = 0.0, n_max: int = 6,
                     kz_invariant: bool = True,
                     source_comps: Optional[Sequence[str]] = None,
                     vacuum_ref: bool = True, t_cut: float = 0.0,
                     ref_factory: Optional[Callable] = None) -> float:
    """Casimir force along `force_dir` on a body enclosed by `sides` in a
    2D simulation; per unit length in the invariant z direction when
    `kz_invariant` (the kz-integral collapses onto the kz=0 runs with the
    g_kz kernel, casimir.cpp:295-318).

    `sides` is a list of (center, size, outward_sign) line segments
    (size zero along each side's normal).  One FDTD pulse run per
    (side, source component, harmonic); harmonics converge exponentially
    in m for smooth surfaces."""
    if source_comps is None:
        source_comps = ("ex", "ey", "ez", "hx", "hy", "hz")
    total = 0.0
    for (center, size, outward) in sides:
        for sc in source_comps:
            for m in range(n_max):
                total += casimir_force_contrib(
                    sim_factory, force_dir, center, size, outward, sc, m,
                    T, sigma, kz_invariant, vacuum_ref, t_cut,
                    ref_factory=ref_factory)
    return total


def casimir_force_3d(sim_factory: Callable, force_dir: str,
                     sides: Sequence[Tuple], T: float = 20.0,
                     sigma: float = 0.0, n_max: int = 3,
                     source_comps: Optional[Sequence[str]] = None,
                     vacuum_ref: bool = True, t_cut: float = 0.0,
                     ref_factory: Optional[Callable] = None) -> float:
    """Casimir force along `force_dir` on a body enclosed by `sides` in
    a full 3D simulation (the dimension-general machinery of
    casimir.cpp:325 casimir_stress_dct_integral with independent mx/my/mz
    harmonics and the 3D vacuum kernel make_casimir_g).

    `sides` is a list of (center, size, outward_sign[, multiplicity])
    rectangles (size zero along each side's normal; the optional fourth
    entry multiplies the contribution — use it to fold symmetric faces
    into one run set).  One FDTD pulse run per
    (side, source component, (m1, m2) harmonic pair)."""
    import itertools
    if source_comps is None:
        source_comps = ("ex", "ey", "ez", "hx", "hy", "hz")
    total = 0.0
    for side in sides:
        center, size, outward = side[0], side[1], side[2]
        mult = side[3] if len(side) > 3 else 1.0
        for sc in source_comps:
            for m2 in itertools.product(range(n_max), repeat=2):
                total += mult * casimir_force_contrib(
                    sim_factory, force_dir, center, size, outward, sc,
                    m2, T, sigma, kz_invariant=False,
                    vacuum_ref=vacuum_ref, t_cut=t_cut,
                    ref_factory=ref_factory)
    return total


def casimir_plate_force_waveguide(a: float, wy: float, wz: float,
                                  m_max: int = 40) -> float:
    """Exact Casimir force between perfect-mirror plates spanning the
    full cross-section of a PEC rectangular waveguide (wy x wz),
    separated by `a` — the analytic gate for the 3D FDTD machinery
    (metallic cell walls are the FDTD default, so plates wall-to-wall
    realize exactly this geometry).

    Per EM waveguide mode with transverse eigenvalue k_t, the perfect-
    mirror Lifshitz force at T=0 is
        F_mode(a) = -(1/pi) int_0^inf dxi  kappa / (e^{2 kappa a} - 1),
        kappa = sqrt(xi^2 + k_t^2);
    the spectrum is TE(m,n): m,n >= 0 not both zero, and TM(m,n):
    m,n >= 1, with k_t^2 = (m pi/wy)^2 + (n pi/wz)^2.  The continuum
    limit of this sum reproduces -pi^2 A/(240 a^4) exactly."""
    from scipy.integrate import quad

    def f_mode(kt: float) -> float:
        val, _ = quad(
            lambda xi: np.sqrt(xi * xi + kt * kt)
            / np.expm1(2.0 * a * np.sqrt(xi * xi + kt * kt)),
            0.0, 30.0 / a, limit=200)
        return -val / np.pi

    total = 0.0
    for mm in range(m_max + 1):
        for nn in range(m_max + 1):
            kt = np.hypot(mm * np.pi / wy, nn * np.pi / wz)
            if mm == 0 and nn == 0:
                continue                      # no TEM in a hollow guide
            ndeg = 2 if (mm >= 1 and nn >= 1) else 1   # TE + TM / TE only
            total += ndeg * f_mode(kt)
    return total


def _v3c(v) -> Tuple[float, float, float]:
    if hasattr(v, "x"):
        return (v.x, v.y, v.z)
    t = tuple(v) + (0.0, 0.0, 0.0)
    return t[:3]


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
            g = make_casimir_g((len(gam) + 2) * dt, dt, sigma, ft=comp[0])
            gi = g[1:len(gam) + 1].imag     # gam[k] is the field at (k+1) dt
            w = _stress_weight(comp, "z", "z")
            total += nrm * w * float(np.sum(gi * gam) * dt)
    return total
