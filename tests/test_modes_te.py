"""2D TE (Hz-polarized) eigenmode solving, sources, and decomposition —
the other parity of the MPB-replacement gates (mpb.cpp:322 with
maxwell_set_parity; VERDICT r2 weak #7)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.modes import solve_te_modes


def test_te_slab_mode_dispersion_analytic():
    """Symmetric slab: fundamental TE(Hz) mode neff must satisfy the
    analytic condition (k/eps1) tan(k d/2) = kappa/eps2."""
    res = 40
    dx = 1.0 / res
    n_hi, n_lo, w = 3.0, 1.0, 1.0
    y = (np.arange(int(8 * res)) + 0.5) * dx - 4.0
    eps = np.where(np.abs(y) < w / 2, n_hi ** 2, n_lo ** 2)
    f = 0.25
    modes = solve_te_modes(eps, dx, f, num_modes=1)
    assert modes
    neff = modes[0].neff
    from scipy.optimize import brentq
    w0 = 2 * np.pi * f
    e1, e2 = n_hi ** 2, n_lo ** 2

    def disp(ne):
        k = w0 * np.sqrt(e1 - ne ** 2)
        kap = w0 * np.sqrt(ne ** 2 - e2)
        return (k / e1) * np.sin(k * w / 2) - (kap / e2) * np.cos(k * w / 2)

    grid = np.linspace(n_lo + 1e-6, n_hi - 1e-6, 2000)
    vals = np.array([disp(g) for g in grid])
    sc = np.where(np.sign(vals[:-1]) != np.sign(vals[1:]))[0]
    assert len(sc) > 0
    i = sc[-1]
    ne_exact = brentq(disp, grid[i], grid[i + 1])
    np.testing.assert_allclose(neff, ne_exact, rtol=2e-3)


def _wg_sim():
    return mp.Simulation(
        cell_size=mp.Vector3(14, 6), resolution=16,
        geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                           center=mp.Vector3(),
                           material=mp.Medium(epsilon=9.0))],
        boundary_layers=[mp.PML(1.0)])


def test_te_eigenmode_source_directional():
    sim = _wg_sim()
    src = mp.GaussianSource(frequency=0.25, fwidth=0.05)
    sim.add_eigenmode_source(src, center=mp.Vector3(-3, 0),
                             size=mp.Vector3(0, 4), direction=+1,
                             eig_parity="TE")
    f_fwd = sim.add_flux(0.25, 0.0, 1,
                         mp.FluxRegion(center=mp.Vector3(3, 0),
                                       size=mp.Vector3(0, 4)))
    f_bwd = sim.add_flux(0.25, 0.0, 1,
                         mp.FluxRegion(center=mp.Vector3(-5.5, 0),
                                       size=mp.Vector3(0, 4)))
    sim.run(until_after_sources=60)
    p_f = sim.get_fluxes(f_fwd)[0]
    p_b = -sim.get_fluxes(f_bwd)[0]
    assert p_f > 0
    # TE extinction measured ~17x at res 16 (the TM gate is 20x; the
    # residual is discrete-profile mismatch of the equivalence currents)
    assert p_f / max(abs(p_b), 1e-12) > 12, (p_f, p_b)


def test_te_mode_coefficients_power_match():
    sim = _wg_sim()
    src = mp.GaussianSource(frequency=0.25, fwidth=0.05)
    sim.add_eigenmode_source(src, center=mp.Vector3(-3, 0),
                             size=mp.Vector3(0, 4), direction=+1,
                             eig_parity="TE")
    fl = sim.add_flux(0.25, 0.0, 1,
                      mp.FluxRegion(center=mp.Vector3(3, 0),
                                    size=mp.Vector3(0, 4)))
    sim.run(until_after_sources=60)
    p = sim.get_fluxes(fl)[0]
    alpha = sim.get_eigenmode_coefficients(fl, [1], eig_parity="TE")
    p_mode = abs(alpha[0, 0, 0]) ** 2
    np.testing.assert_allclose(p_mode, p, rtol=0.1)
    assert abs(alpha[0, 0, 1]) ** 2 < 0.05 * p_mode


def test_te_get_eigenmode():
    sim = _wg_sim()
    m = sim.get_eigenmode(0.25, center=mp.Vector3(-3, 0),
                          size=mp.Vector3(0, 4), eig_parity="TE")
    assert m.hz is not None and m.ey is not None
    assert 1.0 < m.neff < 3.0
