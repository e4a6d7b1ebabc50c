"""Eigenmode solver, eigenmode source directionality, and S-parameter
decomposition (the MPB-replacement gates; test_mode_coeffs.py pattern)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.modes import solve_tm_modes


def test_slab_mode_dispersion_analytic():
    """Symmetric slab waveguide: fundamental TM(Ez) mode effective index
    must satisfy the analytic transcendental equation."""
    res = 40
    dx = 1.0 / res
    n_hi, n_lo, w = 3.0, 1.0, 1.0
    y = (np.arange(int(8 * res)) + 0.5) * dx - 4.0
    eps = np.where(np.abs(y) < w / 2, n_hi ** 2, n_lo ** 2)
    f = 0.25
    modes = solve_tm_modes(eps, dx, f, num_modes=1)
    assert modes
    neff = modes[0].neff
    # analytic even-mode condition in pole-free form:
    #   k sin(k d/2) - kappa cos(k d/2) = 0
    from scipy.optimize import brentq
    w0 = 2 * np.pi * f

    def disp(ne):
        k = w0 * np.sqrt(n_hi ** 2 - ne ** 2)
        kap = w0 * np.sqrt(ne ** 2 - n_lo ** 2)
        return k * np.sin(k * w / 2) - kap * np.cos(k * w / 2)

    # bracket the fundamental: scan for the sign change closest to n_hi
    grid = np.linspace(n_lo + 1e-6, n_hi - 1e-6, 2000)
    vals = np.array([disp(g) for g in grid])
    sign_changes = np.where(np.sign(vals[:-1]) != np.sign(vals[1:]))[0]
    assert len(sign_changes) > 0
    i = sign_changes[-1]
    ne_exact = brentq(disp, grid[i], grid[i + 1])
    np.testing.assert_allclose(neff, ne_exact, rtol=2e-3)


def _wg_sim():
    return mp.Simulation(
        cell_size=mp.Vector3(14, 6), resolution=16,
        geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                           center=mp.Vector3(),
                           material=mp.Medium(epsilon=9.0))],
        boundary_layers=[mp.PML(1.0)])


def test_eigenmode_source_directional():
    """Eigenmode source launches predominantly one way."""
    sim = _wg_sim()
    src = mp.GaussianSource(frequency=0.25, fwidth=0.05)
    sim.add_eigenmode_source(src, center=mp.Vector3(-3, 0),
                             size=mp.Vector3(0, 4), direction=+1)
    f_fwd = sim.add_flux(0.25, 0.0, 1,
                         mp.FluxRegion(center=mp.Vector3(3, 0),
                                       size=mp.Vector3(0, 4)))
    f_bwd = sim.add_flux(0.25, 0.0, 1,
                         mp.FluxRegion(center=mp.Vector3(-5.5, 0),
                                       size=mp.Vector3(0, 4)))
    sim.run(until_after_sources=60)
    p_f = sim.get_fluxes(f_fwd)[0]
    p_b = -sim.get_fluxes(f_bwd)[0]   # backward power flows -x
    assert p_f > 0
    # extinction: most power forward
    assert p_f / max(abs(p_b), 1e-12) > 20, (p_f, p_b)


def test_mode_coefficients_power_match():
    """|a+|^2 of the fundamental mode accounts for the transmitted flux."""
    sim = _wg_sim()
    src = mp.GaussianSource(frequency=0.25, fwidth=0.05)
    sim.add_eigenmode_source(src, center=mp.Vector3(-3, 0),
                             size=mp.Vector3(0, 4), direction=+1)
    fl = sim.add_flux(0.25, 0.0, 1,
                      mp.FluxRegion(center=mp.Vector3(3, 0),
                                    size=mp.Vector3(0, 4)))
    sim.run(until_after_sources=60)
    p = sim.get_fluxes(fl)[0]
    alpha = sim.get_eigenmode_coefficients(fl, [1])
    p_mode = abs(alpha[0, 0, 0]) ** 2
    # fundamental carries essentially all the power
    np.testing.assert_allclose(p_mode, p, rtol=0.1)
    # and the backward coefficient is tiny
    assert abs(alpha[0, 0, 1]) ** 2 < 0.05 * p_mode
