"""Diffracted-planewave decomposition (DiffractedPlanewave bands in
get_eigenmode_coefficients; reference python/simulation.py:2477 +
diffractedplanewave in src/mpb.cpp) and mode kdom/parity metadata."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def _grating_sim(with_grating, res=20, fcen=1.5):
    # y-periodic cell (k_point=0): period 1, orders g=+-1 propagate at
    # fcen=1.5 (> 1/period)
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 1), resolution=res,
        k_point=mp.Vector3(),
        geometry=([mp.Block(center=mp.Vector3(0, 0.2),
                            size=mp.Vector3(0.5, 0.45, mp.inf),
                            material=mp.Medium(epsilon=6))]
                  if with_grating else []),
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.3),
                           component=mp.Ez, center=mp.Vector3(-2.5, 0),
                           size=mp.Vector3(0, 1))],
        boundary_layers=[mp.PML(1.0, direction=mp.X)])
    fr = mp.FluxRegion(center=mp.Vector3(2.5, 0), size=mp.Vector3(0, 1))
    flux = sim.add_flux(fcen, 0.2, 3, fr)
    sim.run(until_after_sources=mp.stop_when_dft_decayed())
    return sim, flux


def test_order0_equals_flux_empty():
    """Empty periodic cell: all transmitted power is the (0,0,0) order,
    so |a0+|^2 == the monitor flux and higher orders vanish."""
    sim, flux = _grating_sim(False)
    bands = [mp.DiffractedPlanewave((0, 0, 0)),
             mp.DiffractedPlanewave((0, 1, 0)),
             mp.DiffractedPlanewave((0, -1, 0))]
    alpha = sim.get_eigenmode_coefficients(flux, bands)
    P = np.asarray(sim.get_fluxes(flux))
    p0 = np.abs(alpha[0, :, 0]) ** 2
    np.testing.assert_allclose(p0, P, rtol=2e-2)
    assert np.all(np.abs(alpha[1, :, 0]) ** 2 < 2e-3 * P)
    assert np.all(np.abs(alpha[2, :, 0]) ** 2 < 2e-3 * P)


def test_grating_orders_sum_to_flux():
    """Lamellar grating: the propagating transmitted orders (0, +-1)
    together carry the full transmitted flux (completeness of the
    diffraction basis; evanescent orders have decayed at the monitor)."""
    sim, flux = _grating_sim(True)
    bands = [mp.DiffractedPlanewave((0, g, 0)) for g in (-1, 0, 1)]
    alpha = sim.get_eigenmode_coefficients(flux, bands)
    P = np.asarray(sim.get_fluxes(flux))
    psum = np.sum(np.abs(alpha[:, :, 0]) ** 2, axis=0)
    np.testing.assert_allclose(psum, P, rtol=3e-2)
    # the grating actually scatters: order +-1 carry real power
    assert np.abs(alpha[0, 1, 0]) ** 2 > 1e-3 * P[1]
    assert np.abs(alpha[2, 1, 0]) ** 2 > 1e-3 * P[1]


def test_mode_kdom_and_parity():
    """Waveguide-mode metadata: kdom along the normal and even/odd parity
    labels + parity-constrained solving (mpb.cpp kdom / set_parity)."""
    from meep_nl_tpu.analysis.modes import solve_tm_modes
    n = 120
    eps = np.ones(n)
    eps[n // 2 - 12:n // 2 + 12] = 12.0
    modes = solve_tm_modes(eps, 1 / 20.0, 0.25, num_modes=3)
    assert modes[0].parity == "even"
    assert modes[1].parity == "odd"
    k = modes[0].kdom
    np.testing.assert_allclose(k[0], modes[0].beta / (2 * np.pi))
    evens = solve_tm_modes(eps, 1 / 20.0, 0.25, num_modes=2, parity="even")
    assert all(m.parity == "even" for m in evens)
    odds = solve_tm_modes(eps, 1 / 20.0, 0.25, num_modes=1, parity="odd")
    assert odds and odds[0].parity == "odd"
    assert abs(odds[0].beta - modes[1].beta) < 1e-9


def test_diffracted_planewave_source():
    """add_eigenmode_source with a DiffractedPlanewave launches the
    requested oblique order: downstream decomposition attributes the
    power to g=+1, not g=0, and the launch is unidirectional."""
    fcen = 1.5
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 1), resolution=20,
        k_point=mp.Vector3(),
        sources=[],
        boundary_layers=[mp.PML(1.0, direction=mp.X)])
    sim.add_eigenmode_source(
        mp.GaussianSource(frequency=fcen, fwidth=0.2),
        center=mp.Vector3(-2.5, 0), size=mp.Vector3(0, 1),
        direction=+1, mode_band=mp.DiffractedPlanewave((0, 1, 0)))
    fr = mp.FluxRegion(center=mp.Vector3(2.5, 0), size=mp.Vector3(0, 1))
    flux = sim.add_flux(fcen, 0, 1, fr)
    sim.run(until_after_sources=mp.stop_when_dft_decayed())
    bands = [mp.DiffractedPlanewave((0, g, 0)) for g in (0, 1)]
    alpha = sim.get_eigenmode_coefficients(flux, bands)
    p0 = abs(alpha[0, 0, 0]) ** 2
    p1 = abs(alpha[1, 0, 0]) ** 2
    p1_back = abs(alpha[1, 0, 1]) ** 2
    assert p1 > 50 * p0, (p1, p0)
    assert p1 > 20 * p1_back, (p1, p1_back)


def test_te_order0_equals_flux_empty():
    """TE (Hz) polarization: the (0,0,0) order carries the full
    transmitted flux on an empty periodic cell (planewave_mode_te +
    the (ey, hz) flux pair)."""
    fcen = 1.5
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 1), resolution=20,
        k_point=mp.Vector3(),
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.3),
                           component=mp.Hz, center=mp.Vector3(-2.5, 0),
                           size=mp.Vector3(0, 1))],
        boundary_layers=[mp.PML(1.0, direction=mp.X)])
    fr = mp.FluxRegion(center=mp.Vector3(2.5, 0), size=mp.Vector3(0, 1))
    flux = sim.add_flux(fcen, 0.2, 3, fr)
    sim.run(until_after_sources=mp.stop_when_dft_decayed())
    bands = [mp.DiffractedPlanewave((0, 0, 0)),
             mp.DiffractedPlanewave((0, 1, 0))]
    alpha = sim.get_eigenmode_coefficients(flux, bands, eig_parity="TE")
    P = np.asarray(sim.get_fluxes(flux))
    p0 = np.abs(alpha[0, :, 0]) ** 2
    np.testing.assert_allclose(p0, P, rtol=3e-2)
    assert np.all(np.abs(alpha[1, :, 0]) ** 2 < 5e-3 * P)
