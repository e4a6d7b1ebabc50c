"""Quantitative BFAST validation (the fork's headline feature; reference
step_generic.cpp:339 step_bfast + python/tests/test_refl_angular.py).

BFAST simulates oblique plane-wave incidence at a FIXED angle for all
frequencies simultaneously: k_transverse(w) = scaled_k * w via the s*dH/dt
auxiliary terms.  Geometry mirrors the fork's own test: z-propagation in a
transversally-singleton 3D cell, scaled_k along x, Courant reduced to
(1-|s|)/sqrt(3)."""

import numpy as np
import pytest

import meep_nl_tpu as mp

S = 0.5            # sin(30 deg)
COUR = (1 - S) / np.sqrt(3)


def _sim(geom=(), res=20, **kw):
    return mp.Simulation(
        cell_size=mp.Vector3(0.1, 0.1, 10), resolution=res, Courant=COUR,
        geometry=list(geom),
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ex, center=mp.Vector3(0, 0, -3.0),
                           size=mp.Vector3(0.1, 0.1, 0))],
        boundary_layers=[mp.PML(1.0, direction=mp.Z)],
        k_point=mp.Vector3(0, 0, 0),
        bfast_scaled_k=mp.Vector3(S, 0, 0),
        eps_averaging=False, **kw)


@pytest.mark.slow
def test_fixed_angle_broadband():
    """The defining property: sin(theta_eff) = kx/w is frequency-
    INDEPENDENT (equal to scaled_k) across the band."""
    sim = _sim()
    dft = sim.add_dft_fields([mp.Ex], 1.0, 0.5, 5,
                             center=mp.Vector3(0, 0, 0.5),
                             size=mp.Vector3(0, 0, 5.0))
    sim.run(until=80)
    for i, f in enumerate(np.linspace(0.75, 1.25, 5)):
        a = np.squeeze(np.asarray(sim.get_dft_array(dft, mp.Ex, i)))
        while a.ndim > 1:
            a = a[0]
        ph = np.unwrap(np.angle(a))
        kz = abs(np.polyfit(np.arange(len(ph)) / sim.resolution, ph, 1)[0])
        kzw = kz / (2 * np.pi * f)
        sin_eff = np.sqrt(max(0.0, 1 - kzw ** 2))
        assert abs(sin_eff - S) < 0.01, (f, sin_eff)


@pytest.mark.slow
def test_oblique_fresnel():
    """Broadband reflectance off a half-space at 30 deg matches p-pol
    Fresnel within the framework's generic sharp-interface discretization
    error at this resolution (<= +12% tilt measured in a no-BFAST
    normal-incidence control)."""
    n2 = 1.5
    fcen, df, nf = 1.0, 0.5, 5

    def run(iface):
        geom = [mp.Block(center=mp.Vector3(0, 0, 2.5),
                         size=mp.Vector3(mp.inf, mp.inf, 5.0),
                         material=mp.Medium(epsilon=n2 ** 2))] if iface \
            else []
        sim = _sim(geom)
        refl = sim.add_flux(fcen, df, nf, mp.FluxRegion(
            center=mp.Vector3(0, 0, -2.0), size=mp.Vector3(0.1, 0.1, 0)))
        return sim, refl

    sim0, refl0 = run(False)
    sim0.run(until=60)
    inc = np.array(sim0.get_fluxes(refl0))
    data = sim0.get_flux_data(refl0)
    sim1, refl1 = run(True)
    sim1.load_minus_flux_data(refl1, data)
    sim1.run(until=100)
    R = -np.array(sim1.get_fluxes(refl1)) / inc

    for i, f in enumerate(np.linspace(fcen - df / 2, fcen + df / 2, nf)):
        w = 2 * np.pi * f
        kz1 = np.sqrt(w ** 2 - (S * w) ** 2)
        kz2 = np.sqrt((n2 * w) ** 2 - (S * w) ** 2)
        rp = (n2 ** 2 * kz1 - kz2) / (n2 ** 2 * kz1 + kz2)
        assert abs(R[i] - rp ** 2) < 0.008, (f, R[i], rp ** 2)
    assert np.all(R > 0)


def test_cfl_guard():
    """BFAST tightens the CFL bound; the default Courant must be refused."""
    with pytest.raises(ValueError, match="Courant"):
        sim = mp.Simulation(
            cell_size=mp.Vector3(0.1, 0.1, 4), resolution=10,
            sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.3),
                               component=mp.Ex, center=mp.Vector3())],
            boundary_layers=[mp.PML(1.0, direction=mp.Z)],
            k_point=mp.Vector3(0, 0, 0),
            bfast_scaled_k=mp.Vector3(0.5, 0, 0))
        sim.init_sim()
    with pytest.raises(ValueError, match=">= 1"):
        sim = mp.Simulation(
            cell_size=mp.Vector3(0.1, 0.1, 4), resolution=10, Courant=0.1,
            sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.3),
                               component=mp.Ex, center=mp.Vector3())],
            k_point=mp.Vector3(0, 0, 0),
            bfast_scaled_k=mp.Vector3(1.5, 0, 0))
        sim.init_sim()


@pytest.mark.slow
def test_long_time_stability():
    """PML + BFAST ran away exponentially before the k-taper + F damping;
    fields must decay to the noise floor after the source turns off."""
    sim = _sim()
    sim.run(until=80)
    ex = np.asarray(sim.fields_state["f"]["ex"])
    assert np.all(np.isfinite(np.abs(ex)))
    assert np.abs(ex).max() < 1e-3


@pytest.mark.slow
def test_oblique_fresnel_s_pol():
    """s-polarization (E perpendicular to the incidence plane, Ey source):
    broadband 30-degree reflectance matches the s-pol Fresnel formula
    within the sharp-interface discretization envelope."""
    n2 = 1.5
    fcen, df, nf = 1.0, 0.5, 5

    def run(iface):
        geom = [mp.Block(mp.Vector3(mp.inf, mp.inf, 5.0),
                         center=mp.Vector3(0, 0, 2.5),
                         material=mp.Medium(epsilon=n2 ** 2))] if iface \
            else []
        sim = mp.Simulation(
            cell_size=mp.Vector3(0.1, 0.1, 10), resolution=20,
            Courant=COUR, geometry=geom,
            sources=[mp.Source(mp.GaussianSource(fcen, fwidth=df),
                               component=mp.Ey,
                               center=mp.Vector3(0, 0, -3.0),
                               size=mp.Vector3(0.1, 0.1, 0))],
            boundary_layers=[mp.PML(1.0, direction=mp.Z)],
            k_point=mp.Vector3(0, 0, 0),
            bfast_scaled_k=mp.Vector3(S, 0, 0), eps_averaging=False)
        refl = sim.add_flux(fcen, df, nf, mp.FluxRegion(
            center=mp.Vector3(0, 0, -2.0), size=mp.Vector3(0.1, 0.1, 0)))
        return sim, refl

    sim0, refl0 = run(False)
    sim0.run(until=60)
    inc = np.array(sim0.get_fluxes(refl0))
    data = sim0.get_flux_data(refl0)
    sim1, refl1 = run(True)
    sim1.load_minus_flux_data(refl1, data)
    sim1.run(until=100)
    R = -np.array(sim1.get_fluxes(refl1)) / inc
    for i, f in enumerate(np.linspace(fcen - df / 2, fcen + df / 2, nf)):
        w = 2 * np.pi * f
        kz1 = np.sqrt(w ** 2 - (S * w) ** 2)
        kz2 = np.sqrt((n2 * w) ** 2 - (S * w) ** 2)
        rs = (kz1 - kz2) / (kz1 + kz2)
        assert abs(R[i] - rs ** 2) < 0.015, (f, R[i], rs ** 2)


def test_bfast_envelope_hard_error():
    """Single-partner curls (e.g. 2D TM) with nonzero scaled_k along their
    axis are outside the stable BFAST envelope and must raise, not
    silently narrow."""
    import pytest
    with pytest.raises(ValueError, match="single partner"):
        sim = mp.Simulation(
            cell_size=mp.Vector3(4, 4), resolution=10,
            sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.3),
                               component=mp.Ez, center=mp.Vector3())],
            bfast_scaled_k=(0.3, 0, 0), Courant=0.3)
        sim.init_sim()
