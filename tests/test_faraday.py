"""1D Faraday rotation through a gyrotropic medium.

The reference's scheme/examples/faraday-rotation.ctl physics: a linearly
polarized wave through a z-biased gyrotropic Lorentzian rotates its
polarization at (dtheta/dz) = pi f (n_- - n_+), with the circular
indices from eps_pm = eps_inf + sigma f0^2 / (f0^2 -+ b f - f^2)
(susceptibility.cpp:519 gyrotropic update; meep docs Faraday tutorial).

Exercises the 1D grid's two transverse polarizations (ex/hy AND ey/hx),
the gyrotropic live-component closure, and the reduced-grid polarization
neighbor averaging."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def test_faraday_rotation_angle_matches_theory():
    epsn, f0, g0, sn, b0, fsrc = 1.5, 1.0, 1e-6, 0.1, 0.15, 0.8
    med = mp.Medium(epsilon=epsn, E_susceptibilities=[
        mp.GyrotropicLorentzianSusceptibility(
            frequency=f0, gamma=g0, sigma=sn, bias=mp.Vector3(0, 0, b0))])
    L = 16.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(0, 0, L), resolution=20, dimensions=1,
        default_material=med,
        sources=[mp.Source(mp.ContinuousSource(fsrc, width=2.0), mp.Ex,
                           center=mp.Vector3(0, 0, -L / 2 + 1.5))],
        boundary_layers=[mp.PML(1.0, direction='z')])
    sim.run(until=60)
    zs = np.linspace(-L / 2 + 2.5, L / 2 - 2.5, 25)
    th = []
    for z in zs:
        ex = float(np.real(sim.get_field_point(mp.Ex, mp.Vector3(0, 0, z))))
        ey = float(np.real(sim.get_field_point(mp.Ey, mp.Vector3(0, 0, z))))
        th.append(np.arctan(ey / ex) if abs(ex) > 1e-12 else np.pi / 2)
    th = np.array(th)
    for i in range(1, len(th)):     # unwrap mod pi (ey/ex is mod-pi)
        while th[i] - th[i - 1] > np.pi / 2:
            th[i] -= np.pi
        while th[i] - th[i - 1] < -np.pi / 2:
            th[i] += np.pi
    slope = np.polyfit(zs, th, 1)[0]
    epsp = epsn + sn * f0 ** 2 / (f0 ** 2 - b0 * fsrc - fsrc ** 2)
    epsm = epsn + sn * f0 ** 2 / (f0 ** 2 + b0 * fsrc - fsrc ** 2)
    kdiff = np.pi * fsrc * (np.sqrt(epsm) - np.sqrt(epsp))
    assert abs(slope - kdiff) < 0.05 * abs(kdiff)


def test_1d_single_polarization_stays_two_component():
    """An Ex-only 1D vacuum run must not step the second polarization
    (the live closure keeps ey/hx out)."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(0, 0, 12), resolution=10, dimensions=1,
        sources=[mp.Source(mp.GaussianSource(1.0, fwidth=0.5), mp.Ex,
                           center=mp.Vector3(0, 0, 0))],
        boundary_layers=[mp.PML(1.0, direction='z')])
    sim.init_sim()
    assert set(sim._state["f"]) >= {"ex", "hy"}
    assert "ey" not in sim._state["f"] and "hx" not in sim._state["f"]
    sim.run(until=6)
    assert np.abs(np.asarray(sim.get_array(component='ex'))).max() > 1e-3


def test_1d_ey_polarization_runs():
    """The second 1D polarization (Ey/Hx) is a first-class citizen."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(0, 0, 12), resolution=10, dimensions=1,
        sources=[mp.Source(mp.GaussianSource(1.0, fwidth=0.5), mp.Ey,
                           center=mp.Vector3(0, 0, 0))],
        boundary_layers=[mp.PML(1.0, direction='z')])
    sim.run(until=6)
    ey = np.abs(np.asarray(sim.get_array(component='ey'))).max()
    assert ey > 1e-3
