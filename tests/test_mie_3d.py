"""BASELINE config 4: 3D Mie scattering of a dielectric sphere --- flux box
scattering cross-section vs analytic Mie series, plus a Lorentz-dispersive
run for finiteness."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def _mie_qsca(m_index, x_size):
    """Mie scattering efficiency for relative index m and size parameter x
    (standard Bohren-Huffman series, truncated)."""
    from scipy.special import spherical_jn, spherical_yn

    nmax = int(x_size + 4 * x_size ** (1 / 3) + 4)
    mx = m_index * x_size

    def psi(n, z):
        return z * spherical_jn(n, z)

    def psi_d(n, z):
        return spherical_jn(n, z) + z * spherical_jn(n, z, derivative=True)

    def xi(n, z):
        return z * (spherical_jn(n, z) - 1j * spherical_yn(n, z))

    def xi_d(n, z):
        return (spherical_jn(n, z) - 1j * spherical_yn(n, z)) + z * (
            spherical_jn(n, z, derivative=True)
            - 1j * spherical_yn(n, z, derivative=True))

    qs = 0.0
    for n in range(1, nmax + 1):
        an = (m_index * psi(n, mx) * psi_d(n, x_size)
              - psi(n, x_size) * psi_d(n, mx)) / \
             (m_index * psi(n, mx) * xi_d(n, x_size)
              - xi(n, x_size) * psi_d(n, mx))
        bn = (psi(n, mx) * psi_d(n, x_size)
              - m_index * psi(n, x_size) * psi_d(n, mx)) / \
             (psi(n, mx) * xi_d(n, x_size)
              - m_index * xi(n, x_size) * psi_d(n, mx))
        qs += (2 * n + 1) * (abs(an) ** 2 + abs(bn) ** 2)
    return 2.0 / x_size ** 2 * qs


@pytest.mark.slow
def test_mie_scattering_cross_section():
    """Plane-wave on a dielectric sphere: scattered power through a closed
    flux box / incident intensity = sigma_sca, compared to the Mie series."""
    r_sph = 0.6
    n_sph = 2.0
    fcen, df = 0.8, 0.2
    res = 14
    cell = 5.0
    dpml = 0.8

    def build(with_sphere):
        geom = [mp.Sphere(radius=r_sph, center=mp.Vector3(),
                          material=mp.Medium(index=n_sph))] if with_sphere else []
        sim = mp.Simulation(
            cell_size=mp.Vector3(cell, cell, cell), resolution=res,
            geometry=geom,
            sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                               component=mp.Ex,
                               center=mp.Vector3(0, 0, -cell / 2 + dpml + 0.2),
                               size=mp.Vector3(cell, cell, 0))],
            boundary_layers=[mp.PML(dpml)])
        return sim

    half = 1.2
    sides = []
    for ax, name in [(0, "x"), (1, "y"), (2, "z")]:
        for sgn in (+1, -1):
            center = [0.0, 0.0, 0.0]
            center[ax] = sgn * half
            size = [2 * half] * 3
            size[ax] = 0.0
            sides.append((name, mp.Vector3(*center), mp.Vector3(*size),
                          float(sgn)))

    # scattered-field technique (the reference's Mie tutorial):
    # normalization run records the incident DFT fields on the box; the
    # sphere run subtracts them (load_minus_flux_data) so the closed-box
    # flux is the scattered power.
    def add_box(sim):
        return [sim.add_flux(fcen, 0.0, 1,
                             mp.FluxRegion(center=c, size=s, weight=w))
                for (nm, c, s, w) in sides]

    sim0 = build(False)
    h0 = add_box(sim0)
    sim0.run(until_after_sources=15)
    inc_data = [sim0.get_flux_data(h) for h in h0]
    f0 = [sim0.get_fluxes(h)[0] for h in h0]

    sim1 = build(True)
    h1 = add_box(sim1)
    sim1.run(until_after_sources=15)
    for h, d in zip(h1, inc_data):
        sim1.load_minus_flux_data(h, d)
    box1 = sum(sim1.get_fluxes(h)[0] for h in h1)

    # incident intensity from the z- entrance face of the normalization run
    p_inc_face = abs(f0[4])  # z low side flux magnitude
    area = (2 * half) ** 2
    intensity = p_inc_face / area
    sigma_sca = abs(box1) / intensity

    x_size = 2 * np.pi * fcen * r_sph
    q_mie = _mie_qsca(n_sph, x_size)
    sigma_mie = q_mie * np.pi * r_sph ** 2
    # res=14 on a sphere: expect ~15-20% discretization error
    assert sigma_sca > 0
    np.testing.assert_allclose(sigma_sca, sigma_mie, rtol=0.35)


def test_mie_lorentz_dispersive_finite():
    """Sphere with a Lorentz pole (config 4's dispersive variant): runs and
    stays finite with PML+DFT active."""
    med = mp.Medium(epsilon=2.0, E_susceptibilities=[
        mp.LorentzianSusceptibility(frequency=1.8, gamma=0.1, sigma=0.5)])
    sim = mp.Simulation(
        cell_size=mp.Vector3(3, 3, 3), resolution=10,
        geometry=[mp.Sphere(radius=0.5, center=mp.Vector3(), material=med)],
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.3),
                           component=mp.Ex, center=mp.Vector3(0, 0, -1.0),
                           size=mp.Vector3(3, 3, 0))],
        boundary_layers=[mp.PML(0.6)])
    fl = sim.add_flux(0.8, 0.2, 3,
                      mp.FluxRegion(center=mp.Vector3(0, 0, 1.0),
                                    size=mp.Vector3(1.5, 1.5, 0)))
    sim.run(until_after_sources=10)
    p = sim.get_fluxes(fl)
    assert np.all(np.isfinite(p))
    for c in ["ex", "ey", "ez"]:
        assert np.all(np.isfinite(np.asarray(sim.fields_state["f"][c])))
