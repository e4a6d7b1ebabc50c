"""Near-to-far transformation vs directly-propagated fields (analog of
tests/near2far.cpp: fields from equivalence must match the actual fields)."""

import numpy as np

import meep_nl_tpu as mp


def test_n2f_matches_direct_field_2d():
    """Ez point source; far field predicted from a near box must match the
    directly measured DTFT at the same (in-cell) far point."""
    fcen, df = 1.0, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(16, 16), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    half = 1.5
    n2f = sim.add_near2far(
        fcen, df, 3,
        mp.Near2FarRegion(center=mp.Vector3(half, 0), size=mp.Vector3(0, 2 * half)),
        mp.Near2FarRegion(center=mp.Vector3(-half, 0), size=mp.Vector3(0, 2 * half),
                          weight=-1.0),
        mp.Near2FarRegion(center=mp.Vector3(0, half), size=mp.Vector3(2 * half, 0)),
        mp.Near2FarRegion(center=mp.Vector3(0, -half), size=mp.Vector3(2 * half, 0),
                          weight=-1.0))
    far_pt = mp.Vector3(4.2, 2.3)
    direct = sim.add_dft_fields([mp.Ez], fcen, df, 3, center=far_pt,
                                size=mp.Vector3())
    sim.run(until_after_sources=30)

    eh = sim.get_farfield(n2f, far_pt)          # (6, nfreq)
    ez_pred = eh[2]
    ez_meas = sim.get_dft_array(direct, mp.Ez).reshape(-1, 3).sum(axis=0)
    # complex match (amplitude and phase): a few percent at the center
    # frequency; the band edges carry ~200x less source power so their
    # relative error is discretization-noise dominated
    err = np.abs(ez_pred - ez_meas) / np.abs(ez_meas)
    assert err[1] < 0.05, (ez_pred, ez_meas, err)
    assert np.all(err < 0.2), err


def test_n2f_azimuthal_symmetry():
    """A point Ez source's far field must be azimuthally symmetric."""
    fcen, df = 1.0, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    half = 1.5
    n2f = sim.add_near2far(
        fcen, df, 1,
        mp.Near2FarRegion(center=mp.Vector3(half, 0), size=mp.Vector3(0, 2 * half)),
        mp.Near2FarRegion(center=mp.Vector3(-half, 0), size=mp.Vector3(0, 2 * half),
                          weight=-1.0),
        mp.Near2FarRegion(center=mp.Vector3(0, half), size=mp.Vector3(2 * half, 0)),
        mp.Near2FarRegion(center=mp.Vector3(0, -half), size=mp.Vector3(2 * half, 0),
                          weight=-1.0))
    sim.run(until_after_sources=30)
    R = 100.0
    vals = []
    for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eh = sim.get_farfield(n2f, mp.Vector3(R * np.cos(th), R * np.sin(th)))
        vals.append(abs(eh[2, 0]))
    vals = np.array(vals)
    assert vals.min() > 0
    np.testing.assert_allclose(vals, vals.mean(), rtol=0.02)
