"""End-to-end Simulation API: the straight-waveguide tutorial config
(BASELINE.json config 1; python/examples/straight-waveguide.py)."""

import numpy as np

import meep_nl_tpu as mp


def test_epsilon_rasterization():
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8),
        resolution=10,
        geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                           center=mp.Vector3(),
                           material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.ContinuousSource(frequency=0.15),
                           component=mp.Ez, center=mp.Vector3(-3, 0))],
        boundary_layers=[mp.PML(1.0)],
        force_all_components=False)
    sim.init_sim()
    eps = sim.get_epsilon()
    # waveguide core must be 12, cladding 1
    n = eps.shape[1] // 2
    assert abs(eps[eps.shape[0] // 2, n] - 12) < 0.5
    assert abs(eps[eps.shape[0] // 2, 5] - 1) < 1e-6
    # interface rows are smoothed between 1 and 12
    assert eps.min() >= 1.0 - 1e-6
    assert eps.max() <= 12.0 + 1e-6


def test_straight_waveguide_cw_steady_state():
    """CW source in a straight waveguide: field reaches steady state and is
    guided (decays transversely)."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(16, 8),
        resolution=10,
        geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                           center=mp.Vector3(),
                           material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.ContinuousSource(frequency=0.15, width=20),
                           component=mp.Ez, center=mp.Vector3(-7, 0))],
        boundary_layers=[mp.PML(1.0)])
    sim.run(until=200)
    ez = sim.get_array(component=mp.Ez)
    assert np.all(np.isfinite(ez))
    # guided: on-axis amplitude downstream far exceeds off-axis
    x = sim.gv.comp_coords("ez", 0)
    y = sim.gv.comp_coords("ez", 1)
    ix = int(np.argmin(np.abs(x - 5.0)))
    iy0 = int(np.argmin(np.abs(y - 0.0)))
    iy_off = int(np.argmin(np.abs(y - 2.5)))
    on_axis = abs(ez[ix, iy0])
    off_axis = abs(ez[ix, iy_off])
    assert on_axis > 1e-4
    assert on_axis > 5 * off_axis


def test_flux_normalization_run():
    """Two flux planes in a waveguide transmit equal power (loss-free)."""
    def make():
        return mp.Simulation(
            cell_size=mp.Vector3(16, 8),
            resolution=10,
            geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                               center=mp.Vector3(),
                               material=mp.Medium(epsilon=12))],
            sources=[mp.Source(mp.GaussianSource(frequency=0.15, fwidth=0.1),
                               component=mp.Ez, center=mp.Vector3(-6, 0),
                               size=mp.Vector3(0, 3))],
            boundary_layers=[mp.PML(1.0)])

    sim = make()
    f1 = sim.add_flux(0.15, 0.08, 5,
                      mp.FluxRegion(center=mp.Vector3(0, 0),
                                    size=mp.Vector3(0, 4)))
    f2 = sim.add_flux(0.15, 0.08, 5,
                      mp.FluxRegion(center=mp.Vector3(5, 0),
                                    size=mp.Vector3(0, 4)))
    sim.run(until_after_sources=80)
    p1 = sim.get_fluxes(f1)
    p2 = sim.get_fluxes(f2)
    assert np.all(p1 > 0)
    np.testing.assert_allclose(p2 / p1, 1.0, atol=0.02)


def test_get_field_point_and_time():
    sim = mp.Simulation(
        cell_size=mp.Vector3(4, 4), resolution=10,
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez, center=mp.Vector3())])
    sim.run(until=5)
    assert sim.meep_time() == 5.0
    v = sim.get_field_point(mp.Ez, mp.Vector3(0.5, 0.5))
    assert np.isfinite(v)
