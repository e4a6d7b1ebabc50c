"""Frequency-domain energy monitor (dft_energy analog)."""

import numpy as np

import meep_nl_tpu as mp


def test_energy_positive_and_partitioned():
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8), resolution=12,
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.3),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    en = sim.add_energy(1.0, 0.2, 3,
                        mp.FluxRegion(center=mp.Vector3(),
                                      size=mp.Vector3(3, 3)))
    sim.run(until_after_sources=20)
    ue = sim.get_electric_energy(en)
    um = sim.get_magnetic_energy(en)
    ut = sim.get_total_energy(en)
    assert np.all(ue > 0) and np.all(um > 0)
    np.testing.assert_allclose(ut, ue + um, rtol=1e-6)
    # same order (near fields of a 2D line source are H-heavy; exact
    # equipartition only holds for pure radiation)
    np.testing.assert_allclose(ue, um, rtol=0.5)
    # spectrum peaks at the source center frequency
    assert np.argmax(ut) == 1
