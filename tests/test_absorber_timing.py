"""Absorber boundary layers and timing accounting."""

import numpy as np

import meep_nl_tpu as mp


def test_absorber_damps_like_pml():
    def residual(layers):
        sim = mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=12,
                            sources=[mp.Source(
                                mp.GaussianSource(frequency=1.0, fwidth=0.5),
                                component=mp.Ez, center=mp.Vector3())],
                            boundary_layers=layers)
        sim.run(until=40)
        ez = np.asarray(sim.fields_state["f"]["ez"])
        return float(np.sum(np.abs(ez) ** 2))

    e_none = residual([])
    e_abs = residual([mp.Absorber(2.0)])
    assert e_abs < e_none * 1e-3, (e_abs, e_none)


def test_timing_accounting():
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())])
    sim.run(until=5)
    assert sim.time_spent_on("stepping") > 0


def test_get_array_metadata():
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())])
    coords, w = sim.get_array_metadata(component=mp.Ez,
                                       center=mp.Vector3(0, 0),
                                       size=mp.Vector3(2, 1))
    arr = sim.get_array(component=mp.Ez, center=mp.Vector3(0, 0),
                        size=mp.Vector3(2, 1))
    assert w.shape == arr.shape
    assert len(coords[0]) == arr.shape[0]
