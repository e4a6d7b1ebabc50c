"""API-parity batch: initialize_field (initialize.cpp), field-function
integrals (integrate.cpp), IndexedSource (python/source.py:1081),
epsilon_input_file (meepgeom epsilon input), verbosity shim."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def test_initialize_field_oscillates():
    """A seeded PEC-cavity eigenmode rings at its analytic frequency:
    |Ex(t)| = |cos(w t)| with w = pi/L * c."""
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 4), resolution=16,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.5, fwidth=0.2),
                            component=mp.Ex, center=mp.Vector3(0, 0, 0.5),
                            amplitude=0.0)])
    sim.initialize_field(mp.Ex, lambda p: np.cos(np.pi * p.z / 4))
    assert abs(np.abs(np.asarray(sim.get_array(component=mp.Ex))).max()
               - 1.0) < 1e-3
    sim.run(until=3)
    amp = np.abs(np.asarray(sim.get_array(component=mp.Ex))).max()
    # w = pi/4: |cos(3 pi/4)| = 0.7071
    assert abs(amp - abs(np.cos(3 * np.pi / 4))) < 0.05, amp


def test_integrate_field_function():
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 4), resolution=16,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.5, fwidth=0.2),
                            component=mp.Ex, center=mp.Vector3(0, 0, 0.5),
                            amplitude=0.0)])
    sim.initialize_field(mp.Ex, lambda p: np.cos(np.pi * p.z / 4))
    # int cos^2(pi z / 4) dz over [-2, 2] = 2
    val = sim.integrate_field_function([mp.Ex],
                                       lambda ex: np.abs(ex) ** 2)
    assert abs(val.real - 2.0) < 0.05, val


def test_indexed_source():
    idx = np.array([[32]], np.int32)
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 4), resolution=16,
                        sources=[mp.IndexedSource(
                            mp.GaussianSource(frequency=0.5, fwidth=0.2),
                            mp.Ex, idx, np.array([1.0 + 0j]))],
                        boundary_layers=[mp.PML(1.0)])
    sim.run(until=8)
    assert np.abs(np.asarray(sim.get_array(component=mp.Ex))).max() > 1e-5


def test_epsilon_input_file(tmp_path):
    import h5py
    eps = np.ones((33, 33))
    eps[:, 16:] = 12.0
    path = str(tmp_path / "epsin.h5")
    with h5py.File(path, "w") as f:
        f["eps"] = eps
    sim = mp.Simulation(cell_size=mp.Vector3(2, 2), resolution=16,
                        epsilon_input_file=path,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.8, fwidth=0.3),
                            component=mp.Ez, center=mp.Vector3(0, -0.5))],
                        boundary_layers=[mp.PML(0.4)], eps_averaging=False)
    sim.init_sim()
    grid = np.asarray(sim.get_epsilon())
    assert grid.max() > 11 and grid.min() < 1.5
    # geometry objects overlay the file background
    sim2 = mp.Simulation(cell_size=mp.Vector3(2, 2), resolution=16,
                         epsilon_input_file=path,
                         geometry=[mp.Cylinder(radius=0.3,
                                               material=mp.Medium(epsilon=4))],
                         sources=[mp.Source(
                             mp.GaussianSource(frequency=0.8, fwidth=0.3),
                             component=mp.Ez, center=mp.Vector3(0, -0.5))],
                         eps_averaging=False)
    sim2.init_sim()
    g2 = np.asarray(sim2.get_epsilon())
    n = g2.shape[0] // 2
    assert abs(g2[n, n] - 4.0) < 0.5


def test_verbosity():
    assert mp.verbosity(2) == 2
    assert mp.verbosity.meep == 2
    mp.verbosity.set(1)
    assert mp.verbosity.meep == 1
