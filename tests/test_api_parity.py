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


def _tm_sim():
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 6), resolution=10,
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    sim.run(until=3)
    return sim


def test_derived_poynting_array():
    """get_array(Sx) == the monitor.cpp:75 combination of the stored
    components; on a 2D TM cell only the -Re{conj(Ez) Hy} term exists."""
    sim = _tm_sim()
    def crop(a, b):
        sl = tuple(slice(0, min(na, nb)) for na, nb in zip(a.shape, b.shape))
        return a[sl], b[sl]

    sx = sim.get_array(mp.Sx)
    ez = sim.get_array(mp.Ez)
    hy = sim.get_array(mp.Hy)
    e1, h1 = crop(ez, hy)
    assert np.allclose(sx, -np.real(np.conj(e1) * h1), atol=1e-12)
    sy = sim.get_array(mp.Sy)
    hx = sim.get_array(mp.Hx)
    e2, h2 = crop(ez, hx)
    assert np.allclose(sy, np.real(np.conj(e2) * h2), atol=1e-12)
    assert np.abs(sx).max() > 0


def test_derived_energy_density_array():
    """EnergyDensity = (E.D + H.B)/2 assembled from the same slices;
    the D/H-only variants partition it (monitor.cpp:107-121)."""
    sim = _tm_sim()
    u = sim.get_array(mp.EnergyDensity)
    ue = sim.get_array(mp.D_EnergyDensity)
    uh = sim.get_array(mp.H_EnergyDensity)
    sl = tuple(slice(0, min(a, b, c))
               for a, b, c in zip(u.shape, ue.shape, uh.shape))
    assert np.allclose(u[sl], ue[sl] + uh[sl], atol=1e-12)
    ez, dz = sim.get_array(mp.Ez), sim.get_array(mp.Dz)
    n = min(ue.shape[0], u.shape[0])
    assert np.allclose(ue, 0.5 * np.real(np.conj(ez) * dz), atol=1e-12)
    assert u.min() >= -1e-12 and u.max() > 0


def test_component_field_accessors():
    """get_{e,h,s}field[_x] family (simulation.py:4670-4745): vector
    stacks on a trailing axis; absent components read as zeros."""
    sim = _tm_sim()
    E = sim.get_efield()
    assert E.shape[-1] == 3
    assert np.abs(E[..., 2]).max() > 0          # ez lives
    assert np.abs(E[..., 0]).max() == 0          # ex absent on TM
    assert np.allclose(sim.get_efield_z(), sim.get_array(mp.Ez))
    assert np.allclose(sim.get_hfield_x(), sim.get_array(mp.Hx))
    # the vector/per-direction S accessors synchronize H onto E's time
    # grid (fields::synchronize_magnetic_fields); they must agree with
    # each other and be nontrivial
    S = sim.get_sfield()
    assert S.shape[-1] == 3
    sx = sim.get_sfield_x()
    sl = tuple(slice(0, n) for n in sx.shape)
    assert np.allclose(S[..., 0][sl], sx, atol=1e-9)
    assert np.isfinite(S).all()


def test_derived_field_point():
    """get_field_point on a derived component matches the constituent
    interpolations at the same point."""
    sim = _tm_sim()
    pt = mp.Vector3(0.55, -0.35)
    ez = sim.get_field_point(mp.Ez, pt)
    hy = sim.get_field_point(mp.Hy, pt)
    hx = sim.get_field_point(mp.Hx, pt)
    sx = sim.get_field_point(mp.Sx, pt)
    assert abs(sx - (-(np.conj(ez) * hy).real)) < 1e-12
    sy = sim.get_field_point(mp.Sy, pt)
    assert abs(sy - (np.conj(ez) * hx).real) < 1e-12
