"""User-defined materials (reference python/tests/
test_user_defined_material.py): material_function / epsilon_func on the
Simulation, per-object epsilon functions, and get_epsilon_grid
(meepgeom.cpp:2728)."""

import numpy as np
import pytest

import meep_nl_tpu as mnt


def _eps_func(p):
    return 1.0 + 2.0 * (p.x ** 2 + p.y ** 2 <= 0.5 ** 2)


def _mat_func(p):
    return mnt.Medium(epsilon=1.0 + 2.0 * (p.x ** 2 + p.y ** 2 <= 0.5 ** 2))


def _ref_sim(**kw):
    return mnt.Simulation(
        cell_size=mnt.Vector3(2.0, 2.0), resolution=8,
        sources=[mnt.Source(mnt.GaussianSource(1.0, fwidth=0.4),
                            component=mnt.Ez, center=mnt.Vector3(0.7, 0))],
        boundary_layers=[mnt.PML(0.25)], eps_averaging=False, **kw)


def test_epsilon_func_matches_geometry():
    """A cylinder defined by epsilon_func must reproduce the same
    structure (and fields) as the equivalent geometry object without
    smoothing."""
    sim_f = _ref_sim(epsilon_func=_eps_func)
    sim_g = _ref_sim(geometry=[mnt.Cylinder(radius=0.5, height=mnt.inf,
                                            material=mnt.Medium(epsilon=3.0))])
    e_f = np.asarray(sim_f.get_epsilon())
    e_g = np.asarray(sim_g.get_epsilon())
    np.testing.assert_allclose(e_f, e_g)
    sim_f.run(until=3.0)
    sim_g.run(until=3.0)
    a = np.asarray(sim_f.get_array(mnt.Ez))
    b = np.asarray(sim_g.get_array(mnt.Ez))
    np.testing.assert_allclose(a, b, atol=1e-7 * np.abs(b).max())


def test_material_function_medium():
    """material_function returning a Medium (epsilon + conductivity)."""
    def f(p):
        return mnt.Medium(epsilon=2.0 if p.x > 0 else 1.0,
                          D_conductivity=0.5 if p.x > 0 else 0.0)
    sim = _ref_sim(material_function=f)
    sim.init_sim()
    eps = np.asarray(sim.get_epsilon())
    assert eps.max() == pytest.approx(2.0) and eps.min() == pytest.approx(1.0)
    assert "dz:cnd" in sim._plan.coefs
    sim.run(until=3.0)   # runs (lossy half-space attenuates)
    assert np.isfinite(np.asarray(sim.get_array(mnt.Ez))).all()


def test_object_epsilon_func():
    """A geometry object whose material is a callable: the function is
    sampled only inside the object."""
    def inner(p):
        return 4.0
    sim = _ref_sim(geometry=[mnt.Block(center=mnt.Vector3(),
                                       size=mnt.Vector3(0.6, 0.6, mnt.inf),
                                       material=inner)])
    eps = np.asarray(sim.get_epsilon())
    assert eps.max() == pytest.approx(4.0)
    n4 = (eps > 3.9).sum()
    assert 0 < n4 < eps.size // 4     # confined to the block


def test_get_epsilon_grid():
    """get_epsilon_grid interpolates the simulation's own smoothed
    epsilon; on-lattice queries reproduce get_epsilon exactly."""
    sim = _ref_sim(geometry=[mnt.Cylinder(radius=0.5, height=mnt.inf,
                                          material=mnt.Medium(epsilon=3.0))])
    eps = np.asarray(sim.get_epsilon())
    # ez lattice coords (integer offsets in x/y at res 8, cell 2)
    xs = -1.0 + np.arange(eps.shape[0]) / 8.0
    ys = -1.0 + np.arange(eps.shape[1]) / 8.0
    grid = sim.get_epsilon_grid(xs, ys, [0.0])
    assert grid.shape == (len(xs), len(ys), 1)
    np.testing.assert_allclose(grid[:, :, 0], eps, rtol=1e-6)
    # off-lattice: midpoint of a uniform region interpolates exactly
    g2 = sim.get_epsilon_grid([0.0625], [0.0], [0.0])
    assert g2[0, 0, 0] == pytest.approx(3.0)


def test_medium_evaluations():
    """Medium.epsilon(freq) / Medium.mu(freq) dispersive tensor
    evaluations (reference test_medium_evaluations): Lorentz pole,
    Drude pole, conductivity, and the scalar/arithmetic duality."""
    m = mnt.Medium(epsilon=2.25,
                   E_susceptibilities=[
                       mnt.LorentzianSusceptibility(frequency=1.1,
                                                    gamma=1e-5,
                                                    sigma=0.5)])
    # arithmetic duality: the field still behaves as a float
    assert float(m.epsilon) == 2.25 and m.epsilon + 1 == 3.25
    e = m.epsilon(0.5)
    assert e.shape == (3, 3)
    chi = 0.5 * 1.1 ** 2 / (1.1 ** 2 - 0.5 ** 2 - 1j * 0.5 * 1e-5)
    assert abs(e[0, 0] - (2.25 + chi)) < 1e-10
    freqs = np.linspace(0.2, 0.8, 5)
    eN = m.epsilon(freqs)
    assert eN.shape == (5, 3, 3)
    # Drude + conductivity
    md = mnt.Medium(epsilon=1.0, D_conductivity=0.3,
                    E_susceptibilities=[
                        mnt.DrudeSusceptibility(frequency=1.0, gamma=0.05,
                                                sigma=1.0)])
    ed = md.epsilon(0.7)
    chid = 1.0 / (-0.7 ** 2 - 1j * 0.7 * 0.05)
    assert abs(ed[1, 1] - (1.0 + chid + 1j * 0.3 / 0.7)) < 1e-10
    # permeability
    mm = mnt.Medium(mu=1.5)
    assert float(mm.mu) == 1.5
    assert abs(mm.mu(1.0)[2, 2] - 1.5) < 1e-12
    # a library medium evaluates to its published dispersion shape
    from meep_nl_tpu import materials as lib
    if hasattr(lib, "Si"):
        eSi = lib.Si.epsilon(1 / 1.55)      # 1550 nm
        assert 11.5 < eSi[0, 0].real < 12.6
