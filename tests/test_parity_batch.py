"""Round-2 parity batch: PMC (Magnetic) boundaries, per-block NaN abort,
instantaneous synchronized flux/energy, step-rate progress plumbing.

References: meep.hpp:1609/1776 (boundary_condition, set_boundary),
step.cpp:138 (NaN abort), energy_and_flux.cpp:54/217 + meep.hpp:2209
(field_energy_in_box / flux_in_box / synchronize_magnetic_fields),
step.cpp:49-56 (progress line)."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def _cavity_1d(cond):
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 8), resolution=16,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.5, fwidth=0.3),
                            component=mp.Ex, center=mp.Vector3(0, 0, -1.3))])
    if cond is not None:
        sim.set_boundary(mp.Low, mp.Z, cond)
        sim.set_boundary(mp.High, mp.Z, cond)
    sim.run(until=40)
    ex = np.asarray(sim.get_array(component=mp.Ex)).real
    hy = np.asarray(sim.get_array(component=mp.Hy)).real
    return ex, hy


def test_pmc_walls_flip_the_node_condition():
    """PEC: tangential E vanishes at the wall (E node).  PMC: tangential E
    has an antinode, and it is H that vanishes there."""
    ex_pec, _ = _cavity_1d(None)              # default = Metallic
    ex_pmc, hy_pmc = _cavity_1d(mp.Magnetic)
    scale_pec = np.abs(ex_pec).max()
    scale_pmc = np.abs(ex_pmc).max()
    assert scale_pec > 0 and scale_pmc > 0
    # PEC: Ex == 0 exactly on both boundary planes
    assert abs(ex_pec[0]) < 1e-12 * scale_pec
    assert abs(ex_pec[-1]) < 1e-12 * scale_pec
    # PEC keeps tangential H alive at the half-layer; PMC kills it there
    # (the PMC mirror sits at z = dz/2, boundaries.cpp:191: corner+1)
    _, hy_pec = _cavity_1d(None)
    assert abs(hy_pec[0]) > 1e-3 * scale_pec
    assert abs(hy_pmc[0]) < 1e-12 * scale_pmc
    assert abs(hy_pmc[-2]) < 1e-12 * scale_pmc
    # PMC: Ex near the wall (first coupled plane, z = dz) is antinode-like,
    # NOT pinned; under PEC the same plane is next to a node and smaller
    assert abs(ex_pmc[1]) > 1e-2 * scale_pmc
    assert np.all(np.isfinite(ex_pmc)) and np.all(np.isfinite(hy_pmc))


def test_pmc_2d_tangential_h_zero_on_wall():
    """2D TM (Ez, Hx, Hy) with x-normal PMC walls: Hy (staggered along x)
    is zeroed on the half-offset layer next to each wall; Ez is free there
    (no PEC node)."""
    sim = mp.Simulation(cell_size=mp.Vector3(6, 6), resolution=16,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.8, fwidth=0.4),
                            component=mp.Ez, center=mp.Vector3(0.4, -0.3))])
    sim.set_boundary(mp.Low, mp.X, mp.Magnetic)
    sim.set_boundary(mp.High, mp.X, mp.Magnetic)
    sim.run(until=25)
    hy = np.asarray(sim.get_array(component=mp.Hy)).real
    ez = np.asarray(sim.get_array(component=mp.Ez)).real
    scale = np.abs(ez).max()
    assert scale > 0
    assert np.abs(hy[0, :]).max() < 1e-12 * scale
    assert np.abs(hy[-2, :]).max() < 1e-12 * scale
    # the x=0 plane is outside the half-layer PMC mirror (decoupled); the
    # first coupled Ez plane (x=dx) must be free, not a PEC node
    assert np.abs(ez[1, :]).max() > 1e-4 * scale


def test_nan_abort():
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())])
    sim.init_sim()
    bad = np.asarray(sim.fields_state["f"]["ez"]).copy()
    bad[bad.shape[0] // 2, bad.shape[1] // 2] = np.nan
    import jax.numpy as jnp
    sim.fields_state["f"]["ez"] = jnp.asarray(bad)
    with pytest.raises(RuntimeError, match="NaN or Inf"):
        sim.run(until=2)


def test_poynting_theorem_1d_pulse():
    """Poynting's theorem: the energy lost by a box equals the
    time-integrated net instantaneous flux through its surfaces
    (field_energy_in_box + flux_in_box with synchronized H,
    energy_and_flux.cpp:54/217)."""
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 24), resolution=16,
                        boundary_layers=[mp.PML(2.0)],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=2.0),
                            component=mp.Ex, center=mp.Vector3())])
    sim.run(until=7)   # source off; the two pulses sit near z = +-7
    box = dict(center=mp.Vector3(), size=mp.Vector3(0, 0, 16))
    e1 = sim.field_energy_in_box(**box)
    assert e1 > 0
    out = 0.0
    nsub = 4
    for _ in range(64):   # 8 time units: pulses cross z=+-8 into the PML
        f_hi = sim.flux_in_box(mp.Z, center=mp.Vector3(0, 0, 8),
                               size=mp.Vector3())
        f_lo = sim.flux_in_box(mp.Z, center=mp.Vector3(0, 0, -8),
                               size=mp.Vector3())
        out += (f_hi - f_lo) * sim.dt * nsub
        sim.step(nsub)
    e2 = sim.field_energy_in_box(**box)
    lost = e1 - e2
    assert lost > 0.5 * e1          # most of the energy left the box
    assert abs(out - lost) < 0.1 * lost, (e1, e2, out)


def test_energy_split_electric_magnetic():
    """For a traveling EM pulse in vacuum, electric and magnetic energies
    are equal (to discretization error)."""
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 24), resolution=32,
                        boundary_layers=[mp.PML(2.0)],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.4),
                            component=mp.Ex, center=mp.Vector3(0, 0, -8))])
    sim.run(until=14)
    ue = sim.electric_energy_in_box()
    um = sim.magnetic_energy_in_box()
    assert ue > 0 and um > 0
    assert abs(ue - um) / (ue + um) < 0.02, (ue, um)
