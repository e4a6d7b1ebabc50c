"""Reference-API compatibility surface (python/simulation.py /
source.py / geom.py names): the free-function monitor accessors,
time-gated step functions, EigenModeSource-in-sources, Volume,
Matrix/Lattice transforms, and the output_* family."""

import os

import numpy as np
import pytest

import meep_nl_tpu as mp


def test_eigenmode_source_class_launches_mode(tmp_path):
    """EigenModeSource in Simulation(sources=[...]) must launch a
    directional waveguide mode (translated to add_eigenmode_source at
    init_sim): forward flux dominates backward by >= 20x."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(14, 6, 0), resolution=16,
        geometry=[mp.Block(center=mp.Vector3(), size=mp.Vector3(
            mp.inf, 1, mp.inf), material=mp.Medium(epsilon=9.0))],
        sources=[mp.EigenModeSource(
            mp.GaussianSource(frequency=0.25, fwidth=0.05),
            center=mp.Vector3(-3, 0, 0), size=mp.Vector3(0, 4, 0),
            eig_band=1, eig_kpoint=mp.Vector3(1, 0, 0))],
        boundary_layers=[mp.PML(1.0)])
    ff = sim.add_flux(0.25, 0.1, 3, mp.FluxRegion(
        center=mp.Vector3(3, 0, 0), size=mp.Vector3(0, 4, 0)))
    fb = sim.add_flux(0.25, 0.1, 3, mp.FluxRegion(
        center=mp.Vector3(-5.5, 0, 0), size=mp.Vector3(0, 4, 0)))
    sim.run(until_after_sources=60)
    f_fwd = np.asarray(mp.get_fluxes(ff))       # module-level accessor
    f_bwd = -np.asarray(mp.get_fluxes(fb))      # backward power flows -x
    assert list(mp.get_flux_freqs(ff))[1] == pytest.approx(0.25)
    assert f_fwd[1] > 0
    assert f_fwd[1] > 20 * abs(f_bwd[1])


def test_time_gated_step_functions():
    hits = {"at": 0, "before": 0, "after": 0, "when": 0}
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4, 0), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())],
                        boundary_layers=[mp.PML(1.0)])
    sim.run(
        mp.at_time(5.0, lambda s: hits.__setitem__("at", hits["at"] + 1)),
        mp.before_time(3.0, lambda s: hits.__setitem__(
            "before", hits["before"] + 1)),
        mp.after_time(8.0, lambda s: hits.__setitem__(
            "after", hits["after"] + 1)),
        mp.when_true(lambda s: s.meep_time() > 9.0,
                     lambda s: hits.__setitem__("when", hits["when"] + 1)),
        mp.at_every(1.0, lambda s: None),
        until=10)
    assert hits["at"] == 1
    assert hits["before"] >= 2
    assert hits["after"] >= 1
    assert 0 < hits["when"] < hits["before"] + hits["after"] + 20


def test_synchronized_magnetic_and_energy_stop():
    got = {}

    def grab(sim):
        got["sync"] = np.asarray(sim.get_array(component="hx")).copy()

    sim = mp.Simulation(cell_size=mp.Vector3(4, 4, 0), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())],
                        boundary_layers=[mp.PML(1.0)])
    sim.run(mp.at_every(4.0, mp.synchronized_magnetic(grab)), until=8)
    raw = np.asarray(sim.get_array(component="hx"))
    # synchronized H differs from the raw staggered H (half-step offset)
    assert got["sync"].shape == raw.shape
    assert np.abs(got["sync"] - raw).max() > 0
    # stop_when_energy_decayed terminates after the pulse leaves
    sim2 = mp.Simulation(cell_size=mp.Vector3(4, 4, 0), resolution=8,
                         sources=[mp.Source(
                             mp.GaussianSource(frequency=1.0, fwidth=0.5),
                             component=mp.Ez, center=mp.Vector3())],
                         boundary_layers=[mp.PML(1.0)])
    sim2.run(until=mp.stop_when_energy_decayed(dt=2.0, decay_by=1e-6))
    assert 8 < sim2.meep_time() < 200


def test_output_family_writes_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4, 0), resolution=8,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())],
                        boundary_layers=[mp.PML(1.0)])
    sim.run(mp.at_every(3.0, mp.output_efield_z, mp.output_poynting_x,
                        mp.output_dpwr, mp.output_tot_pwr,
                        mp.output_png("ez")),
            until=6)
    names = sorted(os.listdir(tmp_path))
    assert any(n.startswith("ez-") and n.endswith(".npy") for n in names)
    assert any(n.startswith("sx-") for n in names)
    assert any(n.startswith("dpwr-") for n in names)
    assert any(n.startswith("tot_pwr-") for n in names)
    assert any(n.endswith(".png") for n in names)
    dp = np.load([str(tmp_path / n) for n in names
                  if n.startswith("dpwr-")][0])
    assert np.all(dp >= 0) and dp.max() > 0


def test_volume_matrix_lattice_misc():
    v = mp.Volume(center=mp.Vector3(1, 0, 0), size=mp.Vector3(2, 2, 0))
    assert v.pt_in_volume(mp.Vector3(1.5, 0.5, 0))
    assert not v.pt_in_volume(mp.Vector3(3, 0, 0))
    c, s = mp.get_center_and_size(v)
    assert c.x == 1 and s.y == 2
    m = mp.get_rotation_matrix(mp.Vector3(z=1), np.pi / 2)
    r = m * mp.Vector3(1, 0, 0)
    assert abs(r.y - 1) < 1e-12
    assert abs((m * m.inverse()).m - np.eye(3)).max() < 1e-12
    ks = mp.interpolate(3, [mp.Vector3(), mp.Vector3(1, 0, 0)])
    assert len(ks) == 5 and abs(ks[2].x - 0.5) < 1e-12
    # symmetry base classes + identity accepted
    sim = mp.Simulation(cell_size=mp.Vector3(2, 2, 0), resolution=8,
                        symmetries=[mp.Identity()],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=1.0, fwidth=0.5),
                            component=mp.Ez, center=mp.Vector3())])
    assert isinstance(mp.Mirror("y"), mp.Symmetry)
    bp = mp.BinaryPartition()
    assert bp.numchunks() == 1
    sim.run(until=1)
    assert np.isfinite(np.asarray(sim.fields_state["f"]["ez"])).all()


def test_flux_data_scale_save_load(tmp_path):
    """scale_flux_fields(-1) == load_minus after load; npz save/load
    round trip preserves the accumulators."""
    def make():
        sim = mp.Simulation(cell_size=mp.Vector3(6, 6, 0), resolution=10,
                            sources=[mp.Source(
                                mp.GaussianSource(frequency=1.0,
                                                  fwidth=0.5),
                                component=mp.Ez, center=mp.Vector3(-1, 0))],
                            boundary_layers=[mp.PML(1.0)])
        fl = sim.add_flux(1.0, 0.2, 3, mp.FluxRegion(
            center=mp.Vector3(1.5, 0), size=mp.Vector3(0, 3)))
        return sim, fl

    sim, fl = make()
    sim.run(until=20)
    base = np.asarray(sim.get_fluxes(fl))
    assert np.abs(base).max() > 0
    data = sim.get_flux_data(fl)
    fname = str(tmp_path / "norm")
    sim.save_flux(fname, fl)

    # scale by -1 flips the stored fields; flux is QUADRATIC in them,
    # so get_fluxes is unchanged (that's why load_minus_flux == load_flux
    # + scale(-1) subtracts when the second run accumulates on top)
    mp.scale_flux_fields(-1.0, fl)
    np.testing.assert_allclose(np.asarray(sim.get_fluxes(fl)), base,
                               rtol=1e-6)
    d1 = sim.get_flux_data(fl)
    for k in data:
        np.testing.assert_allclose(d1[k], -data[k], atol=1e-12)
    # complex scale: 1j rotates re/im; |flux| magnitude-preserving for
    # the quadratic flux assembly up to cross terms -> just check the
    # accumulators rotated exactly
    sim.load_flux_data(fl, data)
    mp.scale_flux_fields(1j, fl)
    d2 = sim.get_flux_data(fl)
    for k in data:
        np.testing.assert_allclose(d2[k][..., 0], -data[k][..., 1],
                                   atol=1e-12)
        np.testing.assert_allclose(d2[k][..., 1], data[k][..., 0],
                                   atol=1e-12)

    # fresh sim: load from file, then load_minus_flux zeroes it
    sim2, fl2 = make()
    sim2.init_sim()
    sim2.load_flux(fname, fl2)
    np.testing.assert_allclose(np.asarray(sim2.get_fluxes(fl2)), base,
                               rtol=1e-6)
    snap = sim2.get_flux_data(fl2)
    sim2.load_minus_flux_data(fl2, snap)
    for k in snap:
        np.testing.assert_allclose(
            np.asarray(sim2.get_flux_data(fl2)[k]), 0.0, atol=1e-14)
