"""Simulation method parity tail (python/simulation.py methods):
behavioral gates for the round-3 method-name sweep — every public
Simulation method of the reference resolves AND the stateful ones act."""

import os

import numpy as np
import pytest

import meep_nl_tpu as mp


def test_method_name_parity():
    import ast
    ref = "/root/reference/python/simulation.py"
    if not os.path.isfile(ref):
        pytest.skip("reference tree not present")
    tree = ast.parse(open(ref).read())
    names = [m.name for node in tree.body
             if isinstance(node, ast.ClassDef) and node.name == "Simulation"
             for m in node.body
             if isinstance(m, ast.FunctionDef)
             and not m.name.startswith("_")]
    missing = [n for n in names if not hasattr(mp.Simulation, n)]
    assert not missing, missing


def _sim(**kw):
    return mp.Simulation(
        cell_size=mp.Vector3(6, 6), resolution=8,
        geometry=[mp.Cylinder(1.0, material=mp.Medium(epsilon=4.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3(1, 0))],
        boundary_layers=[mp.PML(1.0)], **kw)


def test_clock_and_memory():
    sim = _sim()
    sim.run(until=2.0)
    assert sim.timestep() == round(2.0 / sim.dt)
    assert sim.round_time() == pytest.approx(sim.meep_time())
    assert sim.get_estimated_memory_usage() > 1000
    assert len(sim.get_estimated_costs()) >= 1
    assert sim.get_max_chunk_communication_area() >= 0
    assert sim.get_avg_chunk_communication_area() >= 0


def test_using_real_fields_and_has_mu():
    assert _sim().using_real_fields()
    assert not _sim(k_point=mp.Vector3(0.3, 0)).using_real_fields()
    assert not _sim().has_mu()
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                        geometry=[mp.Block(size=mp.Vector3(1, 1),
                                           material=mp.Medium(
                                               epsilon=2, mu=3))])
    assert sim.has_mu()
    assert sim.require_dimensions() == 2


def test_restart_fields_keeps_dft():
    sim = _sim()
    fl = sim.add_flux(0.8, 0.2, 2, mp.FluxRegion(center=mp.Vector3(-2, 0),
                                                 size=mp.Vector3(0, 2)))
    sim.run(until=4.0)
    flux0 = np.asarray(mp.get_fluxes(fl)).copy()
    assert np.any(flux0 != 0)
    sim.restart_fields()
    assert sim.timestep() == 0
    ez = np.asarray(sim.get_array(component="ez"))
    assert np.all(ez == 0)
    assert np.allclose(np.asarray(mp.get_fluxes(fl)), flux0)


def test_reset_meep_and_clear_dft():
    sim = _sim()
    sim.add_flux(0.8, 0.2, 2, mp.FluxRegion(center=mp.Vector3(-2, 0),
                                            size=mp.Vector3(0, 2)))
    sim.run(until=2.0)
    sim.reset_meep()
    assert sim._plan is None and sim._state is None
    sim2 = _sim()
    sim2.add_flux(0.8, 0.2, 2, mp.FluxRegion(center=mp.Vector3(-2, 0),
                                             size=mp.Vector3(0, 2)))
    sim2.run(until=2.0)
    ez_before = np.asarray(sim2.get_array(component="ez")).copy()
    sim2.clear_dft_monitors()
    assert not sim2._state["dft"]
    ez_after = np.asarray(sim2.get_array(component="ez"))
    assert np.allclose(ez_after, ez_before)


def test_change_sources_preserves_fields():
    sim = _sim()
    sim.run(until=2.0)
    ez0 = np.asarray(sim.get_array(component="ez")).copy()
    assert np.abs(ez0).max() > 0
    sim.change_sources([mp.Source(
        mp.ContinuousSource(frequency=0.5), component=mp.Ez,
        center=mp.Vector3(-1, 0))])
    ez1 = np.asarray(sim.get_array(component="ez"))
    assert np.allclose(ez1, ez0)
    sim.run(until=1.0)
    assert np.abs(np.asarray(sim.get_array(component="ez"))).max() > 0


def test_set_materials_and_set_epsilon():
    sim = _sim()
    sim.init_sim()
    eps0 = np.real(np.asarray(sim.get_epsilon())).max()
    assert eps0 > 3.0
    sim.set_materials(geometry=[])
    eps1 = np.real(np.asarray(sim.get_epsilon())).max()
    assert eps1 == pytest.approx(1.0)
    n = 20
    sim.set_epsilon(np.full((n, n), 2.5))
    eps2 = np.real(np.asarray(sim.get_epsilon()))
    assert np.allclose(eps2, 2.5, atol=1e-6)


def test_phase_in_material_morphs_epsilon():
    a = _sim()
    b = mp.Simulation(cell_size=mp.Vector3(6, 6), resolution=8,
                      geometry=[mp.Cylinder(1.0, material=mp.Medium(
                          epsilon=9.0))],
                      sources=a.sources, boundary_layers=[mp.PML(1.0)])
    a.init_sim()
    b.init_sim()
    a.phase_in_material(b, time=2.0, nstages=4)
    eps = np.real(np.asarray(a.get_epsilon())).max()
    assert eps == pytest.approx(9.0, rel=1e-3)


def test_point_queries():
    sim = _sim()
    sim.init_sim()
    assert sim.get_epsilon_point(mp.Vector3()) == pytest.approx(4.0,
                                                                rel=0.1)
    assert sim.get_epsilon_point(mp.Vector3(2.5, 2.5)) == pytest.approx(
        1.0, rel=0.05)
    assert sim.get_mu_point(mp.Vector3()) == pytest.approx(1.0)
    # dispersive query routes through Medium.epsilon(freq)
    assert sim.get_epsilon_point(mp.Vector3(), frequency=1.0).real == \
        pytest.approx(4.0, rel=1e-6)


def test_field_getters_and_power():
    sim = _sim()
    sim.run(until=3.0)
    E = sim.get_efield()
    assert E.shape[-1] == 3 and np.abs(E[..., 2]).max() > 0
    assert np.abs(sim.get_efield_z()).max() > 0
    S = sim.get_sfield()
    assert S.shape[-1] == 3
    assert np.isfinite(sim.get_sfield_x()).all()
    assert sim.get_dpwr().max() > 0
    assert sim.get_tot_pwr().max() >= sim.get_dpwr().max()
    mv = sim.modal_volume_in_box()
    assert 0 < mv < 36.0


def test_get_source_and_slice_dims():
    sim = _sim()
    sim.init_sim()
    sim.step(3)
    src = sim.get_source("ez")
    assert np.abs(src).max() > 0
    dims, lo, hi = sim.get_array_slice_dimensions(
        "ez", center=mp.Vector3(), size=mp.Vector3(2, 2))
    assert len(dims) == 2 and all(d > 1 for d in dims)
    assert lo.x < hi.x


def test_output_dft_and_farfields(tmp_path):
    sim = _sim()
    dft = sim.add_dft_fields(["ez"], 0.8, 0.2, 2,
                             center=mp.Vector3(), size=mp.Vector3(2, 2))
    n2f = sim.add_near2far(0.8, 0.2, 2, mp.Near2FarRegion(
        center=mp.Vector3(-2, 0), size=mp.Vector3(0, 3)))
    sim.run(until=6.0)
    path = sim.output_dft(dft, str(tmp_path / "dftout"))
    import h5py
    with h5py.File(path) as h5:
        assert "ez_0.r" in h5 and "ez_1.i" in h5
    fpath = sim.output_farfields(n2f, str(tmp_path / "ff"), resolution=2,
                                 center=mp.Vector3(-8, 0),
                                 size=mp.Vector3(0, 2))
    with h5py.File(fpath) as h5:
        assert "ex.r" in h5 and h5["ez.i"].shape[-1] == 2


def test_display_and_timing(tmp_path, capsys):
    sim = _sim()
    fl = sim.add_flux(0.8, 0.2, 2, mp.FluxRegion(center=mp.Vector3(-2, 0),
                                                 size=mp.Vector3(0, 2)))
    en = sim.add_energy(0.8, 0.2, 2, mp.EnergyRegion(
        center=mp.Vector3(), size=mp.Vector3(2, 2)))
    sim.run(until=4.0)
    sim.display_fluxes(fl)
    sim.display_electric_energy(en)
    out = capsys.readouterr().out
    assert "flux:," in out and "electric_energy:," in out
    assert sim.mean_time_spent_on(0) > 0          # int code -> stepping
    assert "stepping" in sim.get_timing_data()
    f = sim.output_times(str(tmp_path / "times"))
    assert open(f).read().count("\n") == 2


def test_dump_structure_roundtrip(tmp_path):
    sim = _sim()
    sim.init_sim()
    f = str(tmp_path / "struct")
    sim.dump_structure(f)
    sim.load_structure(f)                       # same layout: must load
    layout = str(tmp_path / "layout.json")
    sim.dump_chunk_layout(layout)
    sim.load_chunk_layout(source=layout)
    other = mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=8)
    other.init_sim()
    with pytest.raises(ValueError):
        other.load_chunk_layout(source=layout)


def test_use_output_directory(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sim = _sim()
    sim.filename_prefix = "runA"
    d = sim.use_output_directory("outdir")
    assert d == "outdir" and os.path.isdir("outdir")
    sim.run(mp.at_time(1.0, mp.output_efield_z), until=2.0)
    # filename_prefix prepends; the directory holds everything
    assert any("ez-" in f for f in os.listdir("outdir"))
    sim.output_component("ez")
    assert any(f.startswith("runAez-") for f in os.listdir("outdir"))


def test_run_k_points_band():
    """Bloch sweep on a tiny periodic 2D vacuum cell: run_k_points
    returns one mode list per k with the empty-lattice frequency
    |k| c / a to a few percent."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(1, 1), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=0.45, fwidth=0.6),
                           component=mp.Ez, center=mp.Vector3(0.1, 0.2))],
        force_complex_fields=True)
    ks = [mp.Vector3(0.3, 0), mp.Vector3(0.4, 0)]
    freqs = sim.run_k_points(120, ks)
    assert len(freqs) == 2
    for k, fl in zip(ks, freqs):
        assert fl, f"no modes at {k}"
        best = min(abs(f.real - k.x) for f in fl)
        assert best < 0.03


def test_visualize_chunks():
    fig = _sim().visualize_chunks()
    assert fig is not None
