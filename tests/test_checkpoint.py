"""Checkpoint/resume round trip (analog of tests/dump_load.cpp and
python/tests/test_dump_load.py): a split run must equal an unbroken run."""

import numpy as np

import meep_nl_tpu as mp


def _make():
    return mp.Simulation(
        cell_size=mp.Vector3(6, 6), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(2, 2, mp.inf), center=mp.Vector3(1, 0),
                           material=mp.Medium(epsilon=4,
                                              E_susceptibilities=[
                                                  mp.LorentzianSusceptibility(
                                                      frequency=2.0, gamma=0.1,
                                                      sigma=0.3)]))],
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3(-1.5, 0))],
        boundary_layers=[mp.PML(1.0)])


def test_dump_load_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    sim1 = _make()
    sim1.run(until=8)
    sim1.dump(path)
    sim1.run(until=8)
    ez_full = sim1.get_array(component=mp.Ez)

    sim2 = _make()
    sim2.load(path)
    assert sim2.meep_time() == 8.0
    sim2.run(until=8)
    ez_resumed = sim2.get_array(component=mp.Ez)
    np.testing.assert_array_equal(ez_full, ez_resumed)


def test_load_rejects_mismatched_layout(tmp_path):
    path = str(tmp_path / "ck.npz")
    sim1 = _make()
    sim1.run(until=2)
    sim1.dump(path)
    sim3 = mp.Simulation(cell_size=mp.Vector3(8, 6), resolution=10,
                         sources=_make().sources,
                         boundary_layers=[mp.PML(1.0)])
    try:
        sim3.load(path)
        assert False, "expected layout mismatch error"
    except ValueError as e:
        assert "layout mismatch" in str(e)
