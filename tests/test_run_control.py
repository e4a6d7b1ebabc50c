"""Step-function DSL and stop conditions (simulation.py:4991-5445 analog)."""

import numpy as np

import meep_nl_tpu as mp


def _sim():
    return mp.Simulation(
        cell_size=mp.Vector3(6, 6), resolution=8,
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])


def test_at_every_and_beginning_end():
    sim = _sim()
    calls = {"every": 0, "begin": 0, "end": 0}
    sim.run(mp.at_beginning(lambda s: calls.__setitem__("begin", calls["begin"] + 1)),
            mp.at_every(2.0, lambda s: calls.__setitem__("every", calls["every"] + 1)),
            mp.at_end(lambda s: calls.__setitem__("end", calls["end"] + 1)),
            until=10.0)
    assert calls["begin"] == 1
    assert calls["end"] == 1
    assert 4 <= calls["every"] <= 6
    assert sim.meep_time() == 10.0


def test_stop_when_fields_decayed():
    sim = _sim()
    cond = mp.stop_when_fields_decayed(dt=2.0, c=mp.Ez,
                                       pt=mp.Vector3(1.0, 0), decay_by=1e-3)
    sim.run(until_after_sources=cond)
    # stopped before forever: source ends ~5.3; decay within ~20 time units
    assert sim.meep_time() < 60.0
    # and the field actually decayed
    v = abs(sim.get_field_point(mp.Ez, mp.Vector3(1.0, 0)))
    assert v < 1e-3


def test_stop_when_dft_decayed():
    sim = _sim()
    fl = sim.add_flux(1.0, 0.3, 3,
                      mp.FluxRegion(center=mp.Vector3(1.5, 0),
                                    size=mp.Vector3(0, 2)))
    sim.run(until_after_sources=mp.stop_when_dft_decayed(tol=1e-4))
    assert sim.meep_time() < 100.0
    assert np.all(sim.get_fluxes(fl) != 0)


def test_harminv_with_block_loop():
    """Harminv collectors must still work when callbacks force block mode."""
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 10), resolution=20,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.25, fwidth=0.2),
                            component=mp.Ex, center=mp.Vector3(0, 0, 1.3))])
    h = mp.Harminv(mp.Ex, mp.Vector3(0, 0, -2.1), 0.25, 0.2)
    ticks = []
    sim.run(mp.after_sources(h),
            mp.at_every(50.0, lambda s: ticks.append(s.meep_time())),
            until_after_sources=300)
    assert ticks
    freqs = sorted(m.freq for m in h.modes if m.amp > 1e-3)
    assert freqs
    for f in freqs:
        m = round(f / 0.05)
        assert abs(f - 0.05 * m) / (0.05 * m) < 2e-3
