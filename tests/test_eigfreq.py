"""Frequency-domain eigensolver (solve_eigfreq): shift-invert power
iteration on the m-step operator must reproduce the time-domain Harminv
resonance (f, Q) of a leaky 1D cavity (reference: the solve_cw-based
eigensolver, src/cw_fields.cpp + SURVEY 2)."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def _make_sim():
    return mp.Simulation(
        cell_size=mp.Vector3(0, 0, 10), resolution=20,
        geometry=[
            mp.Block(center=mp.Vector3(0, 0, -1.5),
                     size=mp.Vector3(mp.inf, mp.inf, 1.0),
                     material=mp.Medium(epsilon=12)),
            mp.Block(center=mp.Vector3(0, 0, 1.5),
                     size=mp.Vector3(mp.inf, mp.inf, 1.0),
                     material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(frequency=0.23, fwidth=0.08),
                           component=mp.Ex, center=mp.Vector3(0, 0, 0.3))],
        boundary_layers=[mp.PML(1.0)],
        force_complex_fields=True, eps_averaging=False)


@pytest.mark.slow
def test_eigfreq_matches_harminv():
    sim_td = _make_sim()
    h = mp.Harminv(mp.Ex, mp.Vector3(0, 0, -0.2), 0.23, 0.08)
    sim_td.run(mp.after_sources(h), until_after_sources=400)
    best = max((m for m in h.modes if m.amp > 1e-4 and m.Q > 5),
               key=lambda m: m.amp)

    sim_fd = _make_sim()
    out = sim_fd.solve_eigfreq(freq=0.24)
    assert abs(out["freq"] - best.freq) < 2e-3 * best.freq, (
        out["freq"], best.freq)
    assert abs(out["Q"] - best.Q) < 0.05 * best.Q, (out["Q"], best.Q)
    # the returned state holds the mode profile: nonzero in the cavity
    ex = np.asarray(sim_fd.get_array(component=mp.Ex,
                                     center=mp.Vector3(),
                                     size=mp.Vector3(0, 0, 2)))
    assert np.abs(ex).max() > 0


def test_eigfreq_requires_complex():
    sim = mp.Simulation(
        cell_size=mp.Vector3(0, 0, 6), resolution=10,
        sources=[mp.Source(mp.GaussianSource(frequency=0.25, fwidth=0.1),
                           component=mp.Ex, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    with pytest.raises(ValueError):
        sim.solve_eigfreq(freq=0.25)
