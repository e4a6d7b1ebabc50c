"""Frequency-domain CW solver vs long time-stepping (tests the solve_cw
analog; the reference compares cw solutions to time-domain steady states)."""

import numpy as np

import meep_nl_tpu as mp


def test_solve_cw_matches_time_domain():
    def make():
        return mp.Simulation(
            cell_size=mp.Vector3(8, 6), resolution=10,
            geometry=[mp.Block(size=mp.Vector3(mp.inf, 1, mp.inf),
                               center=mp.Vector3(),
                               material=mp.Medium(epsilon=4))],
            sources=[mp.Source(mp.ContinuousSource(frequency=0.5),
                               component=mp.Ez, center=mp.Vector3(-2, 0))],
            boundary_layers=[mp.PML(1.0)],
            force_complex_fields=True)

    # frequency-domain solve
    sim1 = make()
    out = sim1.solve_cw(tol=1e-6, maxiters=4000)
    assert out["relres"] < 1e-5
    ez_cw = np.asarray(sim1.fields_state["f"]["ez"])

    # long time-domain run to steady state (CW source with slow turn-on)
    sim2 = make()
    sim2.sources[0].src.width = 10.0
    sim2.run(until=150)
    ez_td = np.asarray(sim2.fields_state["f"]["ez"])

    # compare |Ez| patterns away from the source (global phase differs)
    a = np.abs(ez_cw)
    b = np.abs(ez_td)
    scale = b.max()
    assert scale > 1e-6
    mask = b > 0.05 * scale
    rel = np.abs(a - b)[mask] / scale
    assert np.percentile(rel, 95) < 0.05, np.percentile(rel, 95)
