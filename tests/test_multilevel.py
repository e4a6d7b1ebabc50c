"""Multilevel-atom gain medium (test_multilevel_atom.py pattern;
src/multilevel-atom.cpp): an inverted two-level medium amplifies a seed
pulse; the uninverted medium absorbs it; populations saturate."""

import numpy as np

import meep_nl_tpu as mp


def _two_level(n_upper, n_lower, until=60.0):
    f0 = 0.7
    atom = mp.MultilevelAtom(
        initial_populations=[n_lower, n_upper],
        transitions=[mp.Transition(from_level=1, to_level=0,
                                   frequency=f0, gamma=0.05,
                                   transition_rate=0.005)],
        sigma=0.3)
    med = mp.Medium(epsilon=1.0, E_susceptibilities=[atom])
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 16), resolution=20,
                        geometry=[mp.Block(size=mp.Vector3(mp.inf, mp.inf, 6),
                                           center=mp.Vector3(),
                                           material=med)],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=f0, fwidth=0.1),
                            component=mp.Ex,
                            center=mp.Vector3(0, 0, -6.5))],
                        boundary_layers=[mp.PML(1.5)])
    fl = sim.add_flux(f0, 0.0, 1,
                      mp.FluxRegion(center=mp.Vector3(0, 0, 6.0)))
    sim.run(until_after_sources=until)
    return sim, sim.get_fluxes(fl)[0]


def test_inversion_amplifies_absorber_attenuates():
    sim_g, p_gain = _two_level(n_upper=1.0, n_lower=0.0)
    sim_a, p_abs = _two_level(n_upper=0.0, n_lower=1.0)
    sim_0, p_none = _two_level(n_upper=0.0, n_lower=0.0)
    assert np.isfinite(p_gain) and np.isfinite(p_abs) and np.isfinite(p_none)
    # gain medium transmits more than empty medium; absorber less
    assert p_gain > p_none * 1.05, (p_gain, p_none)
    assert p_abs < p_none * 0.95, (p_abs, p_none)


def test_populations_respond():
    sim, _ = _two_level(n_upper=1.0, n_lower=0.0, until=40.0)
    pol = sim.fields_state["pol"][0]
    N = np.asarray(pol["N"])
    assert np.all(np.isfinite(N))
    # some of the upper-level population transferred to the lower level
    # inside the gain region
    n_up = N[1]
    n_lo = N[0]
    assert n_lo.max() > 1e-6
    assert n_up.min() < 1.0 - 1e-6
