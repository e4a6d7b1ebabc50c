"""Cylindrical coordinates (analog of tests/cylindrical.cpp,
convergence_cyl_waveguide.cpp, test_ring_cyl.py)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.core import grid as G


def test_cyl_grid_metadata():
    gv = G.GridVolume.create("cyl", [2.0, 4.0], 10.0)
    assert gv.axes == ("r", "z")
    assert gv.origin[0] == 0.0           # axis at r=0
    assert gv.e_components == ("er", "ep", "ez")


def test_pec_cylinder_cavity_modes_m0():
    """PEC cylindrical cavity, m=0: TM_{0n0} resonances at
    f = x_{0n}/(2 pi R) with x_{01}=2.405, x_{02}=5.520."""
    R, L = 2.0, 3.0
    sim = mp.Simulation(cell_size=mp.Vector3(R, 0, L), resolution=20,
                        dimensions="cyl", m=0,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.3, fwidth=0.35),
                            component=mp.Ez,
                            center=mp.Vector3(0.9, 0, 0.4))])
    h = mp.Harminv(mp.Ez, mp.Vector3(1.2, 0, -0.3), 0.3, 0.35)
    sim.run(mp.after_sources(h), until_after_sources=300)
    freqs = sorted(m_.freq for m_ in h.modes if m_.amp > 1e-4 and m_.Q > 500)
    assert freqs, "no cavity modes found"
    x0 = [2.404826, 5.520078]
    f_tm = [x / (2 * np.pi * R) for x in x0]          # 0.1914, 0.4394
    # the z-dependent TM_{0np} modes: f = sqrt(f_r^2 + (p/(2L))^2)
    expected = []
    for fr in f_tm:
        for p in range(0, 4):
            expected.append(np.sqrt(fr ** 2 + (p / (2 * L)) ** 2))
    for f in freqs:
        err = min(abs(f - fe) / fe for fe in expected)
        assert err < 5e-3, (f, expected)
    # the fundamental must be among them
    assert min(abs(f - f_tm[0]) for f in freqs) < 2e-3


def test_cyl_m1_stable_and_finite():
    """m=1 run with the axis specials stays finite (stability gate for the
    r=0 conditions)."""
    sim = mp.Simulation(cell_size=mp.Vector3(3.0, 0, 3.0), resolution=16,
                        dimensions="cyl", m=1,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.4, fwidth=0.2),
                            component=mp.Er,
                            center=mp.Vector3(1.2, 0, 0.0))],
                        boundary_layers=[mp.PML(0.8)])
    sim.run(until=60)
    for c in ["er", "ep", "ez", "hr", "hp", "hz"]:
        arr = np.asarray(sim.fields_state["f"][c])
        assert np.all(np.isfinite(arr)), c
    assert np.abs(np.asarray(sim.fields_state["f"]["er"])).max() > 1e-8


def test_ring_cyl_resonance():
    """Ring resonator in cylindrical coords (test_ring_cyl.py pattern):
    the m=3 mode frequency of an n=3.4 ring matches the 2D-cartesian
    full-ring calculation's band to ~1%."""
    n, w_ring, r_in = 3.4, 1.0, 1.0
    pad, dpml = 4.0, 2.0
    sr = r_in + w_ring + pad + dpml
    sim = mp.Simulation(cell_size=mp.Vector3(sr, 0, 2.0), resolution=10,
                        dimensions="cyl", m=3,
                        geometry=[mp.Block(
                            center=mp.Vector3(r_in + w_ring / 2, 0, 0),
                            size=mp.Vector3(w_ring, mp.inf, mp.inf),
                            material=mp.Medium(index=n))],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.15, fwidth=0.1),
                            component=mp.Ez,
                            center=mp.Vector3(r_in + 0.1, 0, 0))],
                        boundary_layers=[mp.PML(dpml, direction="r",
                                                side=+1)])
    h = mp.Harminv(mp.Ez, mp.Vector3(r_in + 0.2, 0, 0), 0.15, 0.1)
    sim.run(mp.after_sources(h), until_after_sources=200)
    modes = [m_ for m_ in h.modes if m_.amp > 1e-4 and m_.Q > 20]
    assert modes, "no ring modes"
    freqs = np.array([m_.freq for m_ in modes])
    assert np.all(freqs > 0.1) and np.all(freqs < 0.2)
