"""Order-of-accuracy convergence (analog of tests/2D_convergence.cpp,
convergence_cyl_waveguide.cpp): cavity eigenfrequency error must fall as
resolution^-2 (second-order FDTD)."""

import numpy as np

import meep_nl_tpu as mp


def _cavity_freq_error(res):
    """1D PEC cavity: measured fundamental vs analytic f=m/(2L)."""
    L = 8.0
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, L), resolution=res,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.25, fwidth=0.15),
                            component=mp.Ex, center=mp.Vector3(0, 0, 1.1))])
    h = mp.Harminv(mp.Ex, mp.Vector3(0, 0, -1.7), 0.25, 0.15)
    sim.run(mp.after_sources(h), until_after_sources=600)
    target = 4 / (2 * L)  # mode m=4: f=0.25
    best = min((m for m in h.modes if m.amp > 1e-4),
               key=lambda m: abs(m.freq - target))
    return abs(best.freq - target) / target


def test_second_order_convergence():
    e1 = _cavity_freq_error(8)
    e2 = _cavity_freq_error(16)
    e3 = _cavity_freq_error(32)
    assert e1 > e2 > e3 > 0
    # second order: each doubling cuts the error ~4x (allow 2.5-6x)
    r12 = e1 / e2
    r23 = e2 / e3
    assert 2.5 < r12 < 7.0, (e1, e2, e3)
    assert 2.5 < r23 < 7.0, (e1, e2, e3)
