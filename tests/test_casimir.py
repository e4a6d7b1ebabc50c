"""Casimir force via the time-domain stress-tensor method
(analysis/casimir.py; reference src/casimir.cpp + scheme/casimir.scm).

Gold standard: the exact 1D parallel-plate result between perfect
mirrors, F = -pi/(24 a^2) (hbar = c = 1)."""

import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.casimir import (casimir_force_1d, casimir_g,
                                          _stress_weight)


def test_kernel():
    ts = np.array([0.5, 1.0, 2.0])
    g0 = casimir_g(ts, sigma=0.0)
    np.testing.assert_allclose(g0, 1 / (np.pi * ts ** 2), rtol=1e-12)
    # sigma kernels reduce to the vacuum kernel as sigma -> 0 and bracket it
    ge = casimir_g(ts, sigma=1e-6, ft="e")
    gh = casimir_g(ts, sigma=1e-6, ft="h")
    np.testing.assert_allclose(ge, g0, rtol=1e-3)
    np.testing.assert_allclose(gh, g0, rtol=1e-3)
    # the E kernel is boosted above the H kernel by the (u+sigma)/u ratio
    assert np.all(casimir_g(ts, 0.5, "e") > casimir_g(ts, 0.5, "h"))
    assert np.all(casimir_g(ts, 0.5, "e") > g0)


def test_stress_weights():
    assert _stress_weight("ez", "z", "z") == 0.5
    assert _stress_weight("ex", "z", "z") == -0.5
    with pytest.raises(NotImplementedError):
        _stress_weight("ex", "x", "z")


def _plates(a, sig=0.0, meps=1e6, res=20):
    def f():
        mat = mp.Medium(epsilon=meps, D_conductivity=sig)
        return mp.Simulation(
            cell_size=mp.Vector3(0, 0, 12.0), resolution=res,
            geometry=[
                mp.Block(center=mp.Vector3(0, 0, -a / 2 - 0.5),
                         size=mp.Vector3(mp.inf, mp.inf, 1.0),
                         material=mat),
                mp.Block(center=mp.Vector3(0, 0, a / 2 + 0.5),
                         size=mp.Vector3(mp.inf, mp.inf, 1.0),
                         material=mat)],
            default_material=mp.Medium(D_conductivity=sig),
            boundary_layers=[mp.PML(1.5)], eps_averaging=False)
    return f


@pytest.mark.slow
def test_parallel_plates_1d():
    a = 1.0
    zin, zout = a / 2 - 0.15, a / 2 + 1.0 + 0.15
    F = casimir_force_1d(_plates(a), [zin, zout], [-1, +1],
                         sigma=0.0, T=60.0)
    exact = -np.pi / (24 * a ** 2)
    # attractive, right magnitude (finite mirror eps / res / T residuals)
    assert F < 0
    assert abs(F / exact - 1.0) < 0.08, F / exact


@pytest.mark.slow
def test_parallel_plates_scaling():
    """F ~ 1/a^2: the ratio between two separations is parameter-free."""
    Fs = {}
    for a in (1.0, 1.5):
        zin, zout = a / 2 - 0.15, a / 2 + 1.0 + 0.15
        Fs[a] = casimir_force_1d(_plates(a), [zin, zout], [-1, +1],
                                 sigma=0.0, T=60.0)
    ratio = Fs[1.0] / Fs[1.5]
    assert abs(ratio - 2.25) < 0.15, ratio
