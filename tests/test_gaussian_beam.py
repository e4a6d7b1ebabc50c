"""Exact complex-source-point Gaussian beam (sources.cpp:557
gaussianbeam::get_fields + the 4-sheet equivalence injection,
sources.cpp:526) — the reference-parity mode of GaussianBeamSource
(component=None, vector beam_E0)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.models.source import gaussian_beam_fields


def test_beam_fields_paraxial_limit():
    """At low NA (k w0 >> 1) the exact beam's transverse E profile on the
    waist plane reduces to the paraxial Gaussian exp(-r^2/w0^2)."""
    freq, w0 = 1.0, 3.0                     # k w0 = 6 pi
    ys = np.linspace(-3.0, 3.0, 41)
    pts = np.stack([np.zeros_like(ys), ys, np.zeros_like(ys)], -1)
    EH = gaussian_beam_fields(pts, [0, 0, 0], [1, 0, 0], w0, freq,
                              [0, 0, 1.0])
    prof = np.abs(EH[2]) / np.abs(EH[2]).max()
    expect = np.exp(-ys ** 2 / w0 ** 2)
    np.testing.assert_allclose(prof, expect, atol=0.02)


def test_beam_fields_high_na_narrower():
    """At high NA the exact waist is wider than the (invalid) paraxial
    formula predicts — the fields remain finite and normalized."""
    freq = 1.0
    EH = gaussian_beam_fields(np.array([[0.0, 0.0, 0.0]]),
                              [0, 0, 0], [1, 0, 0], 0.3, freq, [0, 0, 1.0])
    assert np.all(np.isfinite(EH))
    assert abs(abs(EH[2, 0]) - 1.0) < 0.2   # ~unit on-axis field


def test_exact_beam_launch_2d():
    """4-sheet equivalence injection: a TM beam launches one way with the
    expected transverse profile at the focus."""
    freq, w0 = 1.0, 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(12, 8), resolution=16,
        sources=[mp.GaussianBeamSource(
            mp.ContinuousSource(frequency=freq),
            center=mp.Vector3(-4, 0), size=mp.Vector3(0, 6),
            beam_x0=mp.Vector3(4, 0, 0),       # focus 4 to the right
            beam_kdir=mp.Vector3(1, 0, 0), beam_w0=w0,
            beam_E0=mp.Vector3(0, 0, 1))],
        boundary_layers=[mp.PML(1.0)])
    f_fwd = sim.add_flux(freq, 0, 1, mp.FluxRegion(
        center=mp.Vector3(3, 0), size=mp.Vector3(0, 6)))
    f_bwd = sim.add_flux(freq, 0, 1, mp.FluxRegion(
        center=mp.Vector3(-5, 0), size=mp.Vector3(0, 6)))
    sim.run(until=40)
    p_f = sim.get_fluxes(f_fwd)[0]
    p_b = -sim.get_fluxes(f_bwd)[0]
    assert p_f > 0
    assert p_f / max(abs(p_b), 1e-12) > 20, (p_f, p_b)
    # focal-plane |Ez| profile ~ Gaussian of waist w0
    ez = np.abs(np.asarray(sim.get_array(component=mp.Ez,
                                         center=mp.Vector3(0, 0),
                                         size=mp.Vector3(0, 6))))
    ez = ez.reshape(-1)
    ys = np.linspace(-3, 3, len(ez))
    peak = ez.max()
    half = np.where(ez > 0.5 * peak)[0]
    fwhm = ys[half.max()] - ys[half.min()]
    fwhm_expect = w0 * np.sqrt(2 * np.log(2))   # FWHM of exp(-y^2/w0^2)
    assert abs(fwhm - fwhm_expect) < 0.45, (fwhm, fwhm_expect)
    # beam is centered
    assert abs(ys[np.argmax(ez)]) < 0.4
