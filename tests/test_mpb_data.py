"""MPBData (analysis/mpb_data.py; reference python/mpb_data.py): tiling,
Bloch phase continuation, lattice rectification; plus the band solvers'
real-space field synthesis (mode_solver get_efield/get_hfield role)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.bands import ModeSolver, ModeSolver3D


def _rod_solver():
    return ModeSolver(
        num_bands=2, k_points=[(0.3, 0.0, 0.0)],
        geometry=[mp.Cylinder(radius=0.2, material=mp.Medium(epsilon=8.9))],
        resolution=32, n_g=9)


def test_tiling_is_exact_at_native_resolution():
    ms = _rod_solver()
    eps = ms.get_epsilon()
    md = mp.MPBData(lattice=ms, periods=2)
    out = md.convert(eps)
    assert out.shape == (64, 64)
    # output samples land exactly on input samples -> tiling is exact
    np.testing.assert_allclose(out[:32, :32], eps, rtol=1e-12)
    np.testing.assert_allclose(out[32:, 32:], eps, rtol=1e-12)


def test_bloch_phase_continuation():
    u = np.ones((8, 8), complex)
    md = mp.MPBData(periods=(2, 1))
    out = md.convert(u, kpoint=(0.5, 0.0))
    # second lattice copy carries exp(2 pi i * 0.5) = -1
    np.testing.assert_allclose(out[:8], 1.0)
    np.testing.assert_allclose(out[8:], -1.0)


def test_rectify_triangular_preserves_fill():
    """Rectifying a triangular rod lattice must preserve the area fraction
    of dielectric (the crystal is just resampled, not distorted)."""
    A = np.array([[1.0, 0.0], [0.5, np.sqrt(3) / 2]])
    ms = ModeSolver(num_bands=1, k_points=[(0, 0, 0)], resolution=48,
                    geometry=[mp.Cylinder(radius=0.2,
                                          material=mp.Medium(epsilon=12))])
    eps = ms.get_epsilon()          # sampled in FRACTIONAL coords
    md = mp.MPBData(lattice=A, rectify=True, periods=2, resolution=48)
    out = md.convert(eps)
    # bounding box of 2 periods: x in [0, 3], y in [0, sqrt(3)]
    assert abs(out.shape[0] / out.shape[1] - 3 / np.sqrt(3)) < 0.1
    fill_in = (eps > 6).mean()
    fill_out = (out > 6).mean()
    # cell area = sqrt(3)/2, bounding box of the tile = 3*sqrt(3)/4 per
    # period^2 => the box holds 4 cells' worth of area / (2*3/sqrt(3)) ...
    # area fractions are identical since the sampling is uniform in x,y
    # and the crystal is periodic
    assert abs(fill_out - fill_in) < 0.02, (fill_in, fill_out)


def test_efield_tm_is_planewave_in_empty_lattice():
    ms = ModeSolver(num_bands=1, k_points=[(0.3, 0.0, 0.0)],
                    resolution=32, n_g=7)
    ms.run_tm()
    assert abs(ms.all_freqs[0][0] - 0.3) < 1e-6
    ez = ms.get_efield_tm(0, 1)
    mag = np.abs(ez)
    assert mag.std() / mag.mean() < 1e-8
    # phase advance across the cell = 2 pi k
    dphi = np.angle(ez[-1, 0] / ez[0, 0])
    expect = 2 * np.pi * 0.3 * (31 / 32)
    assert abs(dphi - expect) < 1e-6


def test_hfield_3d_empty_lattice_transverse_planewave():
    ms = ModeSolver3D(num_bands=2, k_points=[(0.25, 0.0, 0.0)],
                      resolution=16, n_g=3)
    ms.run()
    assert abs(ms.all_freqs[0][0] - 0.25) < 1e-6
    H = ms.get_hfield(0, 1, n=8)
    mag = np.linalg.norm(H, axis=-1)
    assert mag.std() / mag.mean() < 1e-8
    # transversality: k . H = 0 for the k = x planewave -> Hx ~ 0
    assert np.abs(H[..., 0]).max() < 1e-8 * mag.mean()
    D = ms.get_dfield(0, 1, n=8)
    # S = E x H* finite; E = D in vacuum; |D| = |H| for a planewave (c=1)
    dmag = np.linalg.norm(D, axis=-1)
    np.testing.assert_allclose(dmag, mag, rtol=1e-6)


def test_bloch_continuation_smooth_across_seam():
    """Tiling a Bloch planewave with incommensurate k must be seamless:
    the intra-cell phase is stripped before interpolation and the full
    exp(2 pi i k.f) reapplied, so successive samples advance by a uniform
    phase step even across the cell boundary."""
    n, k = 16, 0.3
    f = (np.arange(n) + 0.5) / n
    u = np.exp(2j * np.pi * k * f)[:, None] * np.ones((n, n))
    md = mp.MPBData(periods=(3, 1))
    out = md.convert(u, kpoint=(k, 0.0))
    steps = out[1:, 0] / out[:-1, 0]
    np.testing.assert_allclose(steps, np.exp(2j * np.pi * k / n),
                               atol=1e-12)


def test_mpb_data_vector_field_roundtrip():
    ms = ModeSolver3D(num_bands=1, k_points=[(0.25, 0.0, 0.0)],
                      resolution=8, n_g=3)
    ms.run()
    H = ms.get_hfield(0, 1, n=8)
    md = mp.MPBData(lattice=ms, periods=(2, 1, 1))
    out = md.convert(H, kpoint=(0.25, 0, 0))
    assert out.shape == (16, 8, 8, 3)
    # Bloch continuation: the tiled field is the true infinite-crystal
    # field, so copy 2 = copy 1 * exp(2 pi i k . a1)
    np.testing.assert_allclose(out[8:], out[:8] * np.exp(0.5j * np.pi),
                               atol=1e-8 * np.abs(out).max())
