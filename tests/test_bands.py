"""Plane-wave band solver (analysis/bands.py; the bundled-MPB role).

Three-way validation: exact empty-lattice bands, the textbook square
alumina-rod TM gap, and cross-validation against this framework's own
FDTD (Bloch-periodic unit cell + Harminv)."""

import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.bands import ModeSolver, retrieve_gap

RODS = [mp.Cylinder(radius=0.2, material=mp.Medium(epsilon=8.9))]


def test_empty_lattice_exact():
    ms = ModeSolver(num_bands=4, k_points=[(0.3, 0.0, 0.0)], geometry=[],
                    n_g=9, resolution=32)
    gs = [(i, j) for i in range(-4, 5) for j in range(-4, 5)]
    exact = sorted(np.hypot(0.3 + np.array([g[0] for g in gs]),
                            np.array([g[1] for g in gs])))[:4]
    np.testing.assert_allclose(ms.run_tm()[0], exact, atol=1e-6)
    np.testing.assert_allclose(ms.run_te()[0], exact, atol=1e-6)


def test_square_rod_tm_gap():
    """The classic result (Joannopoulos ch. 5): eps=8.9 rods, r/a=0.2 have
    a large TM gap between bands 1-2 and no TE gap."""
    kpath = [(0.5 * i / 4, 0, 0) for i in range(5)]
    kpath += [(0.5, 0.5 * i / 4, 0) for i in range(1, 5)]
    kpath += [(0.5 * (4 - i) / 4, 0.5 * (4 - i) / 4, 0)
              for i in range(1, 5)]
    ms = ModeSolver(num_bands=4, k_points=kpath, geometry=RODS,
                    n_g=13, resolution=64)
    tm = ms.run_tm()
    gap = retrieve_gap(tm, 1)
    assert 25 < gap < 40, gap
    assert abs(tm[:, 0].max() - 0.32) < 0.02      # band-1 top at X
    assert abs(tm[:, 1].min() - 0.44) < 0.02      # band-2 bottom
    te = ms.run_te()
    assert retrieve_gap(te, 1) < 3.0


@pytest.mark.slow
def test_bands_match_fdtd():
    """Cross-validation: the framework's own Bloch-periodic FDTD unit cell
    (Harminv eigenfrequencies) agrees with the plane-wave bands."""
    kfrac = (0.3, 0.2, 0)
    ms = ModeSolver(num_bands=3, k_points=[kfrac], geometry=RODS,
                    n_g=13, resolution=64)
    tm = ms.run_tm()[0]
    sim = mp.Simulation(cell_size=mp.Vector3(1, 1), resolution=32,
                        geometry=RODS, k_point=mp.Vector3(*kfrac[:2]),
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.4, fwidth=0.45),
                            component=mp.Ez,
                            center=mp.Vector3(0.123, 0.089))],
                        eps_averaging=False)
    h = mp.Harminv(mp.Ez, mp.Vector3(-0.121, 0.2), 0.4, 0.45)
    sim.run(mp.after_sources(h), until_after_sources=300)
    fd = sorted(m.freq for m in h.modes
                if m.amp > 1e-5 and m.Q > 100 and m.freq > 0.05)
    assert len(fd) >= 3
    for b in tm:
        near = min(fd, key=lambda f: abs(f - b))
        assert abs(near - b) / b < 0.01, (b, near)
