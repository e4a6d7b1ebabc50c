"""Full-tensor Kottke subpixel smoothing (scene.rasterize; reference
src/anisotropic_averaging.cpp + Kottke-Farjadpour-Johnson 2008):
interface voxels get eps_eff^{-1} = <1/eps> nn^T + <eps>^{-1}(I - nn^T),
including the off-diagonal n_i n_j rows that feed the stepper's OFFDIAG
path."""

import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.models import scene


def _halfplane_45(eps=12.0):
    # half-plane x + y < 0 via a large triangular prism whose hypotenuse
    # passes through the origin with slope -1
    return [mp.Prism(vertices=[mp.Vector3(-100, 100), mp.Vector3(100, -100),
                               mp.Vector3(-300, -300)],
                     height=mp.inf, material=mp.Medium(epsilon=eps))]


def test_tilted_interface_offdiag():
    gv = G.GridVolume.create("2d", [4.0, 4.0], 16.0)
    mat = scene.rasterize(gv, _halfplane_45(), mp.Medium(),
                          eps_averaging=True, subpixel_n=4,
                          subpixel_tensor=True)
    ex_rows = mat.chi1inv["ex"]
    ey_rows = mat.chi1inv["ey"]
    assert "y" in ex_rows and "x" in ey_rows, "off-diagonal rows missing"
    od_xy = ex_rows["y"]
    od_yx = ey_rows["x"]
    # off-diagonal support only at the interface band
    assert np.any(np.abs(od_xy) > 1e-4)
    assert np.count_nonzero(np.abs(od_xy) > 1e-6) < od_xy.size * 0.2
    # for a 45-degree normal n = (1,1)/sqrt2: n_x n_y = +1/2, so the
    # off-diagonal entry is positive with magnitude up to
    # (<1/eps> - 1/<eps>)/2
    band = np.abs(od_xy) > 1e-4
    assert np.all(od_xy[band] > 0)
    e1, e2 = 1.0, 12.0
    max_delta = (0.5 * (1 / e1 + 1 / e2) - 1.0 / (0.5 * (e1 + e2)))
    assert od_xy.max() < 0.5 * max_delta * 1.05
    # tensor symmetry: the ey row's x entry mirrors the ex row's y entry
    assert abs(od_xy.max() - od_yx.max()) < 0.2 * od_xy.max()
    # diagonal entries stay between the harmonic and arithmetic bounds
    diag = ex_rows["x"]
    assert np.all(diag >= 1.0 / e2 - 1e-9) and np.all(diag <= 1.0 + 1e-9)


def test_axis_aligned_no_offdiag():
    gv = G.GridVolume.create("2d", [4.0, 4.0], 16.0)
    geom = [mp.Block(center=mp.Vector3(-1, 0),
                     size=mp.Vector3(2, mp.inf, mp.inf),
                     material=mp.Medium(epsilon=12))]
    mat = scene.rasterize(gv, geom, mp.Medium(), eps_averaging=True,
                          subpixel_n=4, subpixel_tensor=True)
    assert "y" not in mat.chi1inv.get("ex", {})
    assert "x" not in mat.chi1inv.get("ey", {})


def test_tilted_interface_runs():
    """End-to-end: the Kottke off-diagonal rows flow through the stepper
    (OFFDIAG path) without blowing up."""
    sim = mp.Simulation(
        cell_size=mp.Vector3(4, 4), resolution=16,
        geometry=_halfplane_45(), subpixel_tensor=True,
        sources=[mp.Source(mp.GaussianSource(frequency=0.6, fwidth=0.2),
                           component=mp.Ex, center=mp.Vector3(1.2, 1.2))],
        boundary_layers=[mp.PML(0.8)])
    sim.run(until=25)
    ex = np.asarray(sim.get_array(component=mp.Ex, center=mp.Vector3(),
                                  size=mp.Vector3(2, 2)))
    assert np.all(np.isfinite(ex))
    assert np.abs(ex).max() < 1e3  # stable
