"""3D full-vector plane-wave band solver gates (ModeSolver3D; the role of
MPB's mode_solver, pympb.cpp:2846):

  * empty simple-cubic and fcc lattices vs the exact folded light cone
  * a 1D Bragg stack embedded in 3D vs the exact transfer-matrix dispersion
  * kdom / z-parity / group-velocity metadata
  * silicon inverse opal (fcc) smoke: the known 8-9 pseudogap appears
"""

import numpy as np
import pytest

from meep_nl_tpu.analysis.bands import ModeSolver3D
from meep_nl_tpu.models.geom import Block, Medium, Sphere, Vector3

INF = 1e20


def _exact_empty(ms, kfrac, nb, eps=1.0):
    _, B = ms._lattice()
    kv = np.asarray(kfrac) @ B
    G = ms._g @ B
    w = np.linalg.norm(kv + G, axis=1) / (2 * np.pi * np.sqrt(eps))
    return np.sort(np.concatenate([w, w]))[:nb]


def test_empty_sc_lattice_exact():
    ks = [(0.3, 0.0, 0.0), (0.25, 0.25, 0.0), (0.5, 0.5, 0.5)]
    ms = ModeSolver3D(num_bands=8, k_points=ks, n_g=5, resolution=8)
    f = ms.run()
    for i, k in enumerate(ks):
        np.testing.assert_allclose(f[i], _exact_empty(ms, k, 8), atol=1e-9)


def test_empty_fcc_lattice_exact():
    basis = [[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]]
    ks = [(0.5, 0.0, 0.0), (0.25, 0.25, 0.25)]
    ms = ModeSolver3D(num_bands=6, k_points=ks, basis=basis, n_g=5,
                      resolution=8)
    f = ms.run()
    for i, k in enumerate(ks):
        np.testing.assert_allclose(f[i], _exact_empty(ms, k, 6), atol=1e-9)


def _bragg_exact_edges(eps1, eps2, d1, d2, K):
    """Exact 1D Bragg dispersion: cos(K a) = cos x1 cos x2 - S sin x1 sin x2
    with x_i = w n_i d_i, S = (n1^2+n2^2)/(2 n1 n2); solve for the first two
    bands' w at Bloch phase K (radians per period)."""
    from scipy.optimize import brentq
    n1, n2 = np.sqrt(eps1), np.sqrt(eps2)
    S = (n1 ** 2 + n2 ** 2) / (2 * n1 * n2)

    def f(w):
        x1, x2 = 2 * np.pi * w * n1 * d1, 2 * np.pi * w * n2 * d2
        return (np.cos(x1) * np.cos(x2) - S * np.sin(x1) * np.sin(x2)
                - np.cos(K))

    roots = []
    ws = np.linspace(1e-6, 1.2, 6000)
    vals = np.array([f(w) for w in ws])
    for i in range(len(ws) - 1):
        if vals[i] * vals[i + 1] < 0:
            roots.append(brentq(f, ws[i], ws[i + 1]))
        if len(roots) == 2:
            break
    return roots


def test_bragg_stack_vs_transfer_matrix():
    """Quarter-ish-wave stack (eps 13 / 1, d = 0.5 / 0.5) along z, solved
    with the full 3D machinery at k || z, vs the exact transfer-matrix
    bands at the zone edge."""
    eps1, eps2 = 13.0, 1.0
    geom = [Block(size=Vector3(INF, INF, 0.5), center=Vector3(0, 0, -0.25),
                  material=Medium(epsilon=eps1))]
    kfrac = (0.0, 0.0, 0.5)
    ms = ModeSolver3D(num_bands=4, k_points=[kfrac], geometry=geom,
                      n_g=9, resolution=32)
    f = ms.run()[0]
    w1, w2 = _bragg_exact_edges(eps1, eps2, 0.5, 0.5, np.pi)
    # bands are doubly degenerate (two polarizations)
    np.testing.assert_allclose(f[0], w1, rtol=0.02)
    np.testing.assert_allclose(f[1], w1, rtol=0.02)
    np.testing.assert_allclose(f[2], w2, rtol=0.02)
    # gap edges straddle the exact gap
    assert f[1] < w2 < f[2] * 1.05


def test_metadata_kdom_parity_vg():
    ms = ModeSolver3D(num_bands=2, k_points=[(0.3, 0.0, 0.0)], n_g=3,
                      resolution=8)
    ms.run()
    np.testing.assert_allclose(ms.kdom[0][0], [0.3, 0, 0], atol=1e-12)
    # vacuum transverse modes at k||x split into sigma_z = +-1
    assert sorted(np.round(ms.zparities[0]).tolist()) == [-1.0, 1.0]
    vg = ms.compute_group_velocities()
    np.testing.assert_allclose(np.abs(vg[0][:, 0]), 1.0, atol=1e-3)


@pytest.mark.slow
def test_silicon_inverse_opal_pseudogap():
    """fcc close-packed air spheres in silicon: the classic inverse-opal
    band structure has its (pseudo)gap between bands 8 and 9 at the X
    point (Sozuer/Haus/Inguva 1992; Blanco et al. 2000).  PWE at this
    basis size resolves the 8-9 separation."""
    basis = [[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]]
    A = np.asarray(basis)
    si = Medium(epsilon=11.9)
    air = Medium(epsilon=1.0)
    r = np.sqrt(2) / 4  # close packed
    geom = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                c = np.array([i, j, k], float) @ A
                geom.append(Sphere(r, center=Vector3(*c), material=air))
    ms = ModeSolver3D(num_bands=10, k_points=[(0.5, 0.0, 0.5)],  # X point
                      geometry=geom, default_material=si, basis=basis,
                      n_g=7, resolution=16)
    f = ms.run()[0]
    assert np.all(np.isfinite(f)) and np.all(np.diff(f) >= -1e-9)
    # the 8-9 separation at X exceeds the 7-8 one (the known pseudogap)
    gap89 = f[8] - f[7]
    assert gap89 > 0.01 * f[7], (f[7], f[8])
