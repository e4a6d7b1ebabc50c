"""Native C++ rasterizer vs the NumPy path (the reference's meepgeom role)."""

import time
import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu import native as NAT
from meep_nl_tpu.models import scene
from meep_nl_tpu.core import grid as G


def _geom():
    return [mp.Sphere(radius=0.7, center=mp.Vector3(0.3, -0.2, 0),
                      material=mp.Medium(epsilon=12)),
            mp.Block(size=mp.Vector3(1.0, 2.0, mp.inf),
                     center=mp.Vector3(-1, 0.5, 0),
                     material=mp.Medium(epsilon=4)),
            mp.Cylinder(radius=0.5, center=mp.Vector3(1.2, 1.0, 0),
                        material=mp.Medium(epsilon=2))]


def test_native_builds_and_matches_numpy():
    lib = NAT.get_lib()
    assert lib is not None, "g++ build failed"
    gv = G.GridVolume.create("2d", [6.0, 6.0], 16.0)
    geom = _geom()
    objs = NAT.serialize_objects(geom)
    assert objs is not None
    pts = scene._site_points(gv, "ez")
    idx_np = scene._material_at(pts, geom, mp.Medium())
    idx_nat = NAT.material_at_native(pts, objs).reshape(gv.shape)
    np.testing.assert_array_equal(idx_np, idx_nat)


def test_rasterize_native_equals_python():
    gv = G.GridVolume.create("2d", [6.0, 6.0], 16.0)
    geom = _geom()
    m_nat = scene.rasterize(gv, geom, subpixel_n=3)
    # force the numpy path by adding an unsupported object type (Wedge)
    # sentinel forces the numpy fallback; keep it outside the cell so the
    # later-objects-take-precedence rule can't let it claim any point
    geom2 = geom + [mp.Wedge(radius=0.0, center=mp.Vector3(100, 100),
                             material=mp.Medium())]
    m_py = scene.rasterize(gv, geom2, subpixel_n=3)
    a = m_nat.chi1inv["ez"]["z"]
    b = m_py.chi1inv["ez"]["z"]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_native_is_faster_for_3d():
    if NAT.get_lib() is None:
        pytest.skip("no toolchain")
    gv = G.GridVolume.create("3d", [3.0, 3.0, 3.0], 16.0)
    geom = [mp.Sphere(radius=1.0, material=mp.Medium(epsilon=12),
                      center=mp.Vector3())]
    t0 = time.perf_counter()
    scene.rasterize(gv, geom, subpixel_n=3)
    t_nat = time.perf_counter() - t0
    # sentinel forces the numpy fallback; keep it outside the cell so the
    # later-objects-take-precedence rule can't let it claim any point
    geom2 = geom + [mp.Wedge(radius=0.0, center=mp.Vector3(100, 100),
                             material=mp.Medium())]
    t0 = time.perf_counter()
    scene.rasterize(gv, geom2, subpixel_n=3)
    t_py = time.perf_counter() - t0
    # informational: native should not be slower
    assert t_nat < t_py * 1.5, (t_nat, t_py)
