"""GDSII import and process-group sweeps."""

import struct
import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.io import gdsii as GDS
from meep_nl_tpu.parallel import groups as PG


def _write_minimal_gds(path, polys_by_layer):
    """Write a minimal GDSII stream with BOUNDARY elements."""
    def rec(rtype, dtype, payload=b""):
        return struct.pack(">HBB", 4 + len(payload), rtype, dtype) + payload

    def real8(v):
        # encode a positive excess-64 real
        if v == 0:
            return b"\x00" * 8
        exp = 0
        m = v
        while m < 1 / 16.0:
            m *= 16.0
            exp -= 1
        while m >= 1.0:
            m /= 16.0
            exp += 1
        mant = int(m * (2 ** 56))
        out = bytes([(exp + 64) & 0x7F])
        out += mant.to_bytes(7, "big")
        return out

    data = rec(0x00, 0x02, struct.pack(">h", 600))          # HEADER
    data += rec(0x01, 0x02, b"\x00" * 24)                    # BGNLIB
    data += rec(0x02, 0x06, b"lib\x00")                      # LIBNAME
    data += rec(0x03, 0x05, real8(1e-3) + real8(1e-9))       # UNITS
    data += rec(0x05, 0x02, b"\x00" * 24)                    # BGNSTR
    data += rec(0x06, 0x06, b"top\x00")                      # STRNAME
    for layer, polys in polys_by_layer.items():
        for pts in polys:
            data += rec(0x08, 0x00)                          # BOUNDARY
            data += rec(0x0D, 0x02, struct.pack(">h", layer))  # LAYER
            data += rec(0x0E, 0x02, struct.pack(">h", 0))    # DATATYPE
            xy = b"".join(struct.pack(">ii", int(x * 1000), int(y * 1000))
                          for x, y in pts + [pts[0]])
            data += rec(0x10, 0x03, xy)                      # XY
            data += rec(0x11, 0x00)                          # ENDEL
    data += rec(0x07, 0x00)                                  # ENDSTR
    data += rec(0x04, 0x00)                                  # ENDLIB
    with open(path, "wb") as f:
        f.write(data)


def test_gds_roundtrip_and_prisms(tmp_path):
    path = str(tmp_path / "t.gds")
    square = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)]
    _write_minimal_gds(path, {5: [square]})
    polys = GDS.read_gds_polygons(path)
    assert 5 in polys and len(polys[5]) == 1
    np.testing.assert_allclose(polys[5][0], square, atol=1e-9)
    prisms = GDS.get_GDSII_prisms(mp.Medium(epsilon=12), path, 5)
    assert len(prisms) == 1
    # the prism rasterizes: a point inside vs outside
    inside = prisms[0].inside(np.array([[1.0, 0.5, 0.0]]))
    outside = prisms[0].inside(np.array([[3.0, 0.5, 0.0]]))
    assert inside[0] and not outside[0]


def test_gds_in_simulation(tmp_path):
    path = str(tmp_path / "wg.gds")
    wg = [(-4.0, -0.5), (4.0, -0.5), (4.0, 0.5), (-4.0, 0.5)]
    _write_minimal_gds(path, {1: [wg]})
    geometry = GDS.get_GDSII_prisms(mp.Medium(epsilon=12), path, 1)
    sim = mp.Simulation(cell_size=mp.Vector3(8, 4), resolution=10,
                        geometry=geometry,
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.15, fwidth=0.1),
                            component=mp.Ez, center=mp.Vector3(-3, 0))],
                        boundary_layers=[mp.PML(1.0)])
    sim.init_sim()
    eps = sim.get_epsilon()
    ny = eps.shape[1] // 2
    assert eps[eps.shape[0] // 2, ny] > 10  # waveguide core present


def test_parameter_sweep_groups():
    def job(gi, radius):
        sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                            geometry=[mp.Cylinder(radius=radius,
                                                  material=mp.Medium(epsilon=4),
                                                  center=mp.Vector3())],
                            sources=[mp.Source(
                                mp.GaussianSource(frequency=1.0, fwidth=0.5),
                                component=mp.Ez, center=mp.Vector3(1.2, 0))])
        sim.run(until=4)
        return np.abs(np.asarray(sim.fields_state["f"]["ez"])).max()

    res = PG.run_parameter_sweep(job, [0.3, 0.6, 0.9], n_groups=2)
    merged = PG.merge_subgroup_data(res)
    assert merged.shape == (3,)
    assert np.all(merged > 0)


def _rec(rtype, dtype, payload=b""):
    return struct.pack(">HBB", 4 + len(payload), rtype, dtype) + payload


def _real8(v):
    if v == 0:
        return b"\x00" * 8
    sign = 0x80 if v < 0 else 0
    m = abs(v)
    exp = 0
    while m < 1 / 16.0:
        m *= 16.0
        exp -= 1
    while m >= 1.0:
        m /= 16.0
        exp += 1
    mant = int(round(m * (2 ** 56)))
    return bytes([sign | ((exp + 64) & 0x7F)]) + mant.to_bytes(7, "big")


def _write_gds_tree(path, structures):
    """structures: {name: {"polys": {layer: [pts]},
                           "refs": [(sname, kind, x, y, opts)]}}
    kind 'sref' or 'aref'; opts dict may carry reflect/mag/angle and for
    aref colrow=(nc, nr), colvec=(dx, dy), rowvec=(dx, dy) in user units."""
    data = _rec(0x00, 0x02, struct.pack(">h", 600))
    data += _rec(0x01, 0x02, b"\x00" * 24)
    data += _rec(0x02, 0x06, b"lib\x00")
    data += _rec(0x03, 0x05, _real8(1e-3) + _real8(1e-9))
    u = 1000  # dbu per user unit

    for name, st in structures.items():
        data += _rec(0x05, 0x02, b"\x00" * 24)
        nm = name.encode() + (b"\x00" if len(name) % 2 else b"")
        data += _rec(0x06, 0x06, nm)
        for layer, polys in st.get("polys", {}).items():
            for pts in polys:
                data += _rec(0x08, 0x00)
                data += _rec(0x0D, 0x02, struct.pack(">h", layer))
                data += _rec(0x0E, 0x02, struct.pack(">h", 0))
                xy = b"".join(struct.pack(">ii", int(round(x * u)),
                                          int(round(y * u)))
                              for x, y in pts + [pts[0]])
                data += _rec(0x10, 0x03, xy)
                data += _rec(0x11, 0x00)
        for sname, kind, x, y, opts in st.get("refs", []):
            data += _rec(0x0A if kind == "sref" else 0x0B, 0x00)
            snm = sname.encode() + (b"\x00" if len(sname) % 2 else b"")
            data += _rec(0x12, 0x06, snm)
            if opts.get("reflect") or "mag" in opts or "angle" in opts:
                bits = 0x8000 if opts.get("reflect") else 0
                data += _rec(0x1A, 0x01, struct.pack(">H", bits))
                if "mag" in opts:
                    data += _rec(0x1B, 0x05, _real8(opts["mag"]))
                if "angle" in opts:
                    data += _rec(0x1C, 0x05, _real8(opts["angle"]))
            if kind == "aref":
                nc, nr = opts["colrow"]
                data += _rec(0x13, 0x02, struct.pack(">hh", nc, nr))
                cvx, cvy = opts["colvec"]
                rvx, rvy = opts["rowvec"]
                pts = [(x, y), (x + nc * cvx, y + nc * cvy),
                       (x + nr * rvx, y + nr * rvy)]
            else:
                pts = [(x, y)]
            xy = b"".join(struct.pack(">ii", int(round(px * u)),
                                      int(round(py * u)))
                          for px, py in pts)
            data += _rec(0x10, 0x03, xy)
            data += _rec(0x11, 0x00)
        data += _rec(0x07, 0x00)
    data += _rec(0x04, 0x00)
    with open(path, "wb") as f:
        f.write(data)


def _raster(polys, lo=(-8, -8), hi=(8, 8), n=160):
    """Boolean even-odd rasterization of a polygon list on a point grid."""
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    XX, YY = np.meshgrid(xs, ys, indexing="ij")
    acc = np.zeros(XX.shape, bool)
    for pts in polys:
        p = np.asarray(pts, float)
        inside = np.zeros(XX.shape, bool)
        nv = len(p)
        for i in range(nv):
            x0, y0 = p[i]
            x1, y1 = p[(i + 1) % nv]
            cond = (y0 <= YY) != (y1 <= YY)
            with np.errstate(divide="ignore", invalid="ignore"):
                xc = x0 + (YY - y0) * (x1 - x0) / (y1 - y0)
            inside ^= cond & (XX < xc)
        acc ^= inside
    return acc


def test_gds_sref_transforms(tmp_path):
    """SREF with rotation + reflection + magnification flattens to the
    same polygons as the hand-transformed flat layout
    (GDSIIgeom.cpp:307 instancing via libGDSII)."""
    path = str(tmp_path / "h.gds")
    flat = str(tmp_path / "f.gds")
    # child: an L-shaped polygon (chiral: reflection changes it)
    L = [(0.0, 0.0), (2.0, 0.0), (2.0, 0.5), (0.5, 0.5), (0.5, 1.5),
         (0.0, 1.5)]
    refs = [("child", "sref", 1.0, 2.0, {}),
            ("child", "sref", -3.0, 0.0, {"angle": 90.0}),
            ("child", "sref", 3.0, -3.0, {"reflect": True, "mag": 2.0,
                                          "angle": 180.0})]
    _write_gds_tree(path, {
        "child": {"polys": {2: [L]}},
        "top": {"refs": refs}})

    def xform(pts, x, y, opts):
        m = np.eye(2)
        if opts.get("reflect"):
            m = np.diag([1.0, -1.0]) @ m
        m = opts.get("mag", 1.0) * m
        a = np.deg2rad(opts.get("angle", 0.0))
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        m = rot @ m
        return [tuple(m @ np.array(p) + np.array([x, y])) for p in pts]

    _write_gds_tree(flat, {"top": {"polys": {2: [
        xform(L, x, y, o) for (_, _, x, y, o) in refs]}}})
    got = GDS.read_gds_polygons(path)
    want = GDS.read_gds_polygons(flat)
    assert len(got[2]) == len(want[2]) == 3
    np.testing.assert_array_equal(_raster(got[2]), _raster(want[2]))
    assert _raster(got[2]).any()


def test_gds_nested_aref_raster_matches_flat(tmp_path):
    """Nested SREF->AREF expansion rasterizes to the same eps grid as the
    flattened equivalent (the VERDICT round-3 'Done' criterion)."""
    path = str(tmp_path / "a.gds")
    flat = str(tmp_path / "af.gds")
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    # mid holds a 3x2 array of child squares; top places mid twice
    _write_gds_tree(path, {
        "child": {"polys": {1: [sq]}},
        "mid": {"refs": [("child", "aref", 0.0, 0.0,
                          {"colrow": (3, 2), "colvec": (1.5, 0.0),
                           "rowvec": (0.0, 2.0)})]},
        "top": {"refs": [("mid", "sref", -6.0, -4.0, {}),
                         ("mid", "sref", 1.0, 1.0, {"angle": 90.0})]}})
    flat_polys = []
    for ox, oy, ang in ((-6.0, -4.0, 0.0), (1.0, 1.0, 90.0)):
        a = np.deg2rad(ang)
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        for j in range(2):
            for i in range(3):
                base = [(x + 1.5 * i, y + 2.0 * j) for x, y in sq]
                flat_polys.append([tuple(rot @ np.array(p)
                                         + np.array([ox, oy]))
                                   for p in base])
    _write_gds_tree(flat, {"top": {"polys": {1: flat_polys}}})
    got = GDS.read_gds_polygons(path)
    want = GDS.read_gds_polygons(flat)
    assert len(got[1]) == 12
    np.testing.assert_array_equal(_raster(got[1]), _raster(want[1]))
    # and through the prism/eps-grid route (scene rasterizer)
    gp = GDS.get_GDSII_prisms(mp.Medium(epsilon=12), path, 1, -0.1, 0.1)
    fp = GDS.get_GDSII_prisms(mp.Medium(epsilon=12), flat, 1, -0.1, 0.1)
    kw = dict(cell_size=mp.Vector3(16, 16), resolution=8)
    sim_g = mp.Simulation(geometry=gp, **kw)
    sim_f = mp.Simulation(geometry=fp, **kw)
    sim_g.init_sim()
    sim_f.init_sim()
    eg = sim_g.get_epsilon()
    ef = sim_f.get_epsilon()
    assert (eg > 10).sum() > 100
    np.testing.assert_allclose(eg, ef, rtol=0, atol=1e-12)


def test_gds_top_structure_detection(tmp_path):
    path = str(tmp_path / "t2.gds")
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    _write_gds_tree(path, {
        "leaf": {"polys": {1: [sq]}},
        "root": {"refs": [("leaf", "sref", 2.0, 0.0, {})]}})
    structures, _ = GDS.read_gds_library(path)
    assert GDS.top_structures(structures) == ["root"]
    polys = GDS.read_gds_polygons(path)
    # only the instanced copy (at +2) appears, not the leaf's original
    assert len(polys[1]) == 1
    np.testing.assert_allclose(polys[1][0][0], (2.0, 0.0), atol=1e-9)
