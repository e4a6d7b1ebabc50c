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
