"""GDSII layout import (role of src/GDSIIgeom.cpp, which wraps libGDSII).

A minimal pure-python GDSII stream reader: extracts BOUNDARY polygons per
layer and converts them to Prism objects.  Covers the subset the reference
uses (get_GDSII_prisms: polygons from layout layers -> prisms with given
height/axis); no SREF/AREF instancing in round 1.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.geom import Medium, Prism, Vector3

# GDSII record types
_HEADER, _BGNLIB, _LIBNAME, _UNITS, _ENDLIB = 0x00, 0x01, 0x02, 0x03, 0x04
_BGNSTR, _STRNAME, _ENDSTR = 0x05, 0x06, 0x07
_BOUNDARY, _PATH, _SREF = 0x08, 0x09, 0x0A
_LAYER, _DATATYPE, _XY, _ENDEL = 0x0D, 0x0E, 0x10, 0x11


def _read_records(data: bytes):
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        (length,) = struct.unpack(">H", data[pos:pos + 2])
        rtype = data[pos + 2]
        dtype = data[pos + 3]
        if length < 4:
            break
        payload = data[pos + 4: pos + length]
        yield rtype, dtype, payload
        pos += length


def read_gds_polygons(path: str, unit_scale: Optional[float] = None
                      ) -> Dict[int, List[List[Tuple[float, float]]]]:
    """{layer: [polygon, ...]} with coordinates in library user units.

    unit_scale overrides the GDS user-unit (default: the file's UNITS record
    user-units-per-database-unit)."""
    with open(path, "rb") as f:
        data = f.read()
    polys: Dict[int, List[List[Tuple[float, float]]]] = {}
    cur_layer = None
    in_boundary = False
    db_to_user = 1e-3  # typical default: 1 dbu = 0.001 um
    for rtype, dtype, payload in _read_records(data):
        if rtype == _UNITS and len(payload) >= 8:
            # first 8-byte GDSII real: user units per database unit
            db_to_user = _gds_real8(payload[:8])
        elif rtype == _BOUNDARY:
            in_boundary = True
            cur_layer = None
        elif rtype == _LAYER and in_boundary:
            (cur_layer,) = struct.unpack(">h", payload[:2])
        elif rtype == _XY and in_boundary and cur_layer is not None:
            npts = len(payload) // 8
            pts = []
            for i in range(npts):
                x, y = struct.unpack(">ii", payload[8 * i: 8 * i + 8])
                s = unit_scale if unit_scale is not None else db_to_user
                pts.append((x * s, y * s))
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            polys.setdefault(cur_layer, []).append(pts)
        elif rtype == _ENDEL:
            in_boundary = False
            cur_layer = None
    return polys


def _gds_real8(b: bytes) -> float:
    """GDSII 8-byte excess-64 real."""
    sign = -1.0 if b[0] & 0x80 else 1.0
    exponent = (b[0] & 0x7F) - 64
    mantissa = 0
    for byte in b[1:8]:
        mantissa = (mantissa << 8) | byte
    return sign * mantissa * (16.0 ** exponent) / (2 ** 56)


def get_GDSII_prisms(material: Medium, gds_path: str, layer: int,
                     zmin: float = 0.0, zmax: float = 0.0,
                     unit_scale: Optional[float] = None) -> List[Prism]:
    """Prisms from a layout layer (GDSIIgeom.cpp get_GDSII_prisms)."""
    polys = read_gds_polygons(gds_path, unit_scale)
    out = []
    height = zmax - zmin
    zc = 0.5 * (zmin + zmax)
    for pts in polys.get(layer, []):
        verts = [Vector3(x, y, 0) for (x, y) in pts]
        out.append(Prism(vertices=verts,
                         height=height if height > 0 else float("inf"),
                         material=material, center=Vector3(0, 0, zc)))
    return out


def GDSII_layers(gds_path: str) -> List[int]:
    """Sorted list of layer indices present in the stream
    (python/simulation.py GDSII_layers)."""
    return sorted(read_gds_polygons(gds_path).keys())


def GDSII_prisms(material: Medium, gds_path: str, layer: int = -1,
                 zmin: float = 0.0, zmax: float = 0.0) -> List[Prism]:
    """Reference-named alias of get_GDSII_prisms
    (python/simulation.py GDSII_prisms)."""
    return get_GDSII_prisms(material, gds_path, layer, zmin, zmax)


def GDSII_vol(gds_path: str, layer: int, zmin: float = 0.0,
              zmax: float = 0.0):
    """Bounding Volume of a layer (python/simulation.py GDSII_vol):
    center + size of the layer's polygon extent, z from [zmin, zmax]."""
    from ..models.geom import Volume
    polys = read_gds_polygons(gds_path).get(layer, [])
    if not polys:
        raise ValueError(f"no polygons on layer {layer} in {gds_path}")
    pts = np.concatenate([np.asarray(p, float) for p in polys])
    lo = pts.min(0)
    hi = pts.max(0)
    return Volume(center=Vector3(0.5 * (lo[0] + hi[0]),
                                 0.5 * (lo[1] + hi[1]),
                                 0.5 * (zmin + zmax)),
                  size=Vector3(hi[0] - lo[0], hi[1] - lo[1], zmax - zmin))
