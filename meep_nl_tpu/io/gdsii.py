"""GDSII layout import (role of src/GDSIIgeom.cpp, which wraps libGDSII).

A pure-python GDSII stream reader: parses the full structure tree
(BGNSTR/STRNAME), BOUNDARY polygons, and SREF/AREF instancing with the
complete STRANS transform set (x-reflection, magnification, rotation,
array column/row lattices), then flattens top-level cells into per-layer
polygon lists.  This covers the subset the reference uses via libGDSII
(GDSIIgeom.cpp:307 get_GDSII_prisms: polygons from layout layers ->
prisms with given height/axis) including hierarchical layouts — any real
PDK layout uses cell references/arrays.
"""

from __future__ import annotations

import struct
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from ..models.geom import Medium, Prism, Vector3

# GDSII record types
_HEADER, _BGNLIB, _LIBNAME, _UNITS, _ENDLIB = 0x00, 0x01, 0x02, 0x03, 0x04
_BGNSTR, _STRNAME, _ENDSTR = 0x05, 0x06, 0x07
_BOUNDARY, _PATH, _SREF, _AREF = 0x08, 0x09, 0x0A, 0x0B
_LAYER, _DATATYPE, _XY, _ENDEL = 0x0D, 0x0E, 0x10, 0x11
_SNAME, _COLROW, _STRANS, _MAG, _ANGLE = 0x12, 0x13, 0x1A, 0x1B, 0x1C


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


def _gds_real8(b: bytes) -> float:
    """GDSII 8-byte excess-64 real."""
    sign = -1.0 if b[0] & 0x80 else 1.0
    exponent = (b[0] & 0x7F) - 64
    mantissa = 0
    for byte in b[1:8]:
        mantissa = (mantissa << 8) | byte
    return sign * mantissa * (16.0 ** exponent) / (2 ** 56)


class _Ref(NamedTuple):
    """One SREF/AREF element (transform + placement lattice)."""
    sname: str
    reflect: bool           # STRANS bit 15: mirror about x-axis (pre-rot)
    mag: float
    angle_deg: float        # CCW degrees
    xy: List[Tuple[int, int]]   # 1 point (SREF) or 3 (AREF), in dbu
    colrow: Optional[Tuple[int, int]]   # (ncols, nrows) for AREF


class _Struct(NamedTuple):
    polys: List[Tuple[int, np.ndarray]]   # (layer, (N,2) dbu vertices)
    refs: List[_Ref]


def read_gds_library(path: str):
    """Parse the stream into (structures, db_to_user).

    structures: {name: _Struct} with coordinates kept in database units
    (flattening composes integer-free affine transforms; scaling to user
    units happens once at the end)."""
    with open(path, "rb") as f:
        data = f.read()
    structures: Dict[str, _Struct] = {}
    db_to_user = 1e-3   # typical default: 1 dbu = 0.001 um
    cur: Optional[_Struct] = None
    # element state
    kind = None         # 'boundary' | 'sref' | 'aref' | None
    layer = None
    sname = ""
    reflect = False
    mag = 1.0
    angle = 0.0
    colrow = None
    xy: List[Tuple[int, int]] = []
    for rtype, dtype, payload in _read_records(data):
        if rtype == _UNITS and len(payload) >= 8:
            db_to_user = _gds_real8(payload[:8])
        elif rtype == _BGNSTR:
            cur = _Struct([], [])
        elif rtype == _STRNAME and cur is not None:
            name = payload.rstrip(b"\x00").decode("ascii", "replace")
            structures[name] = cur
        elif rtype == _ENDSTR:
            cur = None
        elif rtype in (_BOUNDARY, _SREF, _AREF):
            kind = {_BOUNDARY: "boundary", _SREF: "sref",
                    _AREF: "aref"}[rtype]
            layer = None
            sname = ""
            reflect, mag, angle, colrow, xy = False, 1.0, 0.0, None, []
        elif rtype == _LAYER and kind == "boundary":
            (layer,) = struct.unpack(">h", payload[:2])
        elif rtype == _SNAME and kind in ("sref", "aref"):
            sname = payload.rstrip(b"\x00").decode("ascii", "replace")
        elif rtype == _STRANS and kind in ("sref", "aref"):
            (bits,) = struct.unpack(">H", payload[:2])
            reflect = bool(bits & 0x8000)
        elif rtype == _MAG and kind in ("sref", "aref"):
            mag = _gds_real8(payload[:8])
        elif rtype == _ANGLE and kind in ("sref", "aref"):
            angle = _gds_real8(payload[:8])
        elif rtype == _COLROW and kind == "aref":
            colrow = struct.unpack(">hh", payload[:4])
        elif rtype == _XY:
            npts = len(payload) // 8
            xy = [struct.unpack(">ii", payload[8 * i: 8 * i + 8])
                  for i in range(npts)]
        elif rtype == _ENDEL:
            if cur is not None:
                if kind == "boundary" and layer is not None and xy:
                    pts = np.asarray(xy, np.float64)
                    if len(pts) > 1 and tuple(pts[0]) == tuple(pts[-1]):
                        pts = pts[:-1]
                    cur.polys.append((layer, pts))
                elif kind in ("sref", "aref") and sname and xy:
                    cur.refs.append(_Ref(sname, reflect, mag, angle, xy,
                                         colrow))
            kind = None
    return structures, db_to_user


def _ref_matrix(ref: _Ref) -> np.ndarray:
    """2x2 linear part of the instance transform: reflect about the
    x-axis FIRST, then magnify, then rotate CCW (the GDSII order)."""
    m = np.eye(2)
    if ref.reflect:
        m = np.diag([1.0, -1.0]) @ m
    m = ref.mag * m
    deg = ref.angle_deg % 360.0
    if deg in (0.0, 90.0, 180.0, 270.0):
        # exact quarter turns: keep instanced geometry on the dbu lattice
        c, s = {0.0: (1.0, 0.0), 90.0: (0.0, 1.0),
                180.0: (-1.0, 0.0), 270.0: (0.0, -1.0)}[deg]
    else:
        a = np.deg2rad(deg)
        c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s], [s, c]])
    return rot @ m


def _flatten(structures: Dict[str, _Struct], name: str,
             _stack: Tuple[str, ...] = ()) -> List[Tuple[int, np.ndarray]]:
    """All polygons of `name` with every SREF/AREF expanded, in the
    structure's own (dbu) coordinates."""
    if name in _stack:
        raise ValueError(f"GDSII reference cycle through '{name}'")
    st = structures.get(name)
    if st is None:
        raise ValueError(f"GDSII structure '{name}' not found")
    out = [(lay, pts.copy()) for lay, pts in st.polys]
    for ref in st.refs:
        child = _flatten(structures, ref.sname, _stack + (name,))
        mat = _ref_matrix(ref).T            # row-vector convention
        if ref.colrow is None or len(ref.xy) < 3:
            origins = [np.asarray(ref.xy[0], np.float64)]
        else:
            ncols, nrows = ref.colrow
            p1 = np.asarray(ref.xy[0], np.float64)
            cv = (np.asarray(ref.xy[1], np.float64) - p1) / max(ncols, 1)
            rv = (np.asarray(ref.xy[2], np.float64) - p1) / max(nrows, 1)
            origins = [p1 + i * cv + j * rv
                       for j in range(nrows) for i in range(ncols)]
        for t in origins:
            for lay, pts in child:
                out.append((lay, pts @ mat + t))
    return out


def top_structures(structures: Dict[str, _Struct]) -> List[str]:
    """Structure names never referenced by another structure."""
    referenced = {r.sname for st in structures.values() for r in st.refs}
    return [n for n in structures if n not in referenced]


def read_gds_polygons(path: str, unit_scale: Optional[float] = None,
                      cell: Optional[str] = None
                      ) -> Dict[int, List[List[Tuple[float, float]]]]:
    """{layer: [polygon, ...]} with coordinates in library user units,
    with all SREF/AREF references of the top cell(s) flattened.

    unit_scale overrides the GDS user-unit (default: the file's UNITS
    record user-units-per-database-unit).  cell selects one structure as
    the root; default: every top (unreferenced) structure."""
    structures, db_to_user = read_gds_library(path)
    s = unit_scale if unit_scale is not None else db_to_user
    roots = [cell] if cell is not None else top_structures(structures)
    polys: Dict[int, List[List[Tuple[float, float]]]] = {}
    for root in roots:
        for lay, pts in _flatten(structures, root):
            polys.setdefault(lay, []).append(
                [(x * s, y * s) for x, y in pts])
    return polys


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
