"""Native (C++) runtime components.

The reference's setup layer (meepgeom.cpp, libctlgeom) is C++; here the
hot rasterization loops are a small C++ library compiled on demand with g++
and bound through ctypes (pybind11 is not available in this environment).
Falls back to the NumPy path transparently if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rasterize.cpp")
_SO = os.path.join(_HERE, "_rasterize.so")
_lock = threading.Lock()
_lib = None
_tried = False

NPARAM = 16


def _build() -> Optional[ctypes.CDLL]:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.material_at.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.eps_averaged.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
        return _lib


def serialize_objects(geometry) -> Optional[np.ndarray]:
    """Pack supported objects into the native parameter table; None if any
    object type is unsupported (caller falls back to NumPy)."""
    from ..models import geom as GM

    rows = []
    for obj in geometry:
        row = np.zeros(NPARAM)
        c = GM._v3(obj.center)
        row[1:4] = (c.x, c.y, c.z)
        if type(obj) is GM.Sphere:
            row[0] = 0
            row[4] = obj.radius
        elif type(obj) is GM.Block or type(obj) is GM.Ellipsoid:
            row[0] = 1 if type(obj) is GM.Block else 3
            size = GM._v3(obj.size)
            for k, (ei, s) in enumerate(zip((obj.e1, obj.e2, obj.e3),
                                            (size.x, size.y, size.z))):
                e = np.array(tuple(GM._v3(ei)), float)
                e = e / np.linalg.norm(e)
                row[4 + k] = 1e30 if s == float("inf") else s / 2
                row[7 + 3 * k: 10 + 3 * k] = e
        elif type(obj) is GM.Cylinder:
            row[0] = 2
            row[4] = obj.radius
            row[5] = 1e30 if obj.height == float("inf") else obj.height / 2
            a = np.array(tuple(GM._v3(obj.axis)), float)
            row[6:9] = a / np.linalg.norm(a)
        else:
            return None
        rows.append(row)
    return np.asarray(rows) if rows else np.zeros((0, NPARAM))


def material_at_native(pts: np.ndarray, objs: np.ndarray) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts.reshape(-1, 3), np.float64)
    objs = np.ascontiguousarray(objs, np.float64)
    out = np.empty(len(pts), np.int32)
    lib.material_at(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        objs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(objs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def eps_averaged_native(pts, offs, objs, eps_of, eps_default):
    lib = get_lib()
    pts = np.ascontiguousarray(pts.reshape(-1, 3), np.float64)
    offs = np.ascontiguousarray(offs.reshape(-1, 3), np.float64)
    objs = np.ascontiguousarray(objs, np.float64)
    eps_of = np.ascontiguousarray(eps_of, np.float64)
    me = np.empty(len(pts))
    mi = np.empty(len(pts))
    lib.eps_averaged(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(offs),
        objs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(objs),
        eps_of.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(eps_default),
        me.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return me, mi
