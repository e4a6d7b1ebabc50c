"""MPBData: transform band-solver unit-cell output for visualization
(the role of the reference's python/mpb_data.py MPBData / the mpb-data
command-line tool).

Operations, composable exactly as in the reference:
  * periods  - tile the unit cell over multiple lattice periods, applying
               the inter-cell Bloch phase exp(2 pi i k . R) when `kpoint`
               is given (mpb_data.py:120 handle_cvector_dataset);
  * rectify  - resample a non-orthogonal (e.g. triangular/fcc) lattice
               onto an orthogonal Cartesian grid covering the bounding box
               of the tiled cell, sampling the infinite crystal
               periodically (mpb_data.py:175 map_data);
  * resolution - resample at a given number of pixels per unit length.

Fields produced by ModeSolver / ModeSolver3D carry CARTESIAN vector
components already (unlike raw MPB output in lattice coordinates), so no
component rotation is needed on rectify.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
from scipy.ndimage import map_coordinates


def _as_lattice(lattice, ndim: int) -> np.ndarray:
    """Row-vector lattice matrix (ndim x ndim)."""
    if lattice is None:
        return np.eye(ndim)
    A = np.asarray(lattice, np.float64)
    if A.ndim == 1:                      # (ax, ay[, az]) cell sizes
        return np.diag(A[:ndim])
    return A[:ndim, :ndim]


class MPBData:
    """`MPBData(lattice=..., rectify=True, periods=3, resolution=32)`;
    then `convert(arr, kpoint=None)` with `arr` a scalar unit-cell grid
    (n0, n1[, n2]) or a vector field (..., 3).

    lattice: row-vector lattice matrix (2x2 / 3x3), or (ax, ay[, az])
        for rectangular cells, or a ModeSolver/ModeSolver3D instance.
    """

    def __init__(self, lattice: Any = None, rectify: bool = False,
                 periods: Any = 1, resolution: Optional[int] = None):
        if hasattr(lattice, "lattice_size"):          # 2D ModeSolver
            lattice = tuple(lattice.lattice_size)
        elif hasattr(lattice, "_lattice"):            # ModeSolver3D
            lattice = lattice._lattice()[0]
        self.lattice = lattice
        self.rectify = bool(rectify)
        self.periods = periods
        self.resolution = resolution

    def convert(self, arr: np.ndarray,
                kpoint: Optional[Sequence[float]] = None,
                vector: Optional[bool] = None) -> np.ndarray:
        """Tile/phase a unit-cell grid.  `vector=None` auto-detects a
        trailing component axis from the shape, which is ambiguous for a
        genuine 3D scalar grid with nz == 3 (or any (n, m, 3) scalar
        slab) — pass vector=False/True explicitly to override."""
        arr = np.asarray(arr)
        if vector is None:
            vector = arr.ndim >= 2 and arr.shape[-1] == 3 and \
                arr.ndim - 1 in (2, 3) and arr.shape[0] != 3
        else:
            vector = bool(vector)
        ndim = arr.ndim - 1 if vector else arr.ndim
        if ndim not in (2, 3):
            raise ValueError(f"expected a 2D/3D unit-cell grid, got shape "
                             f"{arr.shape}")
        A = _as_lattice(self.lattice, ndim)
        periods = self.periods
        if np.isscalar(periods):
            periods = (int(periods),) * ndim
        periods = tuple(int(p) for p in periods)
        shape = arr.shape[:ndim]
        kfrac = None if kpoint is None else np.asarray(
            [kpoint[i] if not hasattr(kpoint, "x")
             else (kpoint.x, kpoint.y, kpoint.z)[i] for i in range(ndim)],
            np.float64)

        if self.rectify:
            # bounding box of the tiled parallelepiped in Cartesian coords
            corners = np.array(
                [c for c in np.ndindex(*(2,) * ndim)], np.float64)
            corners *= np.asarray(periods, np.float64)
            xyz = corners @ A
            lo, hi = xyz.min(axis=0), xyz.max(axis=0)
            if self.resolution is not None:
                res = float(self.resolution)
            else:
                res = shape[0] / np.linalg.norm(A[0])
            ns = [max(2, int(round((h - l) * res))) for l, h in zip(lo, hi)]
            axes = [lo[d] + (np.arange(ns[d]) + 0.5) * (hi[d] - lo[d]) / ns[d]
                    for d in range(ndim)]
            X = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
            F = X.reshape(-1, ndim) @ np.linalg.inv(A)    # fractional
        else:
            ns = [int(round((self.resolution or (shape[d] /
                   np.linalg.norm(A[d]))) * np.linalg.norm(A[d]) * periods[d]))
                  if self.resolution is not None else shape[d] * periods[d]
                  for d in range(ndim)]
            axes = [np.asarray(periods, np.float64)[d] *
                    (np.arange(ns[d]) + 0.5) / ns[d] for d in range(ndim)]
            F = np.stack(np.meshgrid(*axes, indexing="ij"),
                         axis=-1).reshape(-1, ndim)

        # sample the infinite crystal: periodic interp of the unit cell.
        # grid sample i sits at fractional coordinate (i + 0.5)/n
        coords = [(np.mod(F[:, d], 1.0)) * shape[d] - 0.5
                  for d in range(ndim)]

        if kfrac is not None:
            # fields are stored WITH their intra-cell Bloch phase, which is
            # NOT periodic across the cell seam — interpolating it directly
            # would blend mismatched phases.  Strip it, interpolate the
            # periodic part u, and re-apply the full exp(2 pi i k . f)
            # (the exact Bloch continuation; mpb_data.py:120 role).
            fg = np.meshgrid(*[(np.arange(s) + 0.5) / s for s in shape],
                             indexing="ij")
            intra = np.exp(-2j * np.pi * sum(
                kfrac[d] * fg[d] for d in range(ndim)))
            arr = arr * (intra[..., None] if vector else intra)

        def interp(a):
            if np.iscomplexobj(a):
                return (map_coordinates(a.real, coords, order=1,
                                        mode="grid-wrap")
                        + 1j * map_coordinates(a.imag, coords, order=1,
                                               mode="grid-wrap"))
            return map_coordinates(a, coords, order=1, mode="grid-wrap")

        if vector:
            out = np.stack([interp(arr[..., c]) for c in range(3)], axis=-1)
        else:
            out = interp(arr)

        if kfrac is not None:
            phase = np.exp(2j * np.pi * (F @ kfrac))
            out = out * (phase[:, None] if vector else phase)

        new_shape = tuple(ns) + ((3,) if vector else ())
        return out.reshape(new_shape)
