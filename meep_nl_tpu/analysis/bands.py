"""Photonic-crystal band structures by 2D plane-wave expansion (the role
of the bundled MPB solver: python/solver.py mode_solver / libpympb).

Ho-Chan-Soukoulis plane-wave method on a rectangular 2D lattice:

  TM (E out of plane):   |k+G|^2 e_G = w^2 sum_G' eps(G-G') e_G'
      -- a generalized Hermitian eigenproblem A e = w^2 B e with
      A = diag(|k+G|^2) and B the Toeplitz matrix of the epsilon Fourier
      coefficients (positive definite);
  TE (H out of plane):   sum_G' inv_eps(G-G') (k+G).(k+G') h_G' = w^2 h_G
      -- a standard Hermitian eigenproblem with the Fourier coefficients
      of 1/eps.

Validated against the exact empty-lattice (folded light-cone) bands and
cross-validated against this framework's own FDTD (Bloch-periodic unit
cell + Harminv) in tests/test_bands.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ModeSolver:
    """MPB-flavoured band solver for 2D rectangular lattices.

    num_bands: bands per k point
    k_points: list of Vector3-like (in units of 2 pi / a, MPB convention:
        fractional reciprocal-lattice coordinates)
    geometry: geometric objects (same classes as Simulation)
    lattice_size: (ax, ay) unit-cell size (default (1, 1))
    resolution: sampling resolution for the epsilon grid
    n_g: plane waves per axis (odd; default 15 -> 225 PWs)
    """
    num_bands: int = 8
    k_points: Sequence = ()
    geometry: Sequence = ()
    default_material: Any = None
    lattice_size: Sequence[float] = (1.0, 1.0)
    resolution: int = 32
    n_g: int = 15
    all_freqs: Optional[np.ndarray] = None

    def _eps_grid(self) -> np.ndarray:
        from ..models import scene
        from ..models.geom import Medium
        ax, ay = self.lattice_size
        n = int(self.resolution)
        xs = (np.arange(n) + 0.5) / n * ax - ax / 2
        ys = (np.arange(n) + 0.5) / n * ay - ay / 2
        xx, yy = np.meshgrid(xs, ys, indexing="ij")
        pts = np.zeros((xx.size, 3))
        pts[:, 0] = xx.ravel()
        pts[:, 1] = yy.ravel()
        default = self.default_material or Medium()
        idx = scene._material_at(pts, list(self.geometry), default)
        eps = scene._eps_of(idx, list(self.geometry), default, 2)
        return np.asarray(eps, np.float64).reshape(n, n)

    def _fourier(self, arr: np.ndarray) -> np.ndarray:
        """Fourier coefficients on the G lattice, centered."""
        f = np.fft.fft2(arr) / arr.size
        return np.fft.fftshift(f)

    def _setup(self):
        ng = self.n_g
        if ng % 2 == 0:
            ng += 1
        half = ng // 2
        gx = np.arange(-half, half + 1)
        self._g = np.array([(i, j) for i in gx for j in gx])  # (N, 2)
        eps = self._eps_grid()
        F_eps = self._fourier(eps)
        F_inv = self._fourier(1.0 / eps)
        n = eps.shape[0]
        c = n // 2 if n % 2 == 0 else (n - 1) // 2
        # centered index of G=0 in fftshifted array
        c0 = n // 2

        def coef(F, dg):
            return F[(c0 + dg[0]) % n, (c0 + dg[1]) % n]

        N = len(self._g)
        self._B_eps = np.empty((N, N), complex)
        self._B_inv = np.empty((N, N), complex)
        for a in range(N):
            dg = self._g[a] - self._g
            self._B_eps[a, :] = [coef(F_eps, d) for d in dg]
            self._B_inv[a, :] = [coef(F_inv, d) for d in dg]

    def _kg(self, k):
        """k+G vectors in physical units (k in fractional reciprocal
        coords, MPB convention)."""
        ax, ay = self.lattice_size
        bx, by = 2 * np.pi / ax, 2 * np.pi / ay
        kx = (float(k[0]) + self._g[:, 0]) * bx
        ky = (float(k[1]) + self._g[:, 1]) * by
        return kx, ky

    def run_tm(self) -> np.ndarray:
        """TM bands; returns (n_k, num_bands) frequencies in c/a units
        and stores them in .all_freqs."""
        from scipy.linalg import eigh
        self._setup()
        out = []
        for k in self.k_points:
            kv = tuple(k) if not hasattr(k, "x") else (k.x, k.y, k.z)
            kx, ky = self._kg(kv)
            A = np.diag(kx ** 2 + ky ** 2).astype(complex)
            w2 = eigh(A, self._B_eps,
                      eigvals_only=True)[: self.num_bands]
            out.append(np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi))
        self.all_freqs = np.array(out)
        return self.all_freqs

    def run_te(self) -> np.ndarray:
        """TE bands; returns (n_k, num_bands) frequencies in c/a units."""
        from scipy.linalg import eigh
        self._setup()
        kgs = []
        out = []
        for k in self.k_points:
            kv = tuple(k) if not hasattr(k, "x") else (k.x, k.y, k.z)
            kx, ky = self._kg(kv)
            dot = np.outer(kx, kx) + np.outer(ky, ky)
            H = self._B_inv * dot
            H = 0.5 * (H + H.conj().T)
            w2 = eigh(H, eigvals_only=True)[: self.num_bands]
            out.append(np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi))
        self.all_freqs = np.array(out)
        return self.all_freqs


def retrieve_gap(all_freqs: np.ndarray, band: int) -> float:
    """Relative gap (%) between band `band` and band+1 over the k path
    (MPB's retrieve_gap convention, 1-indexed bands)."""
    lo = float(all_freqs[:, band - 1].max())
    hi = float(all_freqs[:, band].min())
    mid = 0.5 * (lo + hi)
    return 100.0 * (hi - lo) / mid if hi > lo else 0.0
