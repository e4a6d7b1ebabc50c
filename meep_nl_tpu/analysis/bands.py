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

    def run_tm(self, *band_functions) -> np.ndarray:
        """TM bands; returns (n_k, num_bands) frequencies in c/a units
        and stores them in .all_freqs.  Band functions are applied per
        k point (solver.py run_parity: one-arg funcs once per k,
        two-arg funcs once per band)."""
        from scipy.linalg import eigh
        self._setup()
        self.parity = "tm"
        out = []
        for ki, k in enumerate(self.k_points):
            kv = tuple(k) if not hasattr(k, "x") else (k.x, k.y, k.z)
            kx, ky = self._kg(kv)
            A = np.diag(kx ** 2 + ky ** 2).astype(complex)
            w2 = eigh(A, self._B_eps,
                      eigvals_only=True)[: self.num_bands]
            out.append(np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi))
            self.all_freqs = np.array(out)
            _apply_band_funcs(self, band_functions, ki)
        self.all_freqs = np.array(out)
        return self.all_freqs

    def get_epsilon(self) -> np.ndarray:
        """Unit-cell epsilon grid (for MPBData / plotting)."""
        return self._eps_grid()

    def get_efield_tm(self, k_index: int, band: int,
                      n: Optional[int] = None) -> np.ndarray:
        """Real-space Ez Bloch field (n, n) of one TM band, intra-cell
        phase included (the role of mode_solver.get_efield +
        MPBData.convert; fields here are synthesized directly from the
        planewave coefficients)."""
        from scipy.linalg import eigh
        if not hasattr(self, "_g"):
            self._setup()
        k = self.k_points[k_index]
        kv = tuple(k) if not hasattr(k, "x") else (k.x, k.y, k.z)
        kx, ky = self._kg(kv)
        A = np.diag(kx ** 2 + ky ** 2).astype(complex)
        w2, V = eigh(A, self._B_eps)
        v = V[:, band - 1]                       # Ez(G) coefficients
        n = n or int(self.resolution)
        acc = np.zeros((n, n), complex)
        for (gi, gj), c in zip(self._g, v):
            # half-pixel shift: samples sit at f = (i + 0.5)/n
            acc[gi % n, gj % n] += c * np.exp(1j * np.pi * (gi + gj) / n)
        u = np.fft.ifftn(acc) * n * n            # sum_g v_g e^{2pi i g.f}
        f = (np.arange(n) + 0.5) / n
        ph = np.exp(2j * np.pi * (float(kv[0]) * f[:, None]
                                  + float(kv[1]) * f[None, :]))
        return u * ph

    def run_te(self, *band_functions) -> np.ndarray:
        """TE bands; returns (n_k, num_bands) frequencies in c/a units."""
        from scipy.linalg import eigh
        self._setup()
        self.parity = "te"
        out = []
        for ki, k in enumerate(self.k_points):
            kv = tuple(k) if not hasattr(k, "x") else (k.x, k.y, k.z)
            kx, ky = self._kg(kv)
            dot = np.outer(kx, kx) + np.outer(ky, ky)
            H = self._B_inv * dot
            H = 0.5 * (H + H.conj().T)
            w2 = eigh(H, eigvals_only=True)[: self.num_bands]
            out.append(np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi))
            self.all_freqs = np.array(out)
            _apply_band_funcs(self, band_functions, ki)
        self.all_freqs = np.array(out)
        return self.all_freqs

    def run(self, *band_functions) -> np.ndarray:
        """NO_PARITY run (solver.py:971): in 2D the TE and TM problems
        decouple, so the unpolarized spectrum is their sorted union."""
        tm = np.array(self.run_tm())
        te = np.array(self.run_te(*band_functions))
        both = np.sort(np.concatenate([tm, te], axis=1), axis=1)
        self.parity = None
        self.all_freqs = both[:, : self.num_bands]
        return self.all_freqs


def retrieve_gap(all_freqs: np.ndarray, band: int) -> float:
    """Relative gap (%) between band `band` and band+1 over the k path
    (MPB's retrieve_gap convention, 1-indexed bands)."""
    lo = float(all_freqs[:, band - 1].max())
    hi = float(all_freqs[:, band].min())
    mid = 0.5 * (lo + hi)
    return 100.0 * (hi - lo) / mid if hi > lo else 0.0


# ---------------------------------------------------------------------------
# 3D full-vector plane-wave solver (arbitrary lattices)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ModeSolver3D:
    """Full-vector 3D plane-wave band solver on an arbitrary Bravais
    lattice (the role of MPB's mode_solver, libpympb/pympb.cpp:2846 /
    python/solver.py:1395).

    Solves the transverse-H Maxwell eigenproblem (Ho-Chan-Soukoulis 1990;
    Johnson & Joannopoulos 2001 formulation): with H expanded in the two
    polarizations transverse to each k+G,

        M[(G,l),(G',l')] = |k+G||k+G'| (khat x e_l).eta(G-G').(khat' x e_l')

    where eta is the Fourier transform of the SMOOTHED inverse-epsilon
    TENSOR: interface voxels get MPB's subpixel rule (mean of 1/eps along
    the interface normal, 1/mean(eps) tangentially; mpb/maxwell epsilon
    averaging), which removes the O(1/n_g) staircase error of the scalar
    1/eps rule.  M is Hermitian; its eigenvalues are w^2.  Dense eigh over
    (2 N_pw)^2 - adequate for the n_g <= 9 (1458x1458) band-diagram
    regime.

    basis: 3x3 row-major lattice vectors a_i (default identity = simple
        cubic with a = 1); k_points are FRACTIONAL reciprocal coordinates
        (MPB convention).
    Extras the reference exposes that ride along here: `kdom` (dominant
    planewave per band, mpb.cpp get_eigenmode kdom), `zparities`
    (sigma_z expectation, MPB display_zparities), and
    `compute_group_velocities` (central-difference dw/dk).
    """
    num_bands: int = 8
    k_points: Sequence = ()
    geometry: Sequence = ()
    default_material: Any = None
    basis: Any = None                 # 3x3 lattice vectors (rows)
    resolution: int = 16
    n_g: int = 7
    all_freqs: Optional[np.ndarray] = None

    def _lattice(self):
        A = np.eye(3) if self.basis is None else np.asarray(self.basis,
                                                            np.float64)
        B = 2 * np.pi * np.linalg.inv(A).T   # reciprocal rows b_i
        return A, B

    def _eps_grid(self, n: int) -> np.ndarray:
        from ..models import scene
        from ..models.geom import Medium
        A, _ = self._lattice()
        f = (np.arange(n) + 0.5) / n - 0.5
        F = np.stack(np.meshgrid(f, f, f, indexing="ij"), axis=-1)  # (n,n,n,3)
        pts = F.reshape(-1, 3) @ A
        default = self.default_material or Medium()
        idx = scene._material_at(pts, list(self.geometry), default)
        # isotropic sampling (x row); anisotropic lattices are out of this
        # solver's scope, as in MPB's default run
        eps = scene._eps_of(idx, list(self.geometry), default, 0)
        return np.asarray(eps, np.float64).reshape(n, n, n)

    def _inv_eps_tensor(self) -> np.ndarray:
        """(n,n,n,3,3) smoothed inverse-epsilon tensor: per voxel, harmonic
        (mean-of-inverse) along the interface normal and inverse-of-mean
        tangentially (MPB's maxwell_epsilon subpixel rule).  Normals come
        from the gradient of the supersampled fill profile, mapped to
        Cartesian through the reciprocal basis."""
        A, B = self._lattice()
        # the tensor grid MATCHES the retained harmonics (n = n_g): keeping
        # only the FFT modes of a grid exactly as coarse as the planewave
        # basis lets the subpixel smoothing absorb the interface jump
        # instead of truncating it (Gibbs); `resolution` sets the fill
        # supersampling (measured: zone-edge Bragg band-1 error 3.0% ->
        # 0.75% at n_g = 9 for eps = 13)
        n = self.n_g + (self.n_g % 2 == 0)
        s = max(3, int(round(self.resolution / n)))
        fine = self._eps_grid(s * n)
        v = fine.reshape(n, s, n, s, n, s)
        mean_eps = v.mean(axis=(1, 3, 5))
        mean_inv = (1.0 / v).mean(axis=(1, 3, 5))
        # normals: periodic central differences of mean_eps in fractional
        # coords; d/dr = (dfrac) @ B / (2 pi) direction-wise
        grads_frac = np.stack(
            [ (np.roll(mean_eps, -1, ax) - np.roll(mean_eps, 1, ax))
              for ax in range(3) ], axis=-1)
        grads = grads_frac @ (B.T / (2 * np.pi))
        norm = np.linalg.norm(grads, axis=-1, keepdims=True)
        nhat = np.where(norm > 1e-12, grads / np.maximum(norm, 1e-300), 0.0)
        nn = nhat[..., :, None] * nhat[..., None, :]
        eye = np.eye(3)
        tau = (mean_inv[..., None, None] * nn
               + (1.0 / mean_eps)[..., None, None] * (eye - nn))
        # uniform voxels (norm ~ 0): nn = 0 -> tau = (1/mean_eps) I, exact
        return tau

    def _setup(self):
        ng = self.n_g + (self.n_g % 2 == 0)
        half = ng // 2
        r = np.arange(-half, half + 1)
        self._g = np.array([(i, j, k) for i in r for j in r for k in r])
        tau = self._inv_eps_tensor()
        n = tau.shape[0]
        assert n == ng
        c0 = n // 2
        G = self._g
        dg = G[:, None, :] - G[None, :, :]              # (N, N, 3)
        ii = ((c0 + dg[..., 0]) % n, (c0 + dg[..., 1]) % n,
              (c0 + dg[..., 2]) % n)
        self._eta = np.empty(dg.shape[:2] + (3, 3), complex)
        for a in range(3):
            for b in range(3):
                F = np.fft.fftshift(np.fft.fftn(tau[..., a, b]) / n ** 3)
                self._eta[..., a, b] = F[ii]

    def _solve_k(self, kfrac, want_vectors=False):
        _, B = self._lattice()
        K = (np.asarray(kfrac, np.float64) + self._g) @ B     # (N, 3)
        mag = np.linalg.norm(K, axis=1)
        khat = np.where(mag[:, None] > 1e-12, K / np.maximum(
            mag[:, None], 1e-300), np.array([0.0, 0.0, 1.0]))
        # orthonormal transverse pair (e1, e2) with khat = e1 x e2
        ref = np.where(np.abs(khat[:, 2:3]) < 0.9,
                       np.array([0.0, 0.0, 1.0]),
                       np.array([1.0, 0.0, 0.0]))
        e1 = np.cross(ref, khat)
        e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
        e2 = np.cross(khat, e1)
        # khat x e1 = e2, khat x e2 = -e1
        cr = np.stack([e2, -e1], axis=0)                # (2, N, 3)
        dots = np.einsum("lax,abxy,mby->lamb", cr, self._eta, cr)
        M = (mag[None, :, None, None] * mag[None, None, None, :] * dots)
        # F-order flattening pairs (l, a) -> l + 2a on rows and (m, b) ->
        # m + 2b on columns; eigenvector reshape(N, 2) inverts it
        M = M.reshape(2 * len(K), 2 * len(K), order="F")
        from scipy.linalg import eigh
        Mh = 0.5 * (M + M.conj().T)
        if want_vectors:
            w2, V = eigh(Mh)
            return (np.sqrt(np.maximum(w2[: self.num_bands], 0.0))
                    / (2 * np.pi), V[:, : self.num_bands], K, mag, e1, e2)
        w2 = eigh(Mh, eigvals_only=True)[: self.num_bands]
        return np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi)

    def run(self, *band_functions) -> np.ndarray:
        """All bands at every k point; also records kdom and y/z
        parities; band functions applied per k point (solver.py
        run_parity semantics)."""
        self._setup()
        out = []
        self.kdom = []
        self.zparities = []
        self.yparities = []
        key = None
        for ki, k in enumerate(self.k_points):
            kv = (k.x, k.y, k.z) if hasattr(k, "x") else tuple(k)
            freqs, V, K, mag, e1, e2 = self._solve_k(kv, want_vectors=True)
            out.append(freqs)
            N = len(K)
            kd = []
            zp = []
            yp = []
            if key is None:
                key = {tuple(g): i for i, g in enumerate(self._g)}

            def mirror_parity(Hvec, axis):
                # sigma_axis expectation: overlap of H with its mirror
                # image (G_axis -> -G_axis; H is a pseudovector, so the
                # axis component stays and the others flip)
                sign = -np.ones(3)
                sign[axis] = 1.0
                Hm = np.zeros_like(Hvec)
                for i, g in enumerate(self._g):
                    gm = list(g)
                    gm[axis] = -gm[axis]
                    Hm[i] = Hvec[key[tuple(gm)]] * sign
                num = np.real(np.sum(np.conj(Hvec) * Hm))
                den = np.real(np.sum(np.conj(Hvec) * Hvec))
                return num / max(den, 1e-300)

            for b in range(len(freqs)):
                h = V[:, b].reshape(N, 2)
                amp2 = np.sum(np.abs(h) ** 2, axis=1)
                gi = int(np.argmax(amp2))
                kd.append(K[gi] / (2 * np.pi))
                Hvec = h[:, 0:1] * e1 + h[:, 1:2] * e2        # (N, 3)
                zp.append(mirror_parity(Hvec, 2))
                yp.append(mirror_parity(Hvec, 1))
            self.kdom.append(np.array(kd))
            self.zparities.append(np.array(zp))
            self.yparities.append(np.array(yp))
            self.all_freqs = np.array(out)
            _apply_band_funcs(self, band_functions, ki)
        self.all_freqs = np.array(out)
        return self.all_freqs

    def get_epsilon(self, n: Optional[int] = None) -> np.ndarray:
        """Unit-cell epsilon grid (n,n,n) for MPBData / plotting."""
        return self._eps_grid(n or int(self.resolution))

    def _synth(self, vecs: np.ndarray, kv, n: int) -> np.ndarray:
        """sum_g V_g e^{2 pi i g.f} on an (n,n,n,3) fractional grid with
        intra-cell Bloch phase; samples at f = (i + 0.5)/n."""
        acc = np.zeros((n, n, n, 3), complex)
        for (gi, gj, gk), v in zip(self._g, vecs):
            ph = np.exp(1j * np.pi * (gi + gj + gk) / n)
            acc[gi % n, gj % n, gk % n] += v * ph
        u = np.fft.ifftn(acc, axes=(0, 1, 2)) * n ** 3
        f = (np.arange(n) + 0.5) / n
        kf = np.asarray(kv, np.float64)
        ph = np.exp(2j * np.pi * (kf[0] * f[:, None, None]
                                  + kf[1] * f[None, :, None]
                                  + kf[2] * f[None, None, :]))
        return u * ph[..., None]

    def get_hfield(self, k_index: int, band: int,
                   n: Optional[int] = None) -> np.ndarray:
        """Real-space H Bloch field (n,n,n,3), CARTESIAN components,
        intra-cell phase included (mode_solver get_hfield role)."""
        self._setup() if not hasattr(self, "_g") else None
        k = self.k_points[k_index]
        kv = (k.x, k.y, k.z) if hasattr(k, "x") else tuple(k)
        freqs, V, K, mag, e1, e2 = self._solve_k(kv, want_vectors=True)
        h = V[:, band - 1].reshape(len(K), 2)
        Hvec = h[:, 0:1] * e1 + h[:, 1:2] * e2
        return self._synth(Hvec, kv, n or int(self.resolution))

    def get_dfield(self, k_index: int, band: int,
                   n: Optional[int] = None) -> np.ndarray:
        """Real-space D Bloch field (n,n,n,3): D_G ~ -(k+G) x H_G / w
        (Maxwell, planewave basis)."""
        self._setup() if not hasattr(self, "_g") else None
        k = self.k_points[k_index]
        kv = (k.x, k.y, k.z) if hasattr(k, "x") else tuple(k)
        freqs, V, K, mag, e1, e2 = self._solve_k(kv, want_vectors=True)
        h = V[:, band - 1].reshape(len(K), 2)
        Hvec = h[:, 0:1] * e1 + h[:, 1:2] * e2
        w = max(2 * np.pi * freqs[band - 1], 1e-12)
        Dvec = -np.cross(K, Hvec) / w
        return self._synth(Dvec, kv, n or int(self.resolution))

    def get_efield(self, k_index: int, band: int,
                   n: Optional[int] = None) -> np.ndarray:
        """Real-space E field: D divided pointwise by the scalar epsilon
        grid (adequate for visualization; exact away from interfaces)."""
        n = n or int(self.resolution)
        D = self.get_dfield(k_index, band, n)
        eps = self._eps_grid(n)
        return D / eps[..., None]

    def compute_group_velocities(self, dk: float = 1e-3) -> np.ndarray:
        """dw/dk (Cartesian, units of c) per k point and band by central
        differences in the fractional k (MPB compute_group_velocities)."""
        if self.all_freqs is None:
            self.run()
        _, B = self._lattice()
        out = []
        for k in self.k_points:
            kv = np.array((k.x, k.y, k.z) if hasattr(k, "x") else tuple(k))
            grads = []
            for ax in range(3):
                dfrac = np.zeros(3)
                dfrac[ax] = dk
                fp = self._solve_k(kv + dfrac)
                fm = self._solve_k(kv - dfrac)
                grads.append((fp - fm) / (2 * dk))
            dwdfrac = np.stack(grads, axis=-1)       # (bands, 3)
            # chain rule: k_cart = kfrac @ B  =>  dw/dk_cart = dw/dfrac B^-T
            out.append(dwdfrac @ np.linalg.inv(B.T) * (2 * np.pi))
        return np.array(out)


# ---------------------------------------------------------------------------
# MPB band functions (python/solver.py:971-1100 band-function machinery):
# one-arg functions run once per k point, two-arg functions once per band.
# Output functions save .npy unit-cell grids named like MPB's h5 datasets.
# ---------------------------------------------------------------------------


def get_num_args(func) -> int:
    import inspect
    if inspect.ismethod(func):
        return func.__code__.co_argcount - 1
    try:
        return func.__code__.co_argcount
    except AttributeError:          # callable object
        return func.__call__.__code__.co_argcount - 1


def apply_band_func_thunk(ms, band_func, band, run_now: bool):
    """Apply band_func to one band if run_now (solver.py
    apply_band_func_thunk)."""
    if run_now:
        band_func(ms, band)


def apply_band_func(ms, band_func, band):
    """Apply band_func to `band` once that band has converged — every
    band is converged by the time our direct eigensolve returns, so this
    applies immediately (solver.py apply_band_func)."""
    apply_band_func_thunk(ms, band_func, band, True)


def _apply_band_funcs(ms, band_functions, k_index: int):
    ms.current_k_index = k_index
    ms.current_k = ms.k_points[k_index]
    for f in band_functions:
        if get_num_args(f) == 1:
            f(ms)
        else:
            for b in range(1, ms.num_bands + 1):
                apply_band_func(ms, f, b)


def combine_band_functions(*band_funcs):
    """Combine zero or more band functions into one (solver.py
    combine_band_functions)."""
    def _combine(ms, band):
        for f in band_funcs:
            if get_num_args(f) == 1:
                f(ms)
            else:
                f(ms, band)
    return _combine


def output_at_kpoint(kpoint, *band_funcs):
    """Apply band_funcs only at the given k point (solver.py
    output_at_kpoint)."""
    inner = combine_band_functions(*band_funcs)

    def _output_at_kpoint(ms, band):
        kv = ms.current_k
        kv = (kv.x, kv.y, kv.z) if hasattr(kv, "x") else tuple(kv) + (
            (0.0,) * (3 - len(tuple(kv))))
        kt = (kpoint.x, kpoint.y, kpoint.z) if hasattr(kpoint, "x") else \
            tuple(kpoint) + ((0.0,) * (3 - len(tuple(kpoint))))
        if np.allclose(kv[: len(kt)], kt[: len(kv)], atol=1e-12):
            inner(ms, band)
    return _output_at_kpoint


def _get_field(ms, letter: str, band: int) -> np.ndarray:
    """Fetch one band's real-space field from whatever getters the
    solver provides (2D TM: E only; 3D: H/D/E)."""
    ki = getattr(ms, "current_k_index", 0)
    if letter == "e" and hasattr(ms, "get_efield_tm") and \
            getattr(ms, "parity", None) != "te":
        return ms.get_efield_tm(ki, band)
    getter = getattr(ms, f"get_{letter}field", None)
    if getter is None:
        raise AttributeError(
            f"this solver cannot synthesize {letter.upper()} fields")
    return getter(ki, band)


def _fix_phase(arr: np.ndarray) -> np.ndarray:
    """Canonicalize the global phase: the largest-|.| sample becomes
    real and positive (the fix_*field_phase contract)."""
    flat = np.asarray(arr).ravel()
    i = int(np.argmax(np.abs(flat)))
    ph = flat[i]
    if abs(ph) == 0:
        return arr
    return arr * (abs(ph) / ph)


def fix_hfield_phase(ms, band):
    getattr(ms, "_phase_fixed", None) or setattr(ms, "_phase_fixed", set())
    ms._phase_fixed.add("h")


def fix_bfield_phase(ms, band):
    fix_hfield_phase(ms, band)
    ms._phase_fixed.add("b")


def fix_dfield_phase(ms, band):
    getattr(ms, "_phase_fixed", None) or setattr(ms, "_phase_fixed", set())
    ms._phase_fixed.add("d")


def fix_efield_phase(ms, band):
    getattr(ms, "_phase_fixed", None) or setattr(ms, "_phase_fixed", set())
    ms._phase_fixed.add("e")


def _output_field_letter(letter):
    def fn(ms, band):
        arr = _get_field(ms, letter, band)
        if letter in getattr(ms, "_phase_fixed", ()):
            arr = _fix_phase(arr)
        ki = getattr(ms, "current_k_index", 0)
        np.save(f"{letter}.k{ki + 1:02d}.b{band:02d}.npy", arr)
    fn.__name__ = f"output_{letter}field"
    return fn


output_hfield = _output_field_letter("h")
output_dfield = _output_field_letter("d")
output_efield = _output_field_letter("e")
output_bfield = output_hfield      # mu == 1 in this solver: B == H


def output_bpwr(ms, band):
    """|H|^2 density (MPB bpwr with mu == 1)."""
    arr = _get_field(ms, "h", band)
    ki = getattr(ms, "current_k_index", 0)
    np.save(f"bpwr.k{ki + 1:02d}.b{band:02d}.npy",
            np.sum(np.abs(arr) ** 2, axis=-1))


output_hpwr = output_bpwr


def output_dpwr(ms, band):
    """E*.D density (MPB dpwr)."""
    D = _get_field(ms, "d", band)
    E = _get_field(ms, "e", band)
    ki = getattr(ms, "current_k_index", 0)
    np.save(f"dpwr.k{ki + 1:02d}.b{band:02d}.npy",
            np.real(np.sum(np.conj(E) * D, axis=-1)))


def output_dpwr_in_objects(band_func, min_energy, *objects):
    """Apply band_func only when the fraction of E*.D energy inside
    `objects` exceeds min_energy (solver.py output_dpwr_in_objects)."""
    def _obj_gate(ms, band):
        D = _get_field(ms, "d", band)
        E = _get_field(ms, "e", band)
        u = np.real(np.sum(np.conj(E) * D, axis=-1))
        n = u.shape[0]
        ax = getattr(ms, "lattice_size", (1.0, 1.0))
        dims = u.ndim
        axes = [(np.arange(n) + 0.5) / n * ax[i] - ax[i] / 2
                if i < len(ax) else np.zeros(1) for i in range(dims)]
        grids = np.meshgrid(*axes, indexing="ij")
        pts = np.zeros(grids[0].shape + (3,))
        for i, g in enumerate(grids):
            pts[..., i] = g
        inside = np.zeros(u.shape, bool)
        for ob in objects:
            inside |= np.asarray(ob.inside(pts.reshape(-1, 3))
                                 ).reshape(u.shape)
        frac = float(u[inside].sum() / max(u.sum(), 1e-300))
        if frac >= min_energy:
            band_func(ms, band)
    return _obj_gate


def output_charge_density(ms, band):
    """Bound-charge density -div(E) * (eps - 1)-ish: rho_b = -div P
    computed spectrally from D - E (MPB output_charge_density role)."""
    D = _get_field(ms, "d", band)
    E = _get_field(ms, "e", band)
    P = np.asarray(D) - np.asarray(E)
    n = P.shape[0]
    rho = np.zeros(P.shape[:-1], complex)
    for ax in range(P.ndim - 1):
        kf = np.fft.fftfreq(P.shape[ax]) * P.shape[ax] * 2j * np.pi
        shape = [1] * (P.ndim - 1)
        shape[ax] = P.shape[ax]
        rho -= np.fft.ifft(
            np.fft.fft(P[..., ax], axis=ax) * kf.reshape(shape), axis=ax)
    ki = getattr(ms, "current_k_index", 0)
    np.save(f"charge.k{ki + 1:02d}.b{band:02d}.npy", rho)


def display_zparities(ms):
    ki = getattr(ms, "current_k_index", 0)
    zp = getattr(ms, "zparities", None)
    if zp is None or ki >= len(zp):
        raise RuntimeError("z parities are recorded by ModeSolver3D.run")
    print("zparity:, " + ", ".join(f"{p:.6f}" for p in zp[ki]))


def display_yparities(ms):
    ki = getattr(ms, "current_k_index", 0)
    yp = getattr(ms, "yparities", None)
    if yp is None or ki >= len(yp):
        raise RuntimeError("y parities are recorded by ModeSolver3D.run")
    print("yparity:, " + ", ".join(f"{p:.6f}" for p in yp[ki]))


def display_group_velocities(ms):
    vg = ms.compute_group_velocities()
    ki = getattr(ms, "current_k_index", 0)
    for b, v in enumerate(np.atleast_2d(vg[ki])):
        print(f"velocity:, {b + 1}, " + ", ".join(f"{c:.6f}" for c in v))


class MPBArray(np.ndarray):
    """ndarray subclass carrying the lattice / k-point metadata MPBData
    needs (python/mpb_data.py MPBArray)."""

    def __new__(cls, input_array, lattice=None, kpoint=None,
                bloch_phase: bool = True):
        obj = np.asarray(input_array).view(cls)
        obj.lattice = lattice
        obj.kpoint = kpoint
        obj.bloch_phase = bloch_phase
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.lattice = getattr(obj, "lattice", None)
        self.kpoint = getattr(obj, "kpoint", None)
        self.bloch_phase = getattr(obj, "bloch_phase", True)


def _output_field_comp(letter, axis):
    def fn(ms, band):
        arr = np.asarray(_get_field(ms, letter, band))
        comp = arr[..., axis] if arr.ndim >= 1 and arr.shape[-1] == 3 \
            else arr
        if letter in getattr(ms, "_phase_fixed", ()):
            comp = _fix_phase(comp)
        ki = getattr(ms, "current_k_index", 0)
        np.save(f"{letter}{'xyz'[axis]}.k{ki + 1:02d}.b{band:02d}.npy",
                comp)
    fn.__name__ = f"output_{letter}field_{'xyz'[axis]}"
    return fn


for _l in "hbde":
    for _ax in range(3):
        globals()[f"output_{_l}field_{'xyz'[_ax]}"] = _output_field_comp(
            "h" if _l == "b" else _l, _ax)


def output_tot_pwr(ms, band):
    """(E*.D + |H|^2)/2 density (solver.py output_tot_pwr)."""
    D = _get_field(ms, "d", band)
    E = _get_field(ms, "e", band)
    H = _get_field(ms, "h", band)
    u = 0.5 * (np.real(np.sum(np.conj(E) * D, axis=-1))
               + np.sum(np.abs(H) ** 2, axis=-1))
    ki = getattr(ms, "current_k_index", 0)
    np.save(f"tot_pwr.k{ki + 1:02d}.b{band:02d}.npy", u)


def _output_poynting(axis):
    def fn(ms, band):
        E = np.asarray(_get_field(ms, "e", band))
        H = np.asarray(_get_field(ms, "h", band))
        S = np.real(np.cross(np.conj(E), H))
        ki = getattr(ms, "current_k_index", 0)
        if axis is None:
            np.save(f"flux.k{ki + 1:02d}.b{band:02d}.npy", S)
        else:
            np.save(f"flux.{'xyz'[axis]}.k{ki + 1:02d}.b{band:02d}.npy",
                    S[..., axis])
    fn.__name__ = "output_poynting" + (
        "" if axis is None else f"_{'xyz'[axis]}")
    return fn


output_poynting = _output_poynting(None)
output_poynting_x = _output_poynting(0)
output_poynting_y = _output_poynting(1)
output_poynting_z = _output_poynting(2)
