"""Waveguide eigenmode solver (the MPB replacement; reference src/mpb.cpp).

Solves for guided modes on a 1D cross-section of a 2D simulation
(solve_tm_modes) and full-vector modes on 2D cross-sections of 3D cells
(solve_vector_modes), plus analytic diffracted-planewave 'modes' for
periodic monitors (planewave_mode_tm / planewave_mode_vector), with a
frequency-domain finite-difference eigenproblem, used for:
  * eigenmode sources (fields::add_eigenmode_source, mpb.cpp:830): equivalent
    currents J = n x H, M = -n x E of the mode profile;
  * mode decomposition / S-parameters
    (fields::get_eigenmode_coefficients, mpb.cpp:925).

2D TM formulation (Ez polarization), propagation along x with profile over y:
    [d^2/dy^2 + w^2 eps(y)] Ez = beta^2 Ez
a symmetric tridiagonal eigenproblem on the Yee Ez lattice.  Mode fields:
    Hy = -(beta/w) Ez          (transverse H)
    Hx = (i/w) dEz/dy          (not needed for x-flux)
2D TE (Hz polarization):
    eps d/dy (1/eps dHz/dy) + w^2 eps Hz = beta^2 Hz  (generalized form)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Mode1D:
    """A guided mode on a 1D cross-section."""
    freq: float
    beta: float               # propagation constant (along the normal)
    y: np.ndarray             # cross-section coordinates (E-field lattice)
    ez: Optional[np.ndarray]  # TM profile (normalized)
    hz: Optional[np.ndarray]  # TE profile (normalized)
    parity: str = ""
    ey: Optional[np.ndarray] = None   # TE transverse E = (beta/w eps) hz

    @property
    def neff(self) -> float:
        return self.beta / (2 * np.pi * self.freq)

    @property
    def kdom(self) -> Tuple[float, float, float]:
        """Dominant planewave wavevector (mpb.cpp get_eigenmode kdom /
        band_kdom): for a guided cross-section mode this is beta along the
        propagation normal."""
        kt = getattr(self, "k_tangential", 0.0)
        return (self.beta / (2 * np.pi), kt / (2 * np.pi), 0.0)

    def group_velocity_tm(self, eps: np.ndarray) -> float:
        """vg = P/U for TM modes: beta/(w <eps Ez^2>) * <Ez^2>."""
        w = 2 * np.pi * self.freq
        num = np.sum(self.ez ** 2)
        den = np.sum(eps * self.ez ** 2)
        return (self.beta / w) * num / den


def solve_tm_modes(eps_line: np.ndarray, dx: float, freq: float,
                   num_modes: int = 1, parity: str = "") -> List[Mode1D]:
    """TM (Ez) guided modes of a 1D epsilon profile at frequency `freq`.

    Discretizes d2/dy2 with the standard 3-point stencil on the Ez lattice
    (Dirichlet at the cross-section edges, consistent with the monitor being
    embedded in cladding/PML).  Returns modes sorted by decreasing beta^2,
    keeping only guided ones (beta real)."""
    n = len(eps_line)
    w = 2 * np.pi * freq
    main = -2.0 / dx ** 2 + w ** 2 * eps_line
    off = np.ones(n - 1) / dx ** 2
    # symmetric tridiagonal eigenproblem
    from scipy.linalg import eigh_tridiagonal
    k = min(num_modes + 2, n - 1)
    vals, vecs = eigh_tridiagonal(main, off,
                                  select="i", select_range=(n - k, n - 1))
    # eigh_tridiagonal returns ascending; we want largest beta^2 first
    order = np.argsort(vals)[::-1]
    out = []
    eps_max = float(eps_line.max())
    eps_clad = float(min(eps_line[0], eps_line[-1]))
    for idx in order:
        b2 = vals[idx]
        if b2 <= w ** 2 * eps_clad + 1e-12:
            continue  # not guided
        beta = float(np.sqrt(b2))
        prof = vecs[:, idx]
        # sign convention: max-|.| point positive
        prof = prof * np.sign(prof[np.argmax(np.abs(prof))])
        if parity:
            sc = mode_parity(prof)
            if (parity in ("even", "EVEN") and sc < 0.5) or \
                    (parity in ("odd", "ODD") and sc > -0.5):
                continue
        # normalize so |overlap|^2 matches the flux-monitor convention,
        # which sums Re(E H*) without the physical 1/2 (dft.cpp:533)
        p = (beta / w) * np.sum(prof ** 2) * dx
        prof = prof / np.sqrt(abs(p))
        out.append(Mode1D(freq=freq, beta=beta, y=np.arange(n) * dx,
                          ez=prof, hz=None,
                          parity="even" if mode_parity(prof) > 0 else "odd"))
        if len(out) >= num_modes:
            break
    return out


def solve_te_modes(eps_line: np.ndarray, dx: float, freq: float,
                   num_modes: int = 1, parity: str = "") -> List[Mode1D]:
    """TE (Hz-polarized) guided modes of a 1D epsilon profile at `freq`
    (the other parity of mpb.cpp:322's constrained solve; reference
    maxwell_set_parity, mpb.cpp:255).

    Generalized symmetric eigenproblem on the Hz lattice:
        [-G^T diag(1/eps_edge) G + w^2 I] h = beta^2 diag(1/eps) h
    with Dirichlet edges and edge 1/eps as the 2-point average of the
    site values (the Yee placement of 1/eps at the Ex sites).  Mode
    fields: Ey = (beta/(w eps)) Hz; normalized to unit monitor flux
    (sum Re(Ey Hz*) dx = 1, no 1/2; dft.cpp:533)."""
    n = len(eps_line)
    w = 2 * np.pi * freq
    eps_line = np.asarray(eps_line, np.float64)
    inv_eps = 1.0 / eps_line
    # edge (Ex-site) epsilon: Ex is TANGENTIAL to a y-normal interface,
    # so the stable subpixel average is the arithmetic mean of eps
    # (Kottke/meep tangential rule), inverted
    inv_edge = 1.0 / (0.5 * (eps_line[:-1] + eps_line[1:]))
    # ghost edges (Dirichlet): use the boundary site value
    edge_lo = inv_eps[0]
    edge_hi = inv_eps[-1]
    main = np.empty(n)
    main[0] = -(edge_lo + inv_edge[0]) / dx ** 2 + w ** 2
    main[-1] = -(inv_edge[-1] + edge_hi) / dx ** 2 + w ** 2
    if n > 2:
        main[1:-1] = -(inv_edge[:-1] + inv_edge[1:]) / dx ** 2 + w ** 2
    A = np.diag(main) + np.diag(inv_edge / dx ** 2, 1) \
        + np.diag(inv_edge / dx ** 2, -1)
    B = np.diag(inv_eps)
    from scipy.linalg import eigh
    vals, vecs = eigh(A, B)
    order = np.argsort(vals)[::-1]
    out: List[Mode1D] = []
    eps_max = float(eps_line.max())
    eps_clad = float(min(eps_line[0], eps_line[-1]))
    for idx in order:
        b2 = vals[idx]
        if b2 <= w ** 2 * eps_clad + 1e-12 or b2 > w ** 2 * eps_max + 1e-9:
            continue
        beta = float(np.sqrt(b2))
        prof = vecs[:, idx]
        prof = prof * np.sign(prof[np.argmax(np.abs(prof))])
        if parity:
            sc = mode_parity(prof)
            if (parity in ("even", "EVEN") and sc < 0.5) or \
                    (parity in ("odd", "ODD") and sc > -0.5):
                continue
        # unit monitor flux: P = sum Ey Hz dx = (beta/w) sum h^2/eps dx
        p = (beta / w) * np.sum(inv_eps * prof ** 2) * dx
        prof = prof / np.sqrt(abs(p))
        m = Mode1D(freq=freq, beta=beta, y=np.arange(n) * dx,
                   ez=None, hz=prof,
                   parity="even" if mode_parity(prof) > 0 else "odd")
        m.ey = (beta / w) * inv_eps * prof
        out.append(m)
        if len(out) >= num_modes:
            break
    return out


def mode_overlap_te(mode: Mode1D, ey_dft: np.ndarray, hz_dft: np.ndarray,
                    dx: float) -> Tuple[complex, complex]:
    """Forward/backward coefficients for TE (Hz) modes:
        a+/- = (<Ey_m*, Hz> +/- <Hz_m*, Ey>)/2
    (the flux pair (ey, hz) with +1 orientation, dft.cpp:604)."""
    c1 = np.sum(np.conj(mode.ey) * hz_dft) * dx
    c2 = np.sum(np.conj(mode.hz) * ey_dft) * dx
    return 0.5 * (c1 + c2), 0.5 * (c1 - c2)


@dataclasses.dataclass
class Mode2D:
    """A full-vector guided mode on a 2D cross-section (u, v transverse,
    right-handed (u, v, n) with n the propagation normal).

    Field profiles are (nu, nv) arrays on the in-plane Yee sub-lattices:
    eu at (half, 0), ev at (0, half), en at (0, 0); hu colocated with ev,
    hv colocated with eu (the in-plane projections of the 3D Yee cell).
    Normalized so sum Re(eu hv* - ev hu*) dA = 1 (the monitor flux
    convention, no 1/2; dft.cpp:533)."""
    freq: float
    beta: float
    dx: float
    eu: np.ndarray
    ev: np.ndarray
    en: np.ndarray
    hu: np.ndarray
    hv: np.ndarray

    @property
    def neff(self) -> float:
        return self.beta / (2 * np.pi * self.freq)


def _diff_ops(n: int, d: float):
    """Forward (U) and backward (V = -U^T) difference ops with Dirichlet."""
    import scipy.sparse as sp
    U = sp.diags([-np.ones(n), np.ones(n - 1)], [0, 1]) / d
    return U.tocsr(), (-U.T).tocsr()


def solve_vector_modes(eps_u: np.ndarray, eps_v: np.ndarray,
                       eps_n: np.ndarray, dx: float, freq: float,
                       num_modes: int = 1) -> List["Mode2D"]:
    """Full-vector FD waveguide modes of a 2D cross-section (mpb.cpp's
    role, done with the transverse-E Yee eigenproblem instead of MPB's
    planewave iteration).

    Eliminating Ez and Hz from the curl equations with fields
    ~ exp(i(beta n - w t)) gives  beta^2 e_t = P e_t  with
      Puu = w^2 eps_u + Vv Uv + Uu (1/eps_n) Vu eps_u
      Puv = Uu (1/eps_n) Vv eps_v - Vv Uu          (and u<->v symmetric)
    on the in-plane Yee sub-lattices with Dirichlet edges (the monitor is
    embedded in cladding/PML).  eps_* are (nu, nv) sampled at the
    respective component sites."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    nu, nv = eps_n.shape
    w = 2 * np.pi * freq
    Uu1, Vu1 = _diff_ops(nu, dx)
    Uv1, Vv1 = _diff_ops(nv, dx)
    Iu, Iv = sp.identity(nu), sp.identity(nv)
    Uu, Vu = sp.kron(Uu1, Iv).tocsr(), sp.kron(Vu1, Iv).tocsr()
    Uv, Vv = sp.kron(Iu, Uv1).tocsr(), sp.kron(Iu, Vv1).tocsr()

    def D(a):
        return sp.diags(np.asarray(a, np.float64).ravel())

    inv_n = D(1.0 / eps_n)
    Puu = w * w * D(eps_u) + Vv @ Uv + Uu @ inv_n @ Vu @ D(eps_u)
    Puv = Uu @ inv_n @ Vv @ D(eps_v) - Vv @ Uu
    Pvu = Uv @ inv_n @ Vu @ D(eps_u) - Vu @ Uv
    Pvv = w * w * D(eps_v) + Vu @ Uu + Uv @ inv_n @ Vv @ D(eps_v)
    P = sp.bmat([[Puu, Puv], [Pvu, Pvv]]).tocsc()

    eps_max = float(max(eps_u.max(), eps_v.max(), eps_n.max()))
    eps_clad = float(min(eps_n[0].min(), eps_n[-1].min(),
                         eps_n[:, 0].min(), eps_n[:, -1].min()))
    k = min(num_modes + 4, P.shape[0] - 2)
    sigma = w * w * eps_max * (1 + 1e-6)
    vals, vecs = spl.eigs(P, k=k, sigma=sigma)
    order = np.argsort(-vals.real)

    N = nu * nv
    out: List[Mode2D] = []
    for idx in order:
        b2 = vals[idx]
        if abs(b2.imag) > 1e-6 * abs(b2.real) + 1e-12:
            continue
        b2 = b2.real
        if b2 <= w * w * eps_clad + 1e-9 or b2 > w * w * eps_max:
            continue
        beta = float(np.sqrt(b2))
        vec = vecs[:, idx]
        # rotate the (arbitrary) global phase so e_t is real
        ph = vec[np.argmax(np.abs(vec))]
        vec = vec * np.conj(ph) / abs(ph)
        eu = vec[:N].reshape(nu, nv)
        ev = vec[N:].reshape(nu, nv)
        # En from the divergence: i beta eps_n En = -(Vu eps_u eu + Vv ...)
        S = (Vu @ (eps_u.ravel() * eu.ravel())
             + Vv @ (eps_v.ravel() * ev.ravel()))
        en = (1j * S / (beta * eps_n.ravel())).reshape(nu, nv)
        # H from curl E: i w hu = dEn/dv - i beta ev   (at (0, half))
        hu = ((Uv @ en.ravel() - 1j * beta * ev.ravel())
              / (1j * w)).reshape(nu, nv)
        hv = ((1j * beta * eu.ravel() - Uu @ en.ravel())
              / (1j * w)).reshape(nu, nv)
        # flux normalization (no 1/2) and sign: forward flux positive
        p = float(np.sum((eu * np.conj(hv) - ev * np.conj(hu)).real)
                  * dx * dx)
        s = np.sign(p) if p != 0 else 1.0
        sc = 1.0 / np.sqrt(abs(p))
        out.append(Mode2D(freq=freq, beta=beta, dx=dx,
                          eu=eu.real * sc, ev=ev.real * sc,
                          en=en * sc * s, hu=hu.real * sc * s,
                          hv=hv.real * sc * s))
        if len(out) >= num_modes:
            break
    return out


def planewave_mode_tm(freq: float, eps: float, ky: float, ys: np.ndarray,
                      dx: float, dt: Optional[float] = None
                      ) -> Optional[Mode1D]:
    """Analytic diffracted-planewave 'mode' for 2D TM monitors
    (mpb.cpp:322 add_eigenmode_source with a diffractedplanewave /
    get_eigenmode_coefficients diffraction orders): profile
    ez(y) = exp(i ky y), normalized to the monitor flux convention.
    None if the order is evanescent.

    With dt given, beta is the DISCRETE Yee planewave's effective
    Hy/Ez ratio w * (dt/dx) sin(kx dx/2)/sin(w dt/2) from the FDTD
    dispersion relation, so |a|^2 matches the measured flux exactly at
    finite resolution (the continuum ratio loses ~(w dx)^2/8)."""
    w = 2 * np.pi * freq
    if dt is not None:
        # discrete dispersion: eps (dx/dt)^2 sin^2(w dt/2)
        #                      = sin^2(kx dx/2) + sin^2(ky dx/2)
        swt = np.sin(w * dt / 2)
        s2 = eps * (dx / dt) ** 2 * swt ** 2 - np.sin(ky * dx / 2) ** 2
        if s2 <= 0 or s2 > 1:   # evanescent, or beyond the lattice Nyquist
            return None
        beta = float(w * (dt / dx) * np.sqrt(s2) / swt)
    else:
        b2 = eps * w * w - ky * ky
        if b2 <= 0:
            return None
        beta = float(np.sqrt(b2))
    prof = np.exp(1j * ky * ys).astype(np.complex128)
    p = (beta / w) * np.sum(np.abs(prof) ** 2) * dx
    prof = prof / np.sqrt(abs(p))
    m = Mode1D(freq=freq, beta=beta, y=ys, ez=prof, hz=None)
    m.k_tangential = ky
    return m


def planewave_mode_te(freq: float, eps: float, ky: float, ys: np.ndarray,
                      dx: float, dt: Optional[float] = None
                      ) -> Optional[Mode1D]:
    """TE (Hz-polarized) analog of planewave_mode_tm: hz(y) = exp(i ky y)
    with Ey = (beta/(w eps)) Hz, normalized to the monitor flux
    convention sum Re(Ey Hz*) dx = 1; None for evanescent orders."""
    w = 2 * np.pi * freq
    if dt is not None:
        swt = np.sin(w * dt / 2)
        s2 = eps * (dx / dt) ** 2 * swt ** 2 - np.sin(ky * dx / 2) ** 2
        if s2 <= 0 or s2 > 1:
            return None
        beta = float(w * (dt / dx) * np.sqrt(s2) / swt)
    else:
        b2 = eps * w * w - ky * ky
        if b2 <= 0:
            return None
        beta = float(np.sqrt(b2))
    prof = np.exp(1j * ky * ys).astype(np.complex128)
    p = (beta / (w * eps)) * np.sum(np.abs(prof) ** 2) * dx
    prof = prof / np.sqrt(abs(p))
    m = Mode1D(freq=freq, beta=beta, y=ys, ez=None, hz=prof)
    m.ey = (beta / (w * eps)) * prof
    m.k_tangential = ky
    return m


def _bloch_order_pick(vals, vecs, target, dx):
    """Pick the propagating eigen-SPACE with the largest projection of
    the target harmonic, and return (lam_x, projected profile).  vals are
    eigenvalues lam_x = (2/dx sin(kx dx/2))^2 of the Bloch cross-section
    operator; degenerate pairs (e.g. +/-m harmonics of a uniform medium)
    are handled by projecting within the eigenspace instead of trusting
    eigh's arbitrary basis."""
    prop = (vals > 1e-9) & (vals <= (2.0 / dx) ** 2 * (1 + 1e-12))
    if not np.any(prop):
        return None
    t = target / np.linalg.norm(target)
    ov = vecs.conj().T @ t                      # <v_i, t>
    # group (near-)degenerate eigenvalues
    scale = max(float(np.abs(vals).max()), 1e-300)
    best = (-1.0, None, None)
    i = 0
    n = len(vals)
    while i < n:
        j = i + 1
        while j < n and abs(vals[j] - vals[i]) < 1e-8 * scale:
            j += 1
        if prop[i:j].any():
            score = float(np.sum(np.abs(ov[i:j]) ** 2))
            if score > best[0]:
                proj = vecs[:, i:j] @ ov[i:j]
                best = (score, float(vals[i:j].mean()), proj)
        i = j
    if best[1] is None or best[0] < 1e-6:
        return None
    return best[1], best[2]


def _disc_beta(lam_x, freq, dx, dt):
    """Effective Hy/Ez (or Ey/Hz) propagation ratio of the discrete
    planewave with (2/dx sin(kx dx/2))^2 = lam_x (see planewave_mode_tm's
    discrete-dispersion note)."""
    w = 2 * np.pi * freq
    s = np.sqrt(lam_x) * dx / 2
    if s > 1:
        return None
    if dt is None:
        return float(np.sqrt(lam_x))
    return float(w * (dt / dx) * s / np.sin(w * dt / 2))


def _bloch_matrix_tm(eps_line, ky, dx, wt2):
    """Discrete TM Bloch cross-section operator
    [wt^2 diag(eps) + D2_bloch] with quasi-periodic wrap phase
    e^{i ky L} (only ky mod 2 pi/L matters)."""
    n = len(eps_line)
    L = n * dx
    ph = np.exp(1j * ky * L)
    B = np.zeros((n, n), np.complex128)
    i = np.arange(n)
    B[i, i] = wt2 * np.asarray(eps_line, np.float64) - 2.0 / dx ** 2
    B[i[:-1], i[:-1] + 1] = 1.0 / dx ** 2
    B[i[1:], i[1:] - 1] = 1.0 / dx ** 2
    B[n - 1, 0] += ph / dx ** 2
    B[0, n - 1] += np.conj(ph) / dx ** 2
    return B


def bloch_branch_modes_tm(freq: float, eps_line: np.ndarray, kb: float,
                          ys: np.ndarray, dx: float,
                          dt: Optional[float] = None) -> List[Mode1D]:
    """ALL propagating Bloch branches of a (possibly stratified) TM
    cross-section at Bloch phase kb, one unit-flux Mode1D per
    eigenvector.  In a stratified medium the +/-g harmonics hybridize
    into standing branches with DIFFERENT beta, so diffraction ORDERS do
    not partition the monitor flux — the branches do (they are the
    orthogonal eigenmodes of the x-uniform output medium).  Use this for
    completeness/power-budget checks; use bloch_planewave_mode_tm for a
    specific requested order."""
    n = len(eps_line)
    w = 2 * np.pi * freq
    wt2 = (2 / dt * np.sin(w * dt / 2)) ** 2 if dt is not None else w * w
    from scipy.linalg import eigh
    vals, vecs = eigh(_bloch_matrix_tm(eps_line, kb, dx, wt2))
    out = []
    for j in range(n):
        if not (1e-9 < vals[j] <= (2.0 / dx) ** 2 * (1 + 1e-12)):
            continue
        beta = _disc_beta(vals[j], freq, dx, dt)
        if beta is None:
            continue
        prof = vecs[:, j].astype(np.complex128)
        p = (beta / w) * np.sum(np.abs(prof) ** 2) * dx
        prof = prof / np.sqrt(abs(p))
        m = Mode1D(freq=freq, beta=beta, y=ys, ez=prof, hz=None)
        m.k_tangential = kb
        out.append(m)
    return out


def bloch_planewave_mode_tm(freq: float, eps_line: np.ndarray, ky: float,
                            ys: np.ndarray, dx: float,
                            dt: Optional[float] = None
                            ) -> Optional[Mode1D]:
    """Diffracted 'planewave' of a y-STRATIFIED output medium: the Bloch
    eigenmode of the periodic eps profile at Bloch phase ky whose
    eigenspace carries the requested harmonic — the layered-medium
    planewave the reference solves via MPB (mpb.cpp:925-1110's
    get_eigenmode in a non-uniform monitor cross-section).  Fully
    discrete (Yee + leapfrog) eigenproblem
        [wt^2 diag(eps) + D2_bloch(ky)] v = lam_x v,
    wt = (2/dt) sin(w dt/2), so coefficients are exact at finite
    resolution; reduces to planewave_mode_tm for uniform eps.  None if
    the order is evanescent in the stratified medium."""
    w = 2 * np.pi * freq
    wt2 = (2 / dt * np.sin(w * dt / 2)) ** 2 if dt is not None else w * w
    from scipy.linalg import eigh
    vals, vecs = eigh(_bloch_matrix_tm(eps_line, ky, dx, wt2))
    target = np.exp(1j * ky * ys).astype(np.complex128)
    pick = _bloch_order_pick(vals, vecs, target, dx)
    if pick is None:
        return None
    lam_x, prof = pick
    beta = _disc_beta(lam_x, freq, dx, dt)
    if beta is None:
        return None
    p = (beta / w) * np.sum(np.abs(prof) ** 2) * dx
    prof = prof / np.sqrt(abs(p))
    m = Mode1D(freq=freq, beta=beta, y=ys, ez=prof, hz=None)
    m.k_tangential = ky
    return m


def _bloch_matrix_te(eps_line, ky, dx, wt2, inv_nodes=None,
                     inv_edges=None):
    """Discrete TE (Hz-polarized) Bloch cross-section operator pair
    (A, inv_eps) of the generalized problem A h = lam_x diag(inv_eps) h
    with quasi-periodic wrap phase e^{i ky L}; `inv_nodes`/`inv_edges`
    optionally supply the exact per-site 1/eps rows the FDTD ran with
    (see bloch_planewave_mode_te)."""
    n = len(eps_line)
    eps_line = np.asarray(eps_line, np.float64)
    inv_eps = (np.asarray(inv_nodes, np.float64) if inv_nodes is not None
               else 1.0 / eps_line)
    L = n * dx
    ph = np.exp(1j * ky * L)
    if inv_edges is not None:
        inv_edges = np.asarray(inv_edges, np.float64)
        inv_edge = inv_edges[1:]
        inv_wrap = float(inv_edges[0])
    else:
        inv_edge = 1.0 / (0.5 * (eps_line[:-1] + eps_line[1:]))
        inv_wrap = 1.0 / (0.5 * (eps_line[-1] + eps_line[0]))
    A = np.zeros((n, n), np.complex128)
    i = np.arange(n)
    main = np.empty(n)
    main[0] = -(inv_wrap + inv_edge[0]) / dx ** 2 + wt2
    main[-1] = -(inv_edge[-1] + inv_wrap) / dx ** 2 + wt2
    if n > 2:
        main[1:-1] = -(inv_edge[:-1] + inv_edge[1:]) / dx ** 2 + wt2
    A[i, i] = main
    A[i[:-1], i[:-1] + 1] = inv_edge / dx ** 2
    A[i[1:], i[1:] - 1] = inv_edge / dx ** 2
    A[n - 1, 0] += ph * inv_wrap / dx ** 2
    A[0, n - 1] += np.conj(ph) * inv_wrap / dx ** 2
    return A, inv_eps


def bloch_branch_modes_te(freq: float, eps_line: np.ndarray, kb: float,
                          ys: np.ndarray, dx: float,
                          dt: Optional[float] = None,
                          inv_nodes: Optional[np.ndarray] = None,
                          inv_edges: Optional[np.ndarray] = None
                          ) -> List[Mode1D]:
    """ALL propagating TE (Hz-polarized) Bloch branches of a (possibly
    stratified) cross-section at Bloch phase kb, one unit-flux Mode1D
    per eigenvector — the TE analog of bloch_branch_modes_tm.  The
    generalized eigenvectors are diag(inv_eps)-orthogonal, which is
    exactly the TE flux inner product (S ~ (beta/w) sum inv_eps |hz|^2),
    so the branches PARTITION the monitor flux in a stratified output
    medium where diffraction orders do not."""
    n = len(eps_line)
    w = 2 * np.pi * freq
    wt2 = (2 / dt * np.sin(w * dt / 2)) ** 2 if dt is not None else w * w
    A, inv_eps = _bloch_matrix_te(eps_line, kb, dx, wt2,
                                  inv_nodes, inv_edges)
    from scipy.linalg import eigh
    vals, vecs = eigh(A, np.diag(inv_eps))
    out = []
    for j in range(n):
        if not (1e-9 < vals[j] <= (2.0 / dx) ** 2 * (1 + 1e-12)):
            continue
        beta = _disc_beta(vals[j], freq, dx, dt)
        if beta is None:
            continue
        prof = vecs[:, j].astype(np.complex128)
        p = (beta / w) * np.sum(inv_eps * np.abs(prof) ** 2) * dx
        prof = prof / np.sqrt(abs(p))
        m = Mode1D(freq=freq, beta=beta, y=ys, ez=None, hz=prof)
        m.ey = (beta / w) * inv_eps * prof
        m.k_tangential = kb
        out.append(m)
    return out


def bloch_planewave_mode_te(freq: float, eps_line: np.ndarray, ky: float,
                            ys: np.ndarray, dx: float,
                            dt: Optional[float] = None,
                            inv_nodes: Optional[np.ndarray] = None,
                            inv_edges: Optional[np.ndarray] = None
                            ) -> Optional[Mode1D]:
    """TE (Hz-polarized) stratified diffraction order: the Bloch
    eigenmode of the generalized problem
        [-G^H diag(1/eps_edge) G + wt^2 I] h = lam_x diag(1/eps) h
    with quasi-periodic wrap (edge eps between the last and first sites
    is their arithmetic mean, the tangential Yee rule of
    solve_te_modes).  Reduces to planewave_mode_te for uniform eps.

    `inv_nodes` / `inv_edges` optionally supply the EXACT per-site
    1/eps rows the FDTD ran with (the plan's ey:u / ex:u coefficient
    rows, which include subpixel smoothing) so the eigenproblem is the
    simulation's own discrete operator: inv_nodes[k] at the Hz/Ey line
    sites, inv_edges[k] at the integer tangential site BELOW node k
    (so the edge between nodes k and k+1 is inv_edges[k+1], and the
    periodic wrap edge is inv_edges[0])."""
    w = 2 * np.pi * freq
    wt2 = (2 / dt * np.sin(w * dt / 2)) ** 2 if dt is not None else w * w
    A, inv_eps = _bloch_matrix_te(eps_line, ky, dx, wt2,
                                  inv_nodes, inv_edges)
    from scipy.linalg import eigh
    vals, vecs = eigh(A, np.diag(inv_eps))
    # eigh(A, B) returns B-orthonormal vectors; re-orthonormalize in the
    # plain inner product for the harmonic projection
    vecs = vecs / np.linalg.norm(vecs, axis=0, keepdims=True)
    target = np.exp(1j * ky * ys).astype(np.complex128)
    pick = _bloch_order_pick(vals, vecs, target, dx)
    if pick is None:
        return None
    lam_x, prof = pick
    beta = _disc_beta(lam_x, freq, dx, dt)
    if beta is None:
        return None
    p = (beta / w) * np.sum(inv_eps * np.abs(prof) ** 2) * dx
    prof = prof / np.sqrt(abs(p))
    m = Mode1D(freq=freq, beta=beta, y=ys, ez=None, hz=prof)
    m.ey = (beta / w) * inv_eps * prof
    m.k_tangential = ky
    return m


def planewave_mode_vector(freq: float, eps: float, ku: float, kv: float,
                          us: np.ndarray, vs: np.ndarray, dx: float,
                          s_amp: complex = 1.0, p_amp: complex = 0.0,
                          axis=(0.0, 0.0, 1.0)) -> Optional[Mode2D]:
    """Analytic s/p-polarized diffracted planewave on a 3D monitor plane
    (the reference's DiffractedPlanewave band specification,
    python/simulation.py:2477; diffractedplanewave in mpb.cpp).

    k = (kn, ku, kv) with kn = sqrt(eps w^2 - ku^2 - kv^2) along the
    monitor normal; S polarization is axis x k (E perpendicular to the
    plane of incidence spanned by k and `axis`), P is k x S.  Returns
    None for evanescent orders."""
    w = 2 * np.pi * freq
    b2 = eps * w * w - ku * ku - kv * kv
    if b2 <= 0:
        return None
    kn = float(np.sqrt(b2))
    k = np.array([kn, ku, kv])           # (n, u, v) frame
    ax = np.asarray(axis, np.float64)
    s_dir = np.cross(ax, k)
    if np.linalg.norm(s_dir) < 1e-12 * np.linalg.norm(k):
        # k parallel to axis: use u as the S direction (mpb.cpp fallback)
        s_dir = np.array([0.0, 1.0, 0.0])
    s_dir = s_dir / np.linalg.norm(s_dir)
    p_dir = np.cross(k, s_dir) / np.linalg.norm(k)
    E = s_amp * s_dir + p_amp * p_dir
    H = np.cross(k, E) / w               # H = (k x E)/w  (c = 1 units)
    UU, VV = np.meshgrid(us, vs, indexing="ij")
    phase = np.exp(1j * (ku * UU + kv * VV))
    eu, ev = E[1] * phase, E[2] * phase
    hu, hv = H[1] * phase, H[2] * phase
    p = float(np.sum((eu * np.conj(hv) - ev * np.conj(hu)).real) * dx * dx)
    if abs(p) < 1e-300:
        return None
    sc = 1.0 / np.sqrt(abs(p))
    m = Mode2D(freq=freq, beta=kn, dx=dx, eu=eu * sc, ev=ev * sc,
               en=E[0] * phase * sc, hu=hu * sc, hv=hv * sc)
    m.k_tangential = (ku, kv)
    return m


def deconv_centered_line(line: np.ndarray, dx: float,
                         k_bloch: float = 0.0) -> np.ndarray:
    """Undo the monitor's TANGENTIAL centered averaging on a full-period
    line.  The centered DFT stores g[j] = (f[j] + f[j+1])/2 with a
    Bloch-phased wrap (dft.cpp:277 avg1/avg2), i.e. each Bloch harmonic
    k_g = k_bloch + 2 pi g / L is scaled by cos(k_g dx/2) e^{i k_g dx/2}.
    For a single-harmonic (uniform-medium) planewave that is a harmless
    global factor, but for the multi-harmonic Bloch modes of a
    stratified medium it breaks eigenvector orthogonality and mixes the
    branch projections.  This divides the filter out per harmonic,
    returning the raw integer-site line; the (zero-response) Nyquist
    harmonic is dropped."""
    line = np.asarray(line, np.complex128)
    n = len(line)
    L = n * dx
    js = np.arange(n)
    ramp = np.exp(-1j * k_bloch * js * dx)
    F = np.fft.fft(line * ramp)
    g = np.fft.fftfreq(n, d=1.0 / n)          # signed integer harmonics
    kg = k_bloch + 2 * np.pi * g / L
    resp = np.cos(kg * dx / 2) * np.exp(1j * kg * dx / 2)
    ok = np.abs(resp) > 1e-8
    F = np.where(ok, F / np.where(ok, resp, 1.0), 0.0)
    return np.fft.ifft(F) * np.conj(ramp)


def monitor_average_boost(beta: float, dx: float) -> float:
    """Undo the flux monitor's two-plane (1/2, 1/2) normal-axis field
    average on the E line.  Only E is averaged (H's half-integer normal
    Yee site lands exactly on the monitor plane), and the averaged E
    sits at the SAME normal position as H, so of the two overlap halves
    (<Em*, H> + <Hm*, E>)/2 only the second loses cos(beta dx/2):
        a_measured = a (1 + cos(beta dx/2)) / 2.
    The boost is its inverse times the phase-vs-effective wavenumber
    factor x/sin(x) (the mode's H/E ratio and unit-flux normalization
    use the effective (2/dx)sin(beta dx/2) wavenumber of the discrete
    planewave):
        boost = x / (sin(x) cos^2(x/2)),  x = beta dx/2.
    NOT 1/cos(x) (over-corrects, +2.8% power bias at beta dx = 0.47) and
    not 1/cos^2(x/2) alone (under-corrects, -1.9%); this form matches
    the measured |a+|^2/flux of a pure planewave to <0.1% over
    beta dx in [0.42, 0.52] at three frequencies
    (test_order0_equals_flux_empty / test_grating_orders_sum_to_flux)."""
    x = min(abs(beta) * dx / 2, 1.2)
    return x / (np.sin(x) * np.cos(x / 2) ** 2) if x > 1e-9 else 1.0


def mode_parity(prof: np.ndarray) -> float:
    """Even/odd score of a profile about the cross-section midpoint:
    +1 even, -1 odd (the role of MPB's parity constraints,
    mpb.cpp:255 maxwell_set_parity)."""
    flipped = prof[::-1] if prof.ndim == 1 else prof[::-1, :]
    num = np.sum(np.real(np.conj(prof) * flipped))
    den = np.sum(np.abs(prof) ** 2)
    return float(num / max(den, 1e-300))


def mode_overlap_vector(mode: "Mode2D", Eu: np.ndarray, Ev: np.ndarray,
                        Hu: np.ndarray, Hv: np.ndarray,
                        dA: float) -> Tuple[complex, complex]:
    """Forward/backward coefficients from DTFT fields on the plane
    (get_eigenmode_coefficients, mpb.cpp:925):
      a+/- = (<e_m, H> +/- <h_m, E>)/2 with the cross-product overlaps."""
    c1 = np.sum(np.conj(mode.eu) * Hv - np.conj(mode.ev) * Hu) * dA
    c2 = np.sum(Eu * np.conj(mode.hv) - Ev * np.conj(mode.hu)) * dA
    return 0.5 * (c1 + c2), 0.5 * (c1 - c2)


def mode_overlap_tm(mode: Mode1D, ez_dft: np.ndarray, hy_dft: np.ndarray,
                    dx: float) -> Tuple[complex, complex]:
    """Forward/backward mode coefficients from DTFT fields on the
    cross-section (get_eigenmode_coefficients, mpb.cpp:925).

    Uses the standard orthogonality overlaps:
        a+ = (<Em*, H> + <Hm*, E>)/2,  a- = (<Em*, H> - <Hm*, E>)/2
    specialized to TM (Ez, Hy): Hy_mode = -(beta/w) Ez_mode.
    """
    w = 2 * np.pi * mode.freq
    em = mode.ez
    hm = -(mode.beta / w) * mode.ez
    # overlap integrals over the cross-section
    c1 = np.sum(np.conj(em) * hy_dft) * dx      # <Em*, Hy>
    c2 = np.sum(np.conj(hm) * ez_dft) * dx      # <Hm*, Ez>
    # mode power normalization: P = -Re(Em Hy*) ... em normalized to unit flux
    ap = 0.5 * (c1 + c2)
    am = 0.5 * (c1 - c2)
    return ap, am
