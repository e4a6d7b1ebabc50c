"""Waveguide eigenmode solver (the MPB replacement; reference src/mpb.cpp).

Solves for guided modes on a 1D cross-section of a 2D simulation (and the
scalar/vector 2D cross-sections of 3D, round 2) with a frequency-domain
finite-difference eigenproblem, used for:
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
    hz: Optional[np.ndarray]
    parity: str = ""

    @property
    def neff(self) -> float:
        return self.beta / (2 * np.pi * self.freq)

    def group_velocity_tm(self, eps: np.ndarray) -> float:
        """vg = P/U for TM modes: beta/(w <eps Ez^2>) * <Ez^2>."""
        w = 2 * np.pi * self.freq
        num = np.sum(self.ez ** 2)
        den = np.sum(eps * self.ez ** 2)
        return (self.beta / w) * num / den


def solve_tm_modes(eps_line: np.ndarray, dx: float, freq: float,
                   num_modes: int = 1) -> List[Mode1D]:
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
        # normalize so |overlap|^2 matches the flux-monitor convention,
        # which sums Re(E H*) without the physical 1/2 (dft.cpp:533)
        p = (beta / w) * np.sum(prof ** 2) * dx
        prof = prof / np.sqrt(abs(p))
        out.append(Mode1D(freq=freq, beta=beta, y=np.arange(n) * dx,
                          ez=prof, hz=None))
        if len(out) >= num_modes:
            break
    return out


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
