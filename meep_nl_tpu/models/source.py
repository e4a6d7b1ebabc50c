"""Source time profiles and source placement specs.

Mirrors the reference's src_time hierarchy (meep.hpp:937-1092,
sources.cpp:64-146) and the Python-level Source classes
(python/source.py).  Time profiles are evaluated on the host when building
the per-step waveform tables (stepper.step.build_xs), so they can be plain
Python/NumPy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence

import numpy as np


class SourceTime:
    """Base time profile (meep.hpp:937 src_time)."""

    is_integrated: bool = False

    def dipole(self, t: float) -> complex:
        raise NotImplementedError

    def current(self, t: float, dt: float) -> complex:
        """Default: discrete derivative of the dipole moment
        (meep.hpp:982)."""
        return (self.dipole(t + dt) - self.dipole(t)) / dt

    def last_time(self) -> float:
        return 0.0

    def get_fwidth(self) -> float:
        return 0.0


def _gaussian_bandwidth(width: float) -> float:
    """Bandwidth at which the gaussian spectrum decays below 1e-7
    (sources.cpp:67)."""
    tol = 1e-7
    return math.sqrt(-2.0 * math.log(tol)) / (width * math.pi)


@dataclasses.dataclass
class GaussianSource(SourceTime):
    """Gaussian pulse (sources.cpp:72-117, python/source.py GaussianSource).

    frequency: center frequency (units of c/a)
    fwidth: spectral width; envelope width = 1/fwidth
    cutoff: start/peak offset in widths (default 5)
    """
    frequency: float
    fwidth: float = 0.0
    width: float = 0.0
    start_time: float = 0.0
    cutoff: float = 5.0
    is_integrated: bool = False

    def __post_init__(self):
        if self.width == 0.0:
            if self.fwidth == 0.0:
                raise ValueError("GaussianSource needs fwidth or width")
            self.width = 1.0 / self.fwidth
        self.peak_time = self.start_time + self.width * self.cutoff
        self._cut = self.width * self.cutoff
        # shrink cutoff below the double-underflow horizon (sources.cpp:80)
        while math.exp(-self._cut ** 2 / (2 * self.width ** 2)) < 1e-100:
            self._cut *= 0.9
        self._cut = np.float32(self._cut)

    def dipole(self, t: float) -> complex:
        tt = t - self.peak_time
        if np.float32(abs(tt)) > self._cut:
            return 0.0
        # amp normalizes the *current* (d dipole/dt) to ~1 at the peak
        # (sources.cpp:104)
        amp = 1.0 / complex(0, -2 * math.pi * self.frequency)
        return (math.exp(-tt * tt / (2 * self.width ** 2))
                * np.exp(-2j * math.pi * self.frequency * tt) * amp)

    def fourier_transform(self, f: float) -> complex:
        """(1/sqrt(2 pi)) int e^{i w t} G(t) dt of the current envelope
        (sources.cpp:112)."""
        omega = 2 * math.pi * f
        omega0 = 2 * math.pi * self.frequency
        delta = (omega - omega0) * self.width
        return (self.width * np.exp(1j * omega * self.peak_time)
                * math.exp(-0.5 * delta * delta))

    def last_time(self) -> float:
        return float(np.float32(self.peak_time + self._cut))

    def get_fwidth(self) -> float:
        return _gaussian_bandwidth(self.width)


@dataclasses.dataclass
class ContinuousSource(SourceTime):
    """CW source with tanh turn-on (sources.cpp:128-146)."""
    frequency: float
    start_time: float = 0.0
    end_time: float = 1e20
    width: float = 0.0
    slowness: float = 3.0
    is_integrated: bool = False

    def dipole(self, t: float) -> complex:
        if np.float32(t) < self.start_time or np.float32(t) > self.end_time:
            return 0.0
        amp = 1.0 / complex(0, -2 * math.pi * self.frequency)
        osc = np.exp(-2j * math.pi * self.frequency * t) * amp
        if self.width == 0.0:
            return osc
        ts = (t - self.start_time) / self.width - self.slowness
        te = (self.end_time - t) / self.width - self.slowness
        return osc * (1 + math.tanh(ts)) * (1 + math.tanh(te)) * 0.25

    def last_time(self) -> float:
        return self.end_time

    def get_fwidth(self) -> float:
        return 0.0


@dataclasses.dataclass
class CustomSource(SourceTime):
    """User time function (meep.hpp:1058 custom_src_time)."""
    func: Callable[[float], complex]
    start_time: float = -1e20
    end_time: float = 1e20
    center_frequency: float = 0.0
    fwidth: float = 0.0
    is_integrated: bool = False

    def dipole(self, t: float) -> complex:
        if self.start_time <= np.float32(t) <= self.end_time:
            return self.func(t)
        return 0.0

    def current(self, t: float, dt: float) -> complex:
        if self.is_integrated:
            return super().current(t, dt)
        return self.dipole(t)

    def get_fwidth(self) -> float:
        return self.fwidth


def check_positive(prop, val):
    """Constructor guard (python/source.py:11)."""
    if val > 0:
        return val
    raise ValueError(f"{prop} must be positive. Got {val}")


@dataclasses.dataclass
class Source:
    """A current source over a point/volume (python/source.py Source).

    `amp_data` (python/source.py amp_data): a complex array sampled
    uniformly over the source extent (one axis per nonzero size axis),
    multilinearly interpolated at each source site — the array analog of
    `amp_func`."""
    src: SourceTime
    component: str                      # 'ez', 'hx', ...
    center: Sequence[float]
    size: Optional[Sequence[float]] = None
    amplitude: complex = 1.0
    amp_func: Optional[Callable] = None
    amp_data: Optional[Any] = None

    def add_source(self, sim):
        """Inject this source into a Simulation (python/source.py
        Source.add_source hook used by Simulation.add_sources)."""
        if not any(s is self for s in sim.sources):
            sim.sources.append(self)
        sim.add_sources()


def amp_data_func(amp_data, size) -> Callable:
    """amp_func equivalent of an amp_data array: positions RELATIVE to
    the source center map linearly onto the array's index space, one
    array axis per nonzero `size` axis (python/typemap_utils.cpp
    amp_data interpolation role)."""
    data = np.asarray(amp_data)
    live = [i for i, sz in enumerate(size) if sz > 0]
    # drop trailing singleton axes (the reference ships (nx,ny,nz,)
    # grids with 1-extent dead axes)
    while data.ndim > max(len(live), 1) and data.shape[-1] == 1:
        data = data[..., 0]
    if data.ndim != len(live):
        raise ValueError(
            f"amp_data with {data.ndim} axes does not match a source "
            f"with {len(live)} nonzero size axes")

    def f(rel):
        rel = tuple(rel)
        out = data
        # interpolate highest axis first so earlier indices stay valid
        for k in range(len(live) - 1, -1, -1):
            ax, n = live[k], data.shape[k]
            u = (rel[ax] / size[ax] + 0.5) * (n - 1)
            u = min(max(u, 0.0), float(n - 1))
            i0 = int(np.floor(u))
            i1 = min(i0 + 1, n - 1)
            w = u - i0
            out = np.take(out, i0, axis=k) * (1 - w) + \
                np.take(out, i1, axis=k) * w
        return complex(out)
    return f


def get_equiv_sources(field, normal_vec, time_src, center, size):
    """Equivalence-principle sources of a field slice
    (python/source.py:777): electric current K = n x H, magnetic
    current N = -n x E, each returned as an amp_data Source."""
    Ex, Ey, Ez, Hx, Hy, Hz = field
    n = normal_vec
    K = (n[1] * Hz - n[2] * Hy, n[2] * Hx - n[0] * Hz,
         n[0] * Hy - n[1] * Hx)
    N = (n[2] * Ey - n[1] * Ez, n[0] * Ez - n[2] * Ex,
         n[1] * Ex - n[0] * Ey)
    comps = {"ex": K[0], "ey": K[1], "ez": K[2],
             "hx": N[0], "hy": N[1], "hz": N[2]}
    return [Source(time_src, comp, center=center, size=size, amp_data=arr)
            for comp, arr in comps.items() if np.sum(np.abs(arr))]


@dataclasses.dataclass
class IndexedSource:
    """Raw (grid-index, amplitude) current source (python/source.py:1081
    IndexedSource; used by the adjoint machinery): bypasses the volume
    machinery and injects at explicit Yee indices of `component`."""
    src: SourceTime
    component: str
    indices: Any                        # (npts, ndim) int
    amplitudes: Any                     # (npts,) complex


def gaussian_beam_fields(pts: np.ndarray, x0, kdir, w0: float, freq: float,
                         E0, eps: float = 1.0, mu: float = 1.0
                         ) -> np.ndarray:
    """Exact complex-source-point Gaussian-beam fields (6, npts) =
    (Ex..Hz) at `pts` (npts, 3) — a numpy port of the reference's
    gaussianbeam::get_fields (src/sources.cpp:557-660, meep.hpp:1707):
    the multipole fields of a point source at the complex position
    z -> z - i z_R, exact at any numerical aperture (the paraxial beam is
    its small-NA limit).  E0 is the complex polarization 3-vector; the
    real and imaginary parts drive two superposed linear polarizations
    (the reference's rnorm/inorm split)."""
    n = np.sqrt(eps * mu)
    k = 2 * np.pi * freq * n
    ZR = np.sqrt(mu / eps)
    z0 = k * w0 * w0 / 2
    kz0 = k * z0
    pts = np.atleast_2d(np.asarray(pts, np.float64))
    xrel = pts - np.asarray(x0, np.float64)[None, :]
    zhat = np.asarray(kdir, np.float64)
    zhat = zhat / np.linalg.norm(zhat)
    rho = np.linalg.norm(np.cross(np.broadcast_to(zhat, xrel.shape), xrel),
                         axis=-1)
    zdot = xrel @ zhat

    zc = zdot - 1j * z0
    Rsq = rho * rho + zc * zc
    R = np.sqrt(Rsq.astype(complex))
    kR = k * R
    kR2, kR3 = kR * kR, kR * kR * kR
    big = np.abs(kR) > 1e-4
    f = np.empty_like(kR)
    g = np.empty_like(kR)
    fmgbRsq = np.empty_like(kR)
    # rescaled cos/sin for large imaginary kR (avoids overflow and keeps
    # the e^{kz0} normalization finite; sources.cpp:575-585)
    kRb = kR[big]
    resc = np.abs(kRb.imag) > 30.0
    coskR = np.where(resc,
                     0.5 * (np.exp(1j * kRb.real) * np.exp(
                         -(np.clip(kRb.imag, -700, 700) + kz0))
                         + np.exp(-1j * kRb.real) * np.exp(
                             np.clip(kRb.imag, -700, 700) - kz0)),
                     np.cos(kRb))
    sinkR = np.where(resc,
                     -0.5j * (np.exp(1j * kRb.real) * np.exp(
                         -(np.clip(kRb.imag, -700, 700) + kz0))
                         - np.exp(-1j * kRb.real) * np.exp(
                             np.clip(kRb.imag, -700, 700) - kz0)),
                     np.sin(kRb))
    f[big] = -3.0 * (coskR / kR2[big] - sinkR / kR3[big])
    g[big] = 1.5 * (sinkR / kRb + coskR / kR2[big] - sinkR / kR3[big])
    fmgbRsq[big] = (f[big] - g[big]) / Rsq[big]
    sm = ~big
    kR2s, kR4s = kR2[sm], kR2[sm] * kR2[sm]
    f[sm] = kR4s / 280.0 - kR2s / 10.0 + 1.0
    g[sm] = 3.0 * kR4s / 280.0 - kR2s / 5.0 + 1.0
    fmgbRsq[sm] = (kR4s / 5040.0 - kR2s / 140.0 + 0.1) * (k * k)
    i2fk = 0.5j * f * k
    any_resc = bool(np.any(resc)) if kRb.size else False

    E = np.zeros((3, len(pts)), complex)
    H = np.zeros((3, len(pts)), complex)
    E0 = np.asarray(E0, complex)

    def add_pol(xvec, scale):
        nrm = np.linalg.norm(xvec)
        if nrm <= 1e-13:
            return
        xhat = xvec / nrm
        yhat = np.cross(zhat, xhat)
        xd = xrel @ xhat
        yd = xrel @ yhat
        gb_Ex = g + fmgbRsq * xd * xd + i2fk * zc
        gb_Ey = fmgbRsq * xd * yd
        gb_Ez = fmgbRsq * xd * zc - i2fk * xd
        gb_Hx = np.zeros_like(gb_Ex)
        gb_Hy = g + fmgbRsq * yd * yd + i2fk * zc
        gb_Hz = fmgbRsq * yd * zc - i2fk * yd
        for j in range(3):
            E[j] += scale * nrm * (gb_Ex * xhat[j] + gb_Ey * yhat[j]
                                   + gb_Ez * zhat[j])
            H[j] += scale * nrm * (gb_Hx * xhat[j] + gb_Hy * yhat[j]
                                   + gb_Hz * zhat[j])

    add_pol(E0.real, 1.0)
    add_pol(E0.imag, 1.0j)

    if any_resc:
        Eorig = 3.0 / (2 * kz0 ** 3) * (kz0 * (kz0 - 1)
                                        + 0.5 * (1.0 - np.exp(-2.0 * kz0)))
    else:
        Eorig = 3.0 / (2 * kz0 ** 3) * (np.exp(kz0) * kz0 * (kz0 - 1)
                                        + np.sinh(kz0))
    out = np.zeros((6, len(pts)), complex)
    out[:3] = E / Eorig
    out[3:] = H / (Eorig * ZR)
    return out


@dataclasses.dataclass
class GaussianBeamSource(Source):
    """Focused Gaussian beam launched from a source plane
    (python/source.py GaussianBeam3DSource/2D; reference meep.hpp:1707).

    With `component=None` (the meep-parity mode) the EXACT
    complex-source-point beam fields are injected as the 4 equivalence
    current sheets J = n x H, M = -n x E over the source plane
    (fields::add_volume_source(gaussianbeam), sources.cpp:526-556) —
    exact at any NA; `beam_E0` is then the complex polarization VECTOR.

    With an explicit `component`, the legacy paraxial-envelope
    amplitude-function source is used (scalar beam_E0)."""
    component: Optional[str] = None                # None => exact beam
    center: Sequence[float] = (0.0, 0.0, 0.0)
    beam_x0: Sequence[float] = (0.0, 0.0, 0.0)     # focus relative to center
    beam_kdir: Sequence[float] = (1.0, 0.0, 0.0)   # propagation direction
    beam_w0: float = 1.0                           # waist radius
    beam_E0: Any = 1.0                             # scalar (legacy) | 3-vec
    frequency: Optional[float] = None

    def __post_init__(self):
        import math as _m
        if self.component is None:
            # exact-beam mode: expanded into equivalence-current sheets
            # by Simulation._build_sources
            return
        f = self.frequency or getattr(self.src, "frequency", None)
        if f is None:
            raise ValueError("GaussianBeamSource needs a frequency")
        k = 2 * _m.pi * f
        kdir = np.asarray(self.beam_kdir, float)
        kdir = kdir / np.linalg.norm(kdir)
        x0 = np.asarray(self.beam_x0, float)
        w0 = self.beam_w0
        zR = k * w0 * w0 / 2.0
        E0 = self.beam_E0

        def amp(pt):
            p = np.array([pt.x, pt.y, pt.z]) - x0
            z = float(p @ kdir)
            r2 = float(p @ p) - z * z
            wz = w0 * _m.sqrt(1 + (z / zR) ** 2)
            Rinv = z / (z * z + zR * zR)
            gouy = _m.atan2(z, zR)
            return (E0 * (w0 / wz) * _m.exp(-r2 / (wz * wz))
                    * np.exp(1j * (k * z + 0.5 * k * r2 * Rinv - gouy)))

        self.amp_func = amp


@dataclasses.dataclass
class EigenModeSource:
    """Waveguide-eigenmode source declaration (python/source.py
    EigenModeSource): accepted in Simulation(sources=[...]) and
    translated to Simulation.add_eigenmode_source at init_sim time
    (which solves the cross-section mode and injects the equivalent
    J = n x H / M = -n x E currents, mpb.cpp:830)."""
    src: SourceTime
    center: Any = None
    size: Any = None
    eig_band: int = 1
    direction: Any = None            # None/AUTOMATIC: from eig_kpoint sign
    eig_kpoint: Any = None
    eig_parity: Any = None           # 'TM'/'TE'/ODD_Z/EVEN_Z style strings
    eig_match_freq: bool = True
    amplitude: complex = 1.0
    component: Any = None            # parity via ODD_Z-style component hint
    eig_lattice_size: Any = None     # accepted for parity; modes solve on
    eig_lattice_center: Any = None   # the monitor cross-section directly
    eig_resolution: int = 0
    eig_tolerance: float = 1e-12

    def launch_direction(self) -> int:
        if isinstance(self.direction, (int, float)) \
                and self.direction in (-1, +1):
            return int(self.direction)
        if self.eig_kpoint is not None:
            k = list(self.eig_kpoint)
            for v in k:
                if abs(v) > 1e-12:
                    return +1 if v > 0 else -1
        return +1

    def eig_power(self, freq) -> float:
        """Total injected power at `freq` (python/source.py
        EigenModeSource.eig_power): |amplitude * src spectrum|^2."""
        amp = self.amplitude
        ft = getattr(self.src, "fourier_transform", None)
        if callable(ft):
            amp = amp * ft(freq)
        return abs(amp) ** 2

    def add_source(self, sim):
        """Inject this source into a Simulation (python/source.py
        add_source hook used by Simulation.add_sources)."""
        if not any(s is self for s in sim.sources):
            sim.sources.append(self)
        sim.add_sources()


# exact beams in 2D and 3D share the complex-source-point construction
# (meep.hpp:1707); the reference exposes dimension-suffixed names
GaussianBeam2DSource = GaussianBeamSource
GaussianBeam3DSource = GaussianBeamSource
