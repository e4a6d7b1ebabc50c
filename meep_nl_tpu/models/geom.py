"""Geometry and material scene objects (analog of python/geom.py).

`Vector3`, `Medium` (eps/mu tensors, conductivities, susceptibilities,
chi2/chi3), and geometric primitives (Sphere/Block/Cylinder/Ellipsoid/Cone/
Wedge/Prism).  Objects are pure descriptions; rasterization onto Yee sites
happens in models.scene (the analog of meepgeom.cpp
set_materials_from_geometry).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np


def check_nonnegative(prop, val):
    """Constructor guard (python/geom.py:22)."""
    if val >= 0:
        return val
    raise ValueError(f"{prop} cannot be negative. Got {val}")


def init_do_averaging(mat_func):
    """Default the do_averaging attribute of a user material function
    (python/geom.py:29)."""
    if not hasattr(mat_func, "do_averaging"):
        mat_func.do_averaging = False


def memoize(f):
    """Single-argument memoizer (python/geom.py:1676)."""
    tab = {}

    def _mem(y=None):
        val = tab.get(y)
        if val is None:
            val = f(y)
            tab[y] = val
        return val
    return _mem


class Vector3:
    """Minimal Vector3 compatible with the reference's python/geom.py:Vector3."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def __iter__(self):
        return iter((self.x, self.y, self.z))

    def __getitem__(self, i):
        return (self.x, self.y, self.z)[i]

    def __add__(self, o):
        return Vector3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return Vector3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s):
        if isinstance(s, Vector3):
            return self.x * s.x + self.y * s.y + self.z * s.z
        return Vector3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __truediv__(self, s):
        return Vector3(self.x / s, self.y / s, self.z / s)

    def __neg__(self):
        return Vector3(-self.x, -self.y, -self.z)

    def __eq__(self, o):
        return (isinstance(o, Vector3) and self.x == o.x and self.y == o.y
                and self.z == o.z)

    def __repr__(self):
        return f"Vector3({self.x}, {self.y}, {self.z})"

    def norm(self):
        return math.sqrt(self.x ** 2 + self.y ** 2 + self.z ** 2)

    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o):
        return Vector3(self.y * o.z - self.z * o.y,
                       self.z * o.x - self.x * o.z,
                       self.x * o.y - self.y * o.x)

    def unit(self):
        return self / self.norm()

    def conj(self):
        """Componentwise conjugate (python/geom.py Vector3.conj)."""
        return Vector3(np.conjugate(self.x), np.conjugate(self.y),
                       np.conjugate(self.z))

    def scale(self, s):
        return Vector3(self.x * s, self.y * s, self.z * s)

    def cdot(self, v):
        """conj(self) dot v (python/geom.py Vector3.cdot)."""
        return self.conj().dot(v)

    def close(self, v, tol=1.0e-7):
        """Componentwise |self - v| <= tol (python/geom.py
        Vector3.close)."""
        return (abs(self.x - v.x) <= tol and abs(self.y - v.y) <= tol
                and abs(self.z - v.z) <= tol)

    def rotate(self, axis, theta):
        """Rotate by theta radians about axis (python/geom.py
        Vector3.rotate)."""
        return get_rotation_matrix(axis, theta) * self

    def rotate_lattice(self, axis, theta, lat):
        a = lattice_to_cartesian(axis, lat)
        v = lattice_to_cartesian(self, lat)
        return cartesian_to_lattice(v.rotate(a, theta), lat)

    def rotate_reciprocal(self, axis, theta, lat):
        a = reciprocal_to_cartesian(axis, lat)
        v = reciprocal_to_cartesian(self, lat)
        return cartesian_to_reciprocal(v.rotate(a, theta), lat)


def _v3(v) -> Vector3:
    if isinstance(v, Vector3):
        return v
    if np.isscalar(v):
        return Vector3(v, v, v)
    t = tuple(v) + (0.0, 0.0, 0.0)
    return Vector3(*t[:3])


# ---------------------------------------------------------------------------
# Susceptibilities (python/geom.py Susceptibility hierarchy)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LorentzianSusceptibility:
    """sigma * frequency^2 / (frequency^2 - f^2 - i f gamma)
    (susceptibility.cpp:188)."""
    frequency: float = 0.0
    gamma: float = 0.0
    sigma: float = 1.0
    sigma_diag: Optional[Vector3] = None

    drude: bool = False

    def sigma_vec(self) -> Vector3:
        if self.sigma_diag is not None:
            return _v3(self.sigma_diag)
        return Vector3(self.sigma, self.sigma, self.sigma)


@dataclasses.dataclass
class DrudeSusceptibility(LorentzianSusceptibility):
    """sigma * frequency^2 / (-f^2 - i f gamma): free carriers
    (no_omega_0_denominator, susceptibility.cpp:196)."""
    drude: bool = True


@dataclasses.dataclass
class NoisyLorentzianSusceptibility(LorentzianSusceptibility):
    noise_amp: float = 0.0


@dataclasses.dataclass
class GyrotropicLorentzianSusceptibility(LorentzianSusceptibility):
    bias: Vector3 = dataclasses.field(default_factory=Vector3)


@dataclasses.dataclass
class GyrotropicSaturatedSusceptibility(GyrotropicLorentzianSusceptibility):
    """Linearized Landau-Lifshitz-Gilbert gyrotropy (python/geom.py
    GyrotropicSaturatedSusceptibility; susceptibility.cpp:519
    GYROTROPIC_SATURATED): `frequency` is the Larmor precession
    frequency, `gamma` the off-diagonal loss rate, `alpha` the diagonal
    (Gilbert) loss factor; `bias` sets the precession AXIS only (its
    magnitude is ignored — the medium is saturated)."""
    alpha: float = 0.0
    saturated: bool = True


@dataclasses.dataclass
class Transition:
    """One atomic transition (python/geom.py Transition)."""
    from_level: int
    to_level: int
    transition_rate: float = 0.0          # nonradiative rate (into Gamma)
    frequency: float = 0.0                # radiative transition frequency
    gamma: float = 0.0                    # linewidth
    sigma_diag: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(1, 1, 1))
    pumping_rate: float = 0.0


@dataclasses.dataclass
class MultilevelAtom:
    """Saturable multilevel gain medium (python/geom.py MultilevelAtom;
    src/multilevel-atom.cpp)."""
    initial_populations: List[float] = dataclasses.field(default_factory=list)
    transitions: List[Transition] = dataclasses.field(default_factory=list)
    sigma: float = 1.0
    #: optional per-direction coupling (the ctl frontend's
    #: (sigma-diag sx sy sz) on the atom, scheme/meep.scm.in
    #: multilevel-atom class); None = isotropic `sigma`
    sigma_diag: Any = None

    def to_matrices(self):
        """(Gamma LxL, N0 L, alpha LxT, omega T, gamma T, sigmat Tx3) for
        the radiative transitions; nonradiative/pumping rates fold into
        Gamma (meepgeom.cpp's add_susceptibilities multilevel branch)."""
        import numpy as np
        L = len(self.initial_populations)
        rad = [t for t in self.transitions if t.frequency != 0]
        T = len(rad)
        Gamma = np.zeros((L, L))
        for t in self.transitions:
            rate = t.transition_rate + t.pumping_rate
            if rate != 0:
                i, j = t.from_level, t.to_level
                Gamma[i, i] += rate
                Gamma[j, i] -= rate
        alpha = np.zeros((L, T))
        omega = np.zeros(T)
        gam = np.zeros(T)
        sigmat = np.zeros((T, 3))
        for k, t in enumerate(rad):
            omega[k] = t.frequency
            gam[k] = t.gamma
            # sign convention: E.dP > 0 (field does work on the medium,
            # absorption) pumps population INTO the upper (from_)level;
            # the inversion dN = N[alpha>0] - N[alpha<0] then drives gain
            # with the inverted sign in the oscillator (multilevel-atom.cpp)
            alpha[t.from_level, k] = +1.0 / (2 * np.pi * t.frequency)
            alpha[t.to_level, k] = -1.0 / (2 * np.pi * t.frequency)
            sigmat[k] = tuple(_v3(t.sigma_diag))
        if self.sigma_diag is not None:
            sigmat = sigmat * np.asarray(tuple(_v3(self.sigma_diag)))
        return Gamma, np.asarray(self.initial_populations, float), \
            alpha, omega, gam, sigmat


# ---------------------------------------------------------------------------
# Medium
# ---------------------------------------------------------------------------


class _MediumEval(float):
    """Scalar medium parameter that doubles as the reference's frequency
    evaluator: `m.epsilon` behaves as the instantaneous float in
    arithmetic, while `m.epsilon(freq)` returns the full dispersive
    complex tensor (python/geom.py Medium.epsilon / Medium.mu):

        eps(f) = eps_inst + sum_j sigma_j f_j^2/(f_j^2 - f^2 - i f g_j)
                 (Drude: -f^2 - i f g denominator) + i sigma_cond / f
    """

    def __new__(cls, value, medium=None, kind="e"):
        o = super().__new__(cls, value)
        o._medium = medium
        o._kind = kind
        return o

    def __call__(self, freq):
        m = self._medium
        if self._kind == "e":
            return m._epsmu(m.eps_diag_vec(), m.epsilon_offdiag,
                            m.E_susceptibilities, m.cond_diag_vec(), freq)
        b = Vector3(m.B_conductivity, m.B_conductivity, m.B_conductivity)
        return m._epsmu(m.mu_diag_vec(), None, m.H_susceptibilities, b,
                        freq)


@dataclasses.dataclass
class Medium:
    """Material description (python/geom.py:Medium).

    epsilon/mu may be scalars or diagonal Vector3; off-diagonal entries via
    epsilon_offdiag.  chi2/chi3 are the scalar nonlinear susceptibilities;
    chi2_full_tensor selects the fork's Newton-Raphson coupled solve
    (zinc-blende chi2, newton_raphson.cpp)."""
    epsilon: float = 1.0
    epsilon_diag: Optional[Vector3] = None
    epsilon_offdiag: Optional[Vector3] = None    # (xy, xz, yz) entries
    mu: float = 1.0
    mu_diag: Optional[Vector3] = None
    D_conductivity: float = 0.0
    D_conductivity_diag: Optional[Vector3] = None
    B_conductivity: float = 0.0
    chi2: float = 0.0
    chi3: float = 0.0
    chi2_full_tensor: bool = False
    E_susceptibilities: List[LorentzianSusceptibility] = dataclasses.field(
        default_factory=list)
    H_susceptibilities: List[LorentzianSusceptibility] = dataclasses.field(
        default_factory=list)
    index: dataclasses.InitVar[Optional[float]] = None

    def __post_init__(self, index):
        if index is not None:
            self.epsilon = index ** 2
        self.epsilon = _MediumEval(self.epsilon, self, "e")
        self.mu = _MediumEval(self.mu, self, "h")

    def eps_diag_vec(self) -> Vector3:
        if self.epsilon_diag is not None:
            return _v3(self.epsilon_diag)
        return Vector3(self.epsilon, self.epsilon, self.epsilon)

    def mu_diag_vec(self) -> Vector3:
        if self.mu_diag is not None:
            return _v3(self.mu_diag)
        return Vector3(self.mu, self.mu, self.mu)

    def cond_diag_vec(self) -> Vector3:
        if self.D_conductivity_diag is not None:
            return _v3(self.D_conductivity_diag)
        return Vector3(self.D_conductivity, self.D_conductivity,
                       self.D_conductivity)

    def _epsmu(self, diag, offdiag, sus, cond, freq) -> np.ndarray:
        fr = np.atleast_1d(np.asarray(freq, np.float64))
        out = np.zeros((len(fr), 3, 3), np.complex128)
        dv = tuple(diag)
        for i in range(3):
            out[:, i, i] = dv[i]
        if offdiag is not None:
            ov = _v3(offdiag)
            out[:, 0, 1] = out[:, 1, 0] = ov.x
            out[:, 0, 2] = out[:, 2, 0] = ov.y
            out[:, 1, 2] = out[:, 2, 1] = ov.z
        for s in sus:
            sv = tuple(s.sigma_vec())
            f0, g = s.frequency, s.gamma
            if getattr(s, "drude", False):
                chi = f0 ** 2 / (-fr ** 2 - 1j * fr * g)
            else:
                chi = f0 ** 2 / (f0 ** 2 - fr ** 2 - 1j * fr * g)
            for i in range(3):
                out[:, i, i] += sv[i] * chi
        cv = tuple(cond)
        for i in range(3):
            out[:, i, i] += 1j * cv[i] / np.where(fr == 0, np.inf, fr)
        return out[0] if np.isscalar(freq) else out

    def transform(self, m):
        """Transform epsilon, mu, and susceptibility sigmas by the 3x3
        matrix M: chi -> M chi M^T / |det M| (python/geom.py
        Medium.transform, transformation optics)."""
        M = np.asarray(m.m if hasattr(m, "m") else m, float).reshape(3, 3)
        det = abs(np.linalg.det(M))

        def xf(diag, offdiag):
            d = tuple(diag)
            o = tuple(_v3(offdiag)) if offdiag is not None else (0, 0, 0)
            chi = np.array([[d[0], o[0], o[1]],
                            [o[0], d[1], o[2]],
                            [o[1], o[2], d[2]]], float)
            t = M @ chi @ M.T / det
            return (Vector3(t[0, 0], t[1, 1], t[2, 2]),
                    Vector3(t[0, 1], t[0, 2], t[1, 2]))
        ed, eo = xf(self.eps_diag_vec(), self.epsilon_offdiag)
        self.epsilon_diag, self.epsilon_offdiag = ed, eo
        self.epsilon = _MediumEval(1.0, self, "e")   # tensor now in diag
        md, _mo = xf(self.mu_diag_vec(), None)
        self.mu_diag = md
        self.mu = _MediumEval(1.0, self, "h")
        for s in list(self.E_susceptibilities) + \
                list(self.H_susceptibilities):
            sd, so = xf(s.sigma_vec(), getattr(s, "sigma_offdiag", None))
            s.sigma_diag = sd
            if hasattr(s, "sigma_offdiag"):
                s.sigma_offdiag = so
        return self

    def rotate(self, axis, theta):
        """Rotate the material tensors about `axis` by `theta`
        (python/geom.py Medium.rotate)."""
        return self.transform(get_rotation_matrix(axis, theta))

    # NOTE: `epsilon` and `mu` are dataclass FIELDS (instantaneous
    # scalars) that __post_init__ wraps in _MediumEval, a float subclass
    # that is ALSO callable — so both the scalar uses (m.epsilon - 1)
    # and the reference's frequency evaluations (m.epsilon(freqs) ->
    # (N,3,3) complex tensor, python/geom.py Medium.epsilon/mu) work.


vacuum = Medium()
air = Medium()
metal = Medium(epsilon=-1e20)   # placeholder for PEC-ish


# ---------------------------------------------------------------------------
# Geometric objects (python/geom.py GeometricObject hierarchy)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GeometricObject:
    material: Medium = dataclasses.field(default_factory=Medium)
    center: Vector3 = dataclasses.field(default_factory=Vector3)

    def inside(self, pts: np.ndarray) -> np.ndarray:
        """pts: (..., 3) absolute coordinates -> boolean mask."""
        raise NotImplementedError

    def normal_at(self, pts: np.ndarray) -> Optional[np.ndarray]:
        """(..., 3) unit outward normal of the object's nearest surface.

        The analog of the reference's normal_to_fixed_object /
        sphere-quadrature normal estimation (anisotropic_averaging.cpp:27,
        sphere-quad.cpp): subpixel smoothing needs the interface normal at
        mixed voxels.  Shapes with analytic surfaces return it exactly;
        None (the base default) falls back to the fill-fraction-gradient
        estimate in models.scene."""
        return None

    def _init_common(self, material, center):
        self.material = material if material is not None else Medium()
        self.center = center if center is not None else Vector3()


# NOTE: the reference's shapes take their defining parameter as the FIRST
# positional (Block(size), Sphere(radius), Prism(vertices);
# python/geom.py:1245), so these classes hand-write __init__ instead of
# relying on dataclass field order (which would put `material` first).
@dataclasses.dataclass(init=False)
class Sphere(GeometricObject):
    radius: float = 0.0

    def __init__(self, radius=0.0, material=None, center=None):
        self.radius = float(radius)
        self._init_common(material, center)

    def inside(self, pts):
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        return (d ** 2).sum(-1) <= self.radius ** 2

    def normal_at(self, pts):
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        r = np.sqrt(np.maximum((d ** 2).sum(-1, keepdims=True), 1e-300))
        return d / r


@dataclasses.dataclass(init=False)
class Block(GeometricObject):
    size: Vector3 = dataclasses.field(default_factory=Vector3)
    e1: Vector3 = dataclasses.field(default_factory=lambda: Vector3(1, 0, 0))
    e2: Vector3 = dataclasses.field(default_factory=lambda: Vector3(0, 1, 0))
    e3: Vector3 = dataclasses.field(default_factory=lambda: Vector3(0, 0, 1))

    def __init__(self, size=None, e1=None, e2=None, e3=None,
                 material=None, center=None):
        self.size = size if size is not None else Vector3()
        self.e1 = e1 if e1 is not None else Vector3(1, 0, 0)
        self.e2 = e2 if e2 is not None else Vector3(0, 1, 0)
        self.e3 = e3 if e3 is not None else Vector3(0, 0, 1)
        self._init_common(material, center)

    def inside(self, pts):
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        size = np.array(tuple(_v3(self.size)))
        ok = np.ones(pts.shape[:-1], dtype=bool)
        for ei, s in zip((self.e1, self.e2, self.e3), size):
            e = np.array(tuple(_v3(ei)), dtype=np.float64)
            e = e / np.linalg.norm(e)
            proj = (d * e).sum(-1)
            half = s / 2 if s != float("inf") else np.inf
            ok &= np.abs(proj) <= half + 1e-12
        return ok

    def normal_at(self, pts):
        # nearest face: the finite axis with the least distance to its face
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        size = np.array(tuple(_v3(self.size)))
        best = np.full(pts.shape[:-1], np.inf)
        normal = np.zeros(pts.shape[:-1] + (3,))
        for ei, s in zip((self.e1, self.e2, self.e3), size):
            if s == float("inf"):
                continue
            e = np.array(tuple(_v3(ei)), dtype=np.float64)
            e = e / np.linalg.norm(e)
            proj = (d * e).sum(-1)
            dist = np.abs(s / 2 - np.abs(proj))
            closer = dist < best
            best = np.where(closer, dist, best)
            sgn = np.where(proj >= 0, 1.0, -1.0)
            normal = np.where(closer[..., None], sgn[..., None] * e, normal)
        return normal if np.isfinite(best).any() else None


@dataclasses.dataclass(init=False)
class Ellipsoid(Block):
    def inside(self, pts):
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        size = np.array(tuple(_v3(self.size)))
        r = np.zeros(pts.shape[:-1])
        for ei, s in zip((self.e1, self.e2, self.e3), size):
            e = np.array(tuple(_v3(ei)), dtype=np.float64)
            e = e / np.linalg.norm(e)
            proj = (d * e).sum(-1)
            if s == 0:
                continue
            r += (2 * proj / s) ** 2
        return r <= 1.0

    def normal_at(self, pts):
        # gradient of sum_i (2 proj_i / s_i)^2: n ~ sum_i proj_i/(s_i/2)^2 e_i
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        size = np.array(tuple(_v3(self.size)))
        g = np.zeros(pts.shape[:-1] + (3,))
        for ei, s in zip((self.e1, self.e2, self.e3), size):
            if s == 0 or s == float("inf"):
                continue
            e = np.array(tuple(_v3(ei)), dtype=np.float64)
            e = e / np.linalg.norm(e)
            proj = (d * e).sum(-1)
            g = g + (proj / (s / 2) ** 2)[..., None] * e
        nrm = np.sqrt(np.maximum((g ** 2).sum(-1, keepdims=True), 1e-300))
        return g / nrm


@dataclasses.dataclass(init=False)
class Cylinder(GeometricObject):
    radius: float = 0.0
    height: float = float("inf")
    axis: Vector3 = dataclasses.field(default_factory=lambda: Vector3(0, 0, 1))

    def __init__(self, radius=0.0, height=float("inf"), axis=None,
                 material=None, center=None, **kw):
        self.radius = float(radius)
        self.height = height
        self.axis = axis if axis is not None else Vector3(0, 0, 1)
        self._init_common(material, center)
        for k, v in kw.items():      # subclass extras (radius2, wedge_*)
            setattr(self, k, v)

    def inside(self, pts):
        c = np.array(tuple(_v3(self.center)))
        a = np.array(tuple(_v3(self.axis)), dtype=np.float64)
        a = a / np.linalg.norm(a)
        d = pts - c
        z = (d * a).sum(-1)
        perp = d - z[..., None] * a
        r2 = (perp ** 2).sum(-1)
        ok = r2 <= self.radius ** 2
        if self.height != float("inf"):
            ok &= np.abs(z) <= self.height / 2
        return ok

    def normal_at(self, pts):
        c = np.array(tuple(_v3(self.center)))
        a = np.array(tuple(_v3(self.axis)), dtype=np.float64)
        a = a / np.linalg.norm(a)
        d = pts - c
        z = (d * a).sum(-1)
        perp = d - z[..., None] * a
        r = np.sqrt(np.maximum((perp ** 2).sum(-1), 1e-300))
        lat = perp / r[..., None]
        lat_dist = np.abs(r - self.radius)
        if self.height == float("inf"):
            return lat
        cap_dist = np.abs(self.height / 2 - np.abs(z))
        sgn = np.where(z >= 0, 1.0, -1.0)
        cap = sgn[..., None] * a
        return np.where((lat_dist <= cap_dist)[..., None], lat, cap)


@dataclasses.dataclass(init=False)
class Cone(Cylinder):
    radius2: float = 0.0

    def __init__(self, *a, radius2=0.0, **kw):
        super().__init__(*a, **kw)
        self.radius2 = radius2

    def inside(self, pts):
        c = np.array(tuple(_v3(self.center)))
        a = np.array(tuple(_v3(self.axis)), dtype=np.float64)
        a = a / np.linalg.norm(a)
        d = pts - c
        z = (d * a).sum(-1)
        perp = d - z[..., None] * a
        r2 = (perp ** 2).sum(-1)
        h = self.height if self.height != float("inf") else 1e20
        frac = np.clip(z / h + 0.5, 0.0, 1.0)
        rad = self.radius + (self.radius2 - self.radius) * frac
        return (r2 <= rad ** 2) & (np.abs(z) <= h / 2)

    def normal_at(self, pts):
        c = np.array(tuple(_v3(self.center)))
        a = np.array(tuple(_v3(self.axis)), dtype=np.float64)
        a = a / np.linalg.norm(a)
        d = pts - c
        z = (d * a).sum(-1)
        perp = d - z[..., None] * a
        r = np.sqrt(np.maximum((perp ** 2).sum(-1), 1e-300))
        h = self.height if self.height != float("inf") else 1e20
        slope = (self.radius2 - self.radius) / h   # dr_surface/dz
        # lateral normal: radial direction minus the surface slope along
        # the axis, normalized
        lat = (perp / r[..., None] - slope * a) / math.sqrt(1 + slope ** 2)
        rad = self.radius + (self.radius2 - self.radius) * np.clip(
            z / h + 0.5, 0.0, 1.0)
        lat_dist = np.abs(r - rad) / math.sqrt(1 + slope ** 2)
        cap_dist = np.abs(h / 2 - np.abs(z))
        sgn = np.where(z >= 0, 1.0, -1.0)
        cap = sgn[..., None] * a
        return np.where((lat_dist <= cap_dist)[..., None], lat, cap)


@dataclasses.dataclass(init=False)
class Wedge(Cylinder):
    wedge_angle: float = 2 * math.pi
    wedge_start: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(1, 0, 0))

    def __init__(self, *a, wedge_angle=2 * math.pi, wedge_start=None, **kw):
        super().__init__(*a, **kw)
        self.wedge_angle = wedge_angle
        self.wedge_start = wedge_start if wedge_start is not None \
            else Vector3(1, 0, 0)

    def inside(self, pts):
        ok = super().inside(pts)
        if self.wedge_angle >= 2 * math.pi:
            return ok
        a = np.array(tuple(_v3(self.axis)), dtype=np.float64)
        a = a / np.linalg.norm(a)
        s = np.array(tuple(_v3(self.wedge_start)), dtype=np.float64)
        s = s - (s @ a) * a
        s = s / np.linalg.norm(s)
        t = np.cross(a, s)
        c = np.array(tuple(_v3(self.center)))
        d = pts - c
        ang = np.arctan2((d * t).sum(-1), (d * s).sum(-1)) % (2 * math.pi)
        return ok & (ang <= self.wedge_angle)


@dataclasses.dataclass(init=False)
class Prism(GeometricObject):
    """Polygonal prism (GDSII import target; src/GDSIIgeom.cpp)."""
    vertices: List[Vector3] = dataclasses.field(default_factory=list)
    height: float = float("inf")
    axis: Vector3 = dataclasses.field(default_factory=lambda: Vector3(0, 0, 1))
    sidewall_angle: float = 0.0

    def __init__(self, vertices=None, height=float("inf"), axis=None,
                 sidewall_angle=0.0, material=None, center=None):
        self.vertices = list(vertices) if vertices is not None else []
        self.height = height
        self.axis = axis if axis is not None else Vector3(0, 0, 1)
        self.sidewall_angle = sidewall_angle
        self._init_common(material, center)

    def inside(self, pts):
        # 2D point-in-polygon in the plane normal to axis (z assumed)
        vx = np.array([v.x for v in self.vertices])
        vy = np.array([v.y for v in self.vertices])
        x, y = pts[..., 0], pts[..., 1]
        n = len(vx)
        ok = np.zeros(pts.shape[:-1], dtype=bool)
        j = n - 1
        for i in range(n):
            cond = ((vy[i] > y) != (vy[j] > y)) & (
                x < (vx[j] - vx[i]) * (y - vy[i]) / (vy[j] - vy[i] + 1e-300)
                + vx[i])
            ok ^= cond
            j = i
        if self.height != float("inf"):
            z0 = _v3(self.center).z
            ok &= np.abs(pts[..., 2] - z0) <= self.height / 2
        return ok

    def normal_at(self, pts):
        # nearest polygon edge's in-plane outward normal (z-axis prisms,
        # matching inside()); caps win where closer for finite height
        vx = np.array([v.x for v in self.vertices])
        vy = np.array([v.y for v in self.vertices])
        n = len(vx)
        if n < 3:
            return None
        area2 = np.sum(vx * np.roll(vy, -1) - np.roll(vx, -1) * vy)
        ccw = 1.0 if area2 > 0 else -1.0
        x, y = pts[..., 0], pts[..., 1]
        best = np.full(pts.shape[:-1], np.inf)
        normal = np.zeros(pts.shape[:-1] + (3,))
        for i in range(n):
            j = (i + 1) % n
            ex, ey = vx[j] - vx[i], vy[j] - vy[i]
            L2 = ex * ex + ey * ey
            if L2 < 1e-30:
                continue
            t = np.clip(((x - vx[i]) * ex + (y - vy[i]) * ey) / L2, 0.0, 1.0)
            dx, dy = x - (vx[i] + t * ex), y - (vy[i] + t * ey)
            dist = np.sqrt(dx * dx + dy * dy)
            closer = dist < best
            best = np.where(closer, dist, best)
            L = math.sqrt(L2)
            # CCW polygon: outward = edge direction rotated -90deg
            nvec = np.array([ccw * ey / L, -ccw * ex / L, 0.0])
            normal = np.where(closer[..., None], nvec, normal)
        if self.height != float("inf"):
            z0 = _v3(self.center).z
            dz = pts[..., 2] - z0
            cap_dist = np.abs(self.height / 2 - np.abs(dz))
            sgn = np.where(dz >= 0, 1.0, -1.0)
            cap = np.zeros(pts.shape[:-1] + (3,))
            cap[..., 2] = sgn
            normal = np.where((cap_dist < best)[..., None], cap, normal)
        return normal


# ---------------------------------------------------------------------------
# reference-API compatibility surface (python/geom.py / simulation.py names)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Susceptibility:
    """Base susceptibility (python/geom.py Susceptibility): a bare sigma
    amplitude with no dispersion of its own.  The concrete classes
    (LorentzianSusceptibility, DrudeSusceptibility, ...) carry their own
    fields; this base exists for API parity and user subclassing."""
    sigma: float = 1.0
    sigma_diag: Optional[Vector3] = None

    def sigma_vec(self) -> Vector3:
        if self.sigma_diag is not None:
            return _v3(self.sigma_diag)
        return Vector3(self.sigma, self.sigma, self.sigma)


@dataclasses.dataclass
class NoisyDrudeSusceptibility(NoisyLorentzianSusceptibility):
    """Noisy free-carrier pole (python/geom.py NoisyDrudeSusceptibility)."""
    drude: bool = True


@dataclasses.dataclass
class GyrotropicDrudeSusceptibility(GyrotropicLorentzianSusceptibility):
    """Gyrotropic free-carrier pole (python/geom.py)."""
    drude: bool = True


@dataclasses.dataclass
class Volume:
    """A rectangular region (python/simulation.py Volume): center + size.
    Accepted by in_volume/get_array-style APIs via get_center_and_size."""
    center: Vector3 = dataclasses.field(default_factory=Vector3)
    size: Vector3 = dataclasses.field(default_factory=Vector3)
    dims: int = 3
    is_cylindrical: bool = False

    def pt_in_volume(self, pt) -> bool:
        c, s = _v3(self.center), _v3(self.size)
        p = _v3(pt)
        return all(abs(getattr(p, d) - getattr(c, d))
                   <= getattr(s, d) / 2 + 1e-12 for d in "xyz")

    def get_vertices(self):
        c, s = _v3(self.center), _v3(self.size)
        out = []
        for sx in (-0.5, 0.5):
            for sy in (-0.5, 0.5):
                for sz in (-0.5, 0.5):
                    out.append(Vector3(c.x + sx * s.x, c.y + sy * s.y,
                                       c.z + sz * s.z))
        return out


def get_center_and_size(vol) -> Tuple[Vector3, Vector3]:
    """(center, size) of a Volume-like object (python/simulation.py)."""
    if hasattr(vol, "center") and hasattr(vol, "size"):
        return _v3(vol.center), _v3(vol.size)
    if isinstance(vol, (tuple, list)) and len(vol) == 2:
        return _v3(vol[0]), _v3(vol[1] if vol[1] is not None else Vector3())
    raise TypeError(f"not a volume: {vol!r}")


class Matrix:
    """3x3 matrix of column vectors (python/geom.py Matrix): supports
    mm/inverse/transpose/determinant and Vector3 application."""

    def __init__(self, c1=Vector3(), c2=Vector3(), c3=Vector3(),
                 diag=None, offdiag=None):
        if diag is not None:
            d = _v3(diag)
            o = _v3(offdiag) if offdiag is not None else Vector3()
            self.m = np.array([[d.x, o.x, o.y],
                               [o.x, d.y, o.z],
                               [o.y, o.z, d.z]], float)
        else:
            self.m = np.array([list(_v3(c1)), list(_v3(c2)),
                               list(_v3(c3))], float).T

    @property
    def c1(self):
        return Vector3(*self.m[:, 0])

    @property
    def c2(self):
        return Vector3(*self.m[:, 1])

    @property
    def c3(self):
        return Vector3(*self.m[:, 2])

    def __mul__(self, other):
        if isinstance(other, Matrix):
            out = Matrix()
            out.m = self.m @ other.m
            return out
        if isinstance(other, Vector3) or (
                isinstance(other, (tuple, list)) and len(other) == 3):
            v = self.m @ np.asarray(list(_v3(other)))
            return Vector3(*v)
        out = Matrix()
        out.m = self.m * float(other)
        return out

    def mm_mult(self, other):
        return self * other

    def mv_mult(self, v):
        return self * _v3(v)

    def inverse(self):
        out = Matrix()
        out.m = np.linalg.inv(self.m)
        return out

    def transpose(self):
        out = Matrix()
        out.m = self.m.T
        return out

    def getH(self):
        out = Matrix()
        out.m = self.m.conj().T if np.iscomplexobj(self.m) else self.m.T
        return out

    def determinant(self):
        return float(np.linalg.det(self.m))

    def conj(self):
        out = Matrix()
        out.m = np.conjugate(self.m)
        return out

    def scale(self, s):
        return self * s

    def row(self, i):
        return Vector3(*self.m[i])

    def __repr__(self):
        return f"Matrix({self.m!r})"


def get_rotation_matrix(axis, theta) -> Matrix:
    """Rotation by angle theta (radians) about `axis`
    (python/geom.py get_rotation_matrix; Rodrigues form)."""
    a = np.asarray(list(_v3(axis)), float)
    n = np.linalg.norm(a)
    if n == 0:
        raise ValueError("zero rotation axis")
    a = a / n
    K = np.array([[0, -a[2], a[1]],
                  [a[2], 0, -a[0]],
                  [-a[1], a[0], 0]])
    R = np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)
    out = Matrix()
    out.m = R
    return out


@dataclasses.dataclass
class Lattice:
    """MPB lattice (python/geom.py Lattice): size + basis vectors, with
    the cartesian/lattice/reciprocal transforms."""
    size: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(1, 1, 1))
    basis_size: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(1, 1, 1))
    basis1: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(1, 0, 0))
    basis2: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(0, 1, 0))
    basis3: Vector3 = dataclasses.field(
        default_factory=lambda: Vector3(0, 0, 1))

    def _norm_basis(self):
        cols = []
        for b, s in ((self.basis1, self.basis_size.x),
                     (self.basis2, self.basis_size.y),
                     (self.basis3, self.basis_size.z)):
            v = np.asarray(list(_v3(b)), float)
            nv = np.linalg.norm(v)
            cols.append((v / (nv or 1.0)) * s)
        return np.array(cols).T

    @property
    def basis(self) -> Matrix:
        out = Matrix()
        out.m = self._norm_basis()
        return out

    @property
    def metric(self) -> Matrix:
        b = self._norm_basis()
        out = Matrix()
        out.m = b.T @ b
        return out


def lattice_to_cartesian(x, lat: Lattice):
    if isinstance(x, Matrix):
        out = Matrix()
        b = lat.basis.m
        out.m = b @ x.m @ np.linalg.inv(b)
        return out
    return lat.basis * _v3(x)


def cartesian_to_lattice(x, lat: Lattice):
    if isinstance(x, Matrix):
        out = Matrix()
        b = lat.basis.m
        out.m = np.linalg.inv(b) @ x.m @ b
        return out
    return lat.basis.inverse() * _v3(x)


def lattice_to_reciprocal(x, lat: Lattice):
    """Lattice basis -> reciprocal basis (MPB convention: reciprocal
    basis_i = lattice basis_i scaled so b_i . a_j = delta_ij, sans the
    2 pi)."""
    b = lat.basis.m
    recip = np.linalg.inv(b).T
    if isinstance(x, Matrix):
        out = Matrix()
        out.m = np.linalg.inv(recip) @ b @ x.m @ np.linalg.inv(b) @ recip
        return out
    v = np.asarray(list(_v3(x)))
    # components in lattice basis -> components in reciprocal basis
    return Vector3(*(np.linalg.inv(recip) @ b @ v))


def reciprocal_to_lattice(x, lat: Lattice):
    b = lat.basis.m
    recip = np.linalg.inv(b).T
    if isinstance(x, Matrix):
        out = Matrix()
        out.m = np.linalg.inv(b) @ recip @ x.m @ np.linalg.inv(recip) @ b
        return out
    v = np.asarray(list(_v3(x)))
    return Vector3(*(np.linalg.inv(b) @ recip @ v))


def reciprocal_to_cartesian(x, lat: Lattice):
    b = lat.basis.m
    recip = np.linalg.inv(b).T
    if isinstance(x, Matrix):
        out = Matrix()
        out.m = recip @ x.m @ np.linalg.inv(recip)
        return out
    return Vector3(*(recip @ np.asarray(list(_v3(x)))))


def cartesian_to_reciprocal(x, lat: Lattice):
    b = lat.basis.m
    recip = np.linalg.inv(b).T
    if isinstance(x, Matrix):
        out = Matrix()
        out.m = np.linalg.inv(recip) @ x.m @ recip
        return out
    return Vector3(*(np.linalg.inv(recip) @ np.asarray(list(_v3(x)))))


def interpolate(n: int, nums: Sequence):
    """Insert n linearly-interpolated values between each pair
    (python/simulation.py interpolate; k-point paths)."""
    out = []
    items = list(nums)
    for a, b in zip(items[:-1], items[1:]):
        va = np.asarray(list(_v3(a)) if isinstance(a, Vector3) else
                        np.atleast_1d(a), float)
        vb = np.asarray(list(_v3(b)) if isinstance(b, Vector3) else
                        np.atleast_1d(b), float)
        for i in range(n + 1):
            t = i / (n + 1)
            v = va + (vb - va) * t
            out.append(Vector3(*v) if isinstance(a, Vector3)
                       else (v[0] if v.size == 1 else v))
    out.append(items[-1])
    return out


def geometric_object_duplicates(shift_vector, min_multiple, max_multiple,
                                obj):
    """Copies of obj at center + k*shift for k in
    [min_multiple, max_multiple] (libctl geometric-object-duplicates)."""
    sv = np.asarray(list(_v3(shift_vector)), float)
    out = []
    for k in range(int(min_multiple), int(max_multiple) + 1):
        c = np.asarray(list(_v3(obj.center))) + k * sv
        out.append(dataclasses.replace(obj, center=Vector3(*c)))
    return out


def geometric_objects_duplicates(shift_vector, min_multiple, max_multiple,
                                 objs):
    out = []
    for obj in objs:
        out += geometric_object_duplicates(shift_vector, min_multiple,
                                           max_multiple, obj)
    return out


def geometric_objects_lattice_duplicates(lat, objs, *usize):
    """Duplicate objs to tile the lattice cell (libctl
    geometric-objects-lattice-duplicates): one copy per unit cell along
    each basis direction covering lat.size (or the given usize)."""
    u = list(usize) + [1.0] * (3 - len(usize))
    sz = list(_v3(lat.size))
    out = list(objs)
    for ax, b in enumerate((lat.basis1, lat.basis2, lat.basis3)):
        n = int(round(sz[ax] / u[ax])) if u[ax] else 1
        if n <= 1:
            continue
        bv = np.asarray(list(_v3(b)), float)
        bv = bv / (np.linalg.norm(bv) or 1.0) * u[ax]
        lo = -(n // 2)
        hi = lo + n - 1
        new = []
        for obj in out:
            for k in range(lo, hi + 1):
                c = np.asarray(list(_v3(obj.center))) + k * bv
                new.append(dataclasses.replace(obj, center=Vector3(*c)))
        out = new
    return out
