"""ctl → meep_nl_tpu binding layer.

Re-creates the libctl/Scheme user surface of the reference frontend
(reference scheme/meep.scm.in) on top of this package's Python API.  The
reference builds its surface from guile + SWIG-generated wrappers; here the
same script-visible names — input variables, `(make <class> ...)` object
construction, vector3/matrix3x3 algebra, run functions, step-function
combinators, monitor accessors — are bound directly into the Scheme
evaluator's global environment and drive `models.Simulation`.

Semantics mirrored from the reference scheme layer:
  * input vars + lazy (init-fields)        meep.scm.in:300-520
  * volume / flux-region / classes          meep.scm.in:276-295,530-560
  * display-csv / display-fluxes            meep.scm.in:187-193,580-586
  * run-until / run-sources+ / run-k-points meep.scm.in:1269-1385
  * harminv step function + accessors       meep.scm.in:1129-1190
  * stop-when-fields-decayed                meep.scm.in:1330-1356
"""

from __future__ import annotations

import math
import random as _random
from typing import Any, Dict, List, Optional

import numpy as np

import meep_nl_tpu as mp

from .interp import (Environment, Procedure, SchemeError, apply_proc,
                     eval_sexp, standard_env)
from .sexp import Symbol

NO_SIZE = 0.0
INFINITY = 1e20


class Parity(str):
    """Eigenmode parity flag.  ctl composes parities with `+`
    (e.g. `(+ ODD-Z EVEN-Y)`, reference mpb.cpp parity bitmasks); here
    they are tagged strings whose sum keeps every named flag."""
    __slots__ = ()

    def __add__(self, other):
        return Parity(f"{self}+{other}")

    def __radd__(self, other):
        if other in (0, 0.0):
            return self
        return Parity(f"{other}+{self}")


def _reduce_parity(p):
    """Collapse a composed parity onto the 2D TM/TE axis the python
    solvers take (models/simulation.py:1449)."""
    if p is None:
        return None
    parts = str(p).lower().split("+")
    if "te" in parts:
        return "TE"
    if "tm" in parts:
        return "TM"
    return None


# ---------------------------------------------------------------------------
# vector3 / matrix3x3 algebra (libctl utils.scm surface)


def _v3(*args) -> mp.Vector3:
    if len(args) == 1 and isinstance(args[0], mp.Vector3):
        return args[0]
    if len(args) == 1 and isinstance(args[0], (list, tuple, np.ndarray)):
        return mp.Vector3(*args[0])
    vals = list(args) + [0.0] * (3 - len(args))
    return mp.Vector3(*vals[:3])


def _vec_items(v) -> List[float]:
    if isinstance(v, mp.Vector3):
        return [v.x, v.y, v.z]
    return list(v)


def _v3_add(*vs):
    out = [0.0, 0.0, 0.0]
    for v in vs:
        for i, c in enumerate(_vec_items(v)):
            out[i] = out[i] + c
    return mp.Vector3(*out)


def _v3_sub(a, *rest):
    if not rest:
        return mp.Vector3(*[-c for c in _vec_items(a)])
    out = _vec_items(a)
    for v in rest:
        for i, c in enumerate(_vec_items(v)):
            out[i] = out[i] - c
    return mp.Vector3(*out)


def _v3_dot(a, b):
    return sum(x * y for x, y in zip(_vec_items(a), _vec_items(b)))


def _v3_cross(a, b):
    ax, ay, az = _vec_items(a)
    bx, by, bz = _vec_items(b)
    return mp.Vector3(ay * bz - az * by, az * bx - ax * bz,
                      ax * by - ay * bx)


def _v3_scale(s, v):
    return mp.Vector3(*[s * c for c in _vec_items(v)])


def _v3_mul(a, b):
    """(vector3* a b): scalar*vec, vec*scalar, or dot product."""
    a_vec = isinstance(a, (mp.Vector3, list, tuple, np.ndarray))
    b_vec = isinstance(b, (mp.Vector3, list, tuple, np.ndarray))
    if a_vec and b_vec:
        return _v3_dot(a, b)
    if a_vec:
        return _v3_scale(b, a)
    if b_vec:
        return _v3_scale(a, b)
    return a * b


def _v3_norm(v):
    return math.sqrt(sum(abs(c) ** 2 for c in _vec_items(v)))


def _unit_v3(v):
    n = _v3_norm(v)
    return _v3_scale(1.0 / n, v) if n else _v3(v)


def _v3_close(a, b, tol=1e-7):
    return all(abs(x - y) <= tol
               for x, y in zip(_vec_items(a), _vec_items(b)))


def _rotate_v3(axis, theta, v):
    """Rodrigues rotation; libctl argument order (axis theta v)
    (libctl utils.scm rotate-vector3)."""
    u = _unit_v3(axis)
    par = _v3_scale(_v3_dot(u, v), u)
    perp = _v3_sub(_v3(v), par)
    return _v3_add(par, _v3_scale(math.cos(theta), perp),
                   _v3_scale(math.sin(theta), _v3_cross(u, v)))


def _m33(c1, c2, c3):
    return [list(_vec_items(c1)), list(_vec_items(c2)),
            list(_vec_items(c3))]  # column-major like libctl


def _m33_np(m):
    return np.array(m, dtype=complex).T  # rows x cols


def _m33_from_np(a):
    return [list(col) for col in np.asarray(a).T]


def _m33_mul(a, b):
    if isinstance(b, (mp.Vector3,)) or (
            isinstance(b, (list, tuple)) and len(b) == 3 and
            not isinstance(b[0], (list, tuple))):
        out = _m33_np(a) @ np.array(_vec_items(b), dtype=complex)
        out = [c.real if abs(c.imag) < 1e-300 else c for c in out]
        return mp.Vector3(*out)
    if isinstance(b, (int, float, complex)):
        return _m33_from_np(_m33_np(a) * b)
    return _m33_from_np(_m33_np(a) @ _m33_np(b))


# ---------------------------------------------------------------------------
# (make <class> (prop args...) ...) — class registry

_VEC_PROPS = {
    "center", "size", "e1", "e2", "e3", "axis", "bias", "basis1", "basis2",
    "basis3", "basis_size", "sigma_diag", "sigma_offdiag", "epsilon_diag",
    "epsilon_offdiag", "mu_diag", "mu_offdiag", "d_conductivity_diag",
    "b_conductivity_diag", "e_chi2_diag", "e_chi3_diag", "h_chi2_diag",
    "h_chi3_diag", "eig_kpoint", "kdom", "direction_vector",
}

# ctl property name -> python kwarg, where the kebab->snake rule is not enough
_PROP_RENAMES = {
    "src_func": "func",
    "r_asymptotic": "r_asymptotic",
    "material_func": "material_func",
}


def _prop_name(sym: str) -> str:
    name = str(sym).replace("-", "_").rstrip("?")
    if name == "R_asymptotic":
        return "r_asymptotic"
    name = name[0].lower() + name[1:] if name[:1].isupper() and "_" not in \
        name[:2] else name
    return _PROP_RENAMES.get(name, name)


class CtlClass:
    """A constructible ctl class: python target + property cooking."""

    def __init__(self, name: str, build, vec_props=()):
        self.name = name
        self.build = build
        self.vec_props = set(vec_props)

    def make(self, props: Dict[str, Any], state: "CtlState"):
        return self.build(props, state)

    def __repr__(self):  # pragma: no cover
        return f"<ctl class {self.name}>"


def _plain(cls, **fixed):
    """Builder passing cooked props straight to a python class."""
    def build(props, state):
        kw = dict(fixed)
        kw.update(props)
        return cls(**kw)
    return build


def _medium_build(props, state):
    props = dict(props)
    # reference scheme sugar: (epsilon e) == diag e; chi2/chi3 scalars;
    # D-conductivity scalar (meep.scm.in:80-100)
    for legacy, new in (("e_chi2", "chi2"), ("e_chi3", "chi3")):
        if legacy in props:
            props[new] = props.pop(legacy)
    for dropped in ("mu_offdiag", "h_chi2", "h_chi3", "e_chi2_diag",
                    "e_chi3_diag", "h_chi2_diag", "h_chi3_diag"):
        if dropped in props:
            val = props.pop(dropped)
            vals = _vec_items(val) if isinstance(
                val, (mp.Vector3, list, tuple)) else [val]
            if dropped == "e_chi2_diag":
                props["chi2"] = vals[0]
            elif dropped == "e_chi3_diag":
                props["chi3"] = vals[0]
            elif any(abs(v) > 0 for v in vals):
                raise SchemeError(f"medium: unsupported property {dropped}")
    if "conductivity" in props:
        props["D_conductivity"] = props.pop("conductivity")
    for k in list(props):
        if k in ("d_conductivity", "b_conductivity", "d_conductivity_diag",
                 "b_conductivity_diag", "e_susceptibilities",
                 "h_susceptibilities"):
            props[k[0].upper() + k[1:]] = props.pop(k)
    return mp.Medium(**props)


def _metal_build(props, state):
    # the reference's `metal` material: epsilon -> -infinity makes
    # chi1inv -> 0, so E is pinned at 0 inside (materials.scm / meep
    # python mp.metal semantics)
    return mp.Medium(epsilon=-INFINITY)


def _lattice_build(props, state):
    return mp.Lattice(**props)


def _material_function_build(props, state):
    fn = props.get("material_func") or props.get("epsilon_func")
    if fn is None:
        raise SchemeError("material-function needs material-func")
    eps_only = "epsilon_func" in props

    def call(p):
        val = apply_proc(fn, [_v3(*np.asarray(p, dtype=float))]) \
            if not callable(fn) or isinstance(fn, Procedure) else fn(_v3(p))
        if eps_only and isinstance(val, (int, float)):
            return mp.Medium(epsilon=val)
        return val
    call.ctl_material_function = True
    return call


def _source_build(props, state):
    props = dict(props)
    fn = props.get("amp_func")
    if isinstance(fn, Procedure):
        props["amp_func"] = lambda p, _f=fn: apply_proc(
            _f, [_v3(*np.asarray(p, dtype=float))])
    if "eig_parity" in props:
        props["eig_parity"] = _reduce_parity(props["eig_parity"])
    if "eig_parity" in props or "eig_band" in props or \
            "eig_kpoint" in props:
        return mp.EigenModeSource(**props)
    return mp.Source(**props)


def _custom_src_build(props, state):
    props = dict(props)
    fn = props.pop("func", None) or props.pop("src_func", None)
    if isinstance(fn, Procedure):
        f = lambda t, _f=fn: complex(apply_proc(_f, [t]))  # noqa: E731
    else:
        f = fn
    return mp.CustomSource(f, **props)


def _pml_build(cls):
    def build(props, state):
        props = dict(props)
        prof = props.get("pml_profile")
        if isinstance(prof, Procedure):
            props["pml_profile"] = lambda u, _f=prof: float(
                apply_proc(_f, [float(u)]))
        return cls(**props)
    return build


def _volume_build(props, state):
    return mp.Volume(center=props.get("center", mp.Vector3()),
                     size=props.get("size", mp.Vector3()))


def make_class_table() -> Dict[str, CtlClass]:
    T: Dict[str, CtlClass] = {}

    def reg(name, build, vec=()):
        T[name] = CtlClass(name, build, vec)

    reg("medium", _medium_build)
    reg("dielectric", _medium_build)
    reg("perfect-metal", _metal_build)
    reg("material-function", _material_function_build)
    reg("material-type", _medium_build)

    for ctl, cls in (
            ("lorentzian-susceptibility", mp.LorentzianSusceptibility),
            ("polarizability", mp.LorentzianSusceptibility),
            ("drude-susceptibility", mp.DrudeSusceptibility),
            ("noisy-lorentzian-susceptibility",
             mp.NoisyLorentzianSusceptibility),
            ("noisy-drude-susceptibility", mp.NoisyDrudeSusceptibility),
            ("gyrotropic-lorentzian-susceptibility",
             mp.GyrotropicLorentzianSusceptibility),
            ("gyrotropic-drude-susceptibility",
             mp.GyrotropicDrudeSusceptibility),
            ("gyrotropic-saturated-susceptibility",
             mp.GyrotropicSaturatedSusceptibility),
            ("block", mp.Block),
            ("sphere", mp.Sphere),
            ("cylinder", mp.Cylinder),
            ("cone", mp.Cone),
            ("wedge", mp.Wedge),
            ("ellipsoid", mp.Ellipsoid),
            ("prism", mp.Prism),
            ("flux-region", mp.FluxRegion),
            ("mode-region", mp.FluxRegion),
            ("energy-region", mp.FluxRegion),
            ("force-region", mp.FluxRegion),
            ("near2far-region", mp.Near2FarRegion),
            ("mirror-sym", mp.Mirror),
            ("rotate2-sym", mp.Rotate2),
            ("rotate4-sym", mp.Rotate4),
            ("gaussian-src", mp.GaussianSource),
            ("continuous-src", mp.ContinuousSource),
            ("gaussian-beam-src", mp.GaussianBeamSource),
    ):
        reg(ctl, _plain(cls))
    def _multilevel_build(props, state):
        """ctl multilevel-atom: levels are 1-BASED (scheme examples use
        from-level 1 for the ground state); the python API is 0-based.
        Shift, and pad initial-populations out to the level count."""
        import dataclasses as _dc
        props = dict(props)
        trans = list(props.get("transitions", []))
        if trans and min(min(t.from_level, t.to_level)
                         for t in trans) >= 1:
            trans = [_dc.replace(t, from_level=t.from_level - 1,
                                 to_level=t.to_level - 1) for t in trans]
        L = 1 + max((max(t.from_level, t.to_level) for t in trans),
                    default=0)
        pops = list(props.get("initial_populations", []))
        if not isinstance(pops, list):
            pops = [pops]
        pops = pops + [0.0] * (L - len(pops))
        props["transitions"] = trans
        props["initial_populations"] = pops
        if "sigma_diag" in props:
            sd = _vec_items(props.pop("sigma_diag"))
            props["sigma_diag"] = mp.Vector3(*sd)
        return mp.MultilevelAtom(**props)
    reg("multilevel-atom", _multilevel_build)

    def _transition_build(props, state):
        props = dict(props)
        if "sigma" in props:     # (sigma s) == sigma-diag s s s
            s = props.pop("sigma")
            props["sigma_diag"] = mp.Vector3(s, s, s)
        return mp.Transition(**props)
    reg("transition", _transition_build)
    reg("lattice", _lattice_build)
    reg("pml", _pml_build(mp.PML))
    reg("absorber", _pml_build(mp.Absorber))
    reg("source", _source_build)
    reg("eigenmode-source", lambda props, state: mp.EigenModeSource(
        **{**props, "eig_parity": _reduce_parity(props.get("eig_parity"))}))
    reg("custom-src", _custom_src_build)
    reg("volume", _volume_build)
    reg("volume-class", _volume_build)
    return T


def _cook_prop(name: str, args: List[Any]) -> Any:
    """Evaluate property args into a python value.

    Multi-arg vector properties become Vector3 (libctl ctl-io semantics:
    `(center 1 2)` == `(center (vector3 1 2))`)."""
    if name.lower() in ("e_susceptibilities", "h_susceptibilities",
                        "transitions", "initial_populations", "vertices"):
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            return list(args[0])
        return list(args)
    if len(args) == 1:
        val = args[0]
        if name in _VEC_PROPS and isinstance(val, (int, float)) \
                and name not in ("radius",):
            return _v3(val, val, val) if name.endswith("diag") else _v3(val)
        if name in _VEC_PROPS and isinstance(val, (list, tuple)):
            return _v3(*val)
        return val
    if all(isinstance(a, (int, float)) for a in args):
        return _v3(*args)
    return list(args)


def make_special_form(state: "CtlState"):
    """(make <class> (prop v ...) ...) special form (libctl `make`)."""
    def make_sf(args, env):
        head = args[0]
        cls = eval_sexp(head, env) if not (
            isinstance(head, Symbol) and str(head) in state.classes) \
            else state.classes[str(head)]
        if isinstance(cls, str):
            cls = state.classes[cls]
        if not isinstance(cls, CtlClass):
            raise SchemeError(f"make: not a class: {head}")
        props: Dict[str, Any] = {}
        for form in args[1:]:
            if not isinstance(form, list) or not form:
                raise SchemeError("make: expected (property value...)")
            pname = _prop_name(form[0])
            # (sigma x) on susceptibilities = (sigma-diag x x x)
            vals = [eval_sexp(a, env) for a in form[1:]]
            props[pname] = _cook_prop(pname, vals)
        return cls.make(props, state)
    return make_sf


# ---------------------------------------------------------------------------
# ctl state: input variables + the lazily-built Simulation


_INPUT_VAR_DEFAULTS = {
    # kebab-case script names (meep.scm.in define-input-var / define-param)
    "geometry-lattice": None,     # filled in install()
    "geometry": [],
    "sources": [],
    "pml-layers": [],
    "symmetries": [],
    "resolution": 10,
    "k-point": False,
    "default-material": None,
    "dimensions": 3,
    "m": 0,
    "Courant": 0.5,
    "force-complex-fields?": False,
    "eps-averaging?": True,
    "ensure-periodicity": True,
    "extra-materials": [],
    "epsilon-input-file": "",
    "filename-prefix": False,
    "geometry-center": None,
    "subpixel-tol": 1e-4,
    "subpixel-maxeval": 100000,
    "progress-interval": 4,
    "output-single-precision?": False,
    "special-kz?": False,
    "accurate-fields-near-cylorigin?": False,
    "interactive?": False,
    "print-ok?": True,
}


class CtlState:
    """Owns the Scheme globals and the Simulation they describe.

    The reference keeps `structure`/`fields` globals built on first use by
    (init-fields) (meep.scm.in:300-420); here the analog is a Simulation
    instance built lazily from the input variables.
    """

    def __init__(self, env: Environment):
        self.env = env
        self.classes = make_class_table()
        self.sim: Optional[mp.Simulation] = None
        self.harminv_collectors: List[mp.Harminv] = []
        self.run_index = 0

    # -- input variable access ------------------------------------------
    def var(self, name: str):
        return self.env.get(name, _INPUT_VAR_DEFAULTS.get(name))

    def _cell_size(self):
        lat = self.var("geometry-lattice")
        sz = getattr(lat, "size", mp.Vector3(1, 1, 1))
        def clean(c):
            return 0.0 if (c == NO_SIZE or abs(c) < 1e-19) else (
                0.0 if c >= INFINITY else c)
        return mp.Vector3(*[clean(c) for c in _vec_items(sz)])

    def build_sim(self) -> mp.Simulation:
        k = self.var("k-point")
        k = None if k is False else k
        dims = self.var("dimensions")
        default_mat = self.var("default-material")
        material_function = None
        if callable(default_mat) and getattr(
                default_mat, "ctl_material_function", False):
            material_function, default_mat = default_mat, None
        kwargs = dict(
            cell_size=self._cell_size(),
            resolution=self.var("resolution"),
            geometry=list(self.var("geometry")),
            sources=list(self.var("sources")),
            boundary_layers=list(self.var("pml-layers")),
            symmetries=list(self.var("symmetries")),
            default_material=default_mat,
            material_function=material_function,
            k_point=k,
            Courant=self.var("Courant"),
            m=self.var("m"),
            force_complex_fields=bool(self.var("force-complex-fields?")),
            eps_averaging=bool(self.var("eps-averaging?")),
            extra_materials=list(self.var("extra-materials")),
        )
        if dims == mp.CYLINDRICAL or dims == -2:
            kwargs["dimensions"] = mp.CYLINDRICAL
        elif dims in (1, 2):
            # dims == 3 (the ctl default) defers to no-size inference,
            # matching the reference's infer-dimensions (meep.scm.in:270)
            kwargs["dimensions"] = int(dims)
        eif = self.var("epsilon-input-file")
        if eif:
            kwargs["epsilon_input_file"] = eif
        gc = self.var("geometry-center")
        if gc is not None:
            kwargs["geometry_center"] = gc
        return mp.Simulation(**kwargs)

    def get_sim(self) -> mp.Simulation:
        if self.sim is None:
            self.sim = self.build_sim()
        return self.sim

    def reset(self):
        self.sim = None
        self.harminv_collectors = []


# ---------------------------------------------------------------------------
# step functions / run functions


def _wrap_step(fn):
    """Scheme step procedures take no args (or 'step/'finish); python step
    functions take (sim).  Bridge the former onto the latter."""
    if isinstance(fn, Procedure):
        if len(fn.params) >= 1 and fn.rest is None:
            return lambda sim, _f=fn: apply_proc(_f, [Symbol("step")])
        return lambda sim, _f=fn: apply_proc(_f, [])
    return fn


def _wrap_cond(fn):
    """A Scheme boolean thunk as a python stop-condition callable(sim)."""
    def cond(sim, _f=fn):
        return apply_proc(_f, []) is not False
    return cond


def _wrap_steps(fns):
    return [_wrap_step(f) for f in fns]


def install(env: Environment, state: CtlState) -> None:
    """Bind the full ctl surface into `env`."""

    E = env

    def defvar(name, val):
        E[name] = val

    for name, default in _INPUT_VAR_DEFAULTS.items():
        defvar(name, default)
    E["fields"] = []                 # '() until (init-fields)
    E["structure"] = []
    E["geometry-lattice"] = mp.Lattice(size=mp.Vector3(1, 1, 1))
    E["default-material"] = mp.Medium(epsilon=1.0)

    # classes are first-class values so (make (if ...) ...) and aliases work
    for cname, cobj in state.classes.items():
        defvar(cname, cobj)

    # -- constants ------------------------------------------------------
    consts = {
        "no-size": NO_SIZE, "infinity": INFINITY, "CYLINDRICAL":
        mp.CYLINDRICAL, "AUTOMATIC": -1, "NO-DIRECTION": None,
        "ALL": mp.ALL,
        # libctl geom: prism center derived from its vertices
        "auto-center": None,
        "X": mp.X, "Y": mp.Y, "Z": mp.Z, "R": mp.R, "P": "p",
        "Low": mp.Low, "High": mp.High,
        "ODD-Z": Parity("tm"), "EVEN-Z": Parity("te"),
        "ODD-Y": Parity("odd-y"), "EVEN-Y": Parity("even-y"),
        "TE": Parity("te"), "TM": Parity("tm"), "NO-PARITY": None,
        "air": mp.air, "vacuum": mp.vacuum,
        # material VALUES (meep.scm.in: metal as epsilon -> -infinity)
        "metal": mp.Medium(epsilon=-INFINITY),
        "perfect-electric-conductor": mp.Medium(epsilon=-INFINITY),
        "perfect-magnetic-conductor": mp.Medium(mu=-INFINITY),
    }
    for comp in ("Ex", "Ey", "Ez", "Er", "Ep", "Hx", "Hy", "Hz", "Hr",
                 "Hp", "Dx", "Dy", "Dz", "Bx", "By", "Bz"):
        consts[comp] = getattr(mp, comp)
    consts["Dielectric"] = "dielectric"
    E.update(consts)

    # fitted materials library (reference scheme/materials.scm surface:
    # `(material Ag)` etc.); same media as python meep.materials
    import meep_nl_tpu.materials as _mats
    for name in dir(_mats):
        obj = getattr(_mats, name)
        if not name.startswith("_") and isinstance(obj, mp.Medium):
            E.setdefault(name, obj)

    # -- vector3 / matrix3x3 --------------------------------------------
    E.update({
        "vector3": _v3,
        "vector3+": _v3_add, "vector3-": _v3_sub,
        "vector3*": _v3_mul, "vector3-scale": _v3_scale,
        "vector3-dot": _v3_dot, "vector3-cross": _v3_cross,
        "vector3-norm": _v3_norm, "vector3-close?": _v3_close,
        "unit-vector3": _unit_v3, "rotate-vector3": _rotate_v3,
        "vector3-x": lambda v: v.x if isinstance(v, mp.Vector3) else v[0],
        "vector3-y": lambda v: v.y if isinstance(v, mp.Vector3) else v[1],
        "vector3-z": lambda v: v.z if isinstance(v, mp.Vector3) else v[2],
        "vector3?": lambda v: isinstance(v, mp.Vector3),
        "matrix3x3": _m33, "matrix3x3*": _m33_mul,
        "matrix3x3-transpose": lambda m: _m33_from_np(_m33_np(m).T),
        "matrix3x3-inverse": lambda m: _m33_from_np(
            np.linalg.inv(_m33_np(m))),
        "matrix3x3-determinant": lambda m: np.linalg.det(_m33_np(m)),
        "rotation-matrix3x3": lambda axis, th: _m33_from_np(
            np.array([_vec_items(_rotate_v3(axis, th, mp.Vector3(
                *(1.0 * (np.arange(3) == i))))) for i in range(3)]).T),
        "deg->rad": math.radians, "rad->deg": math.degrees,
        "sqr": lambda x: x * x,
        "random": lambda *a: (_random.uniform(a[0], a[1]) if len(a) == 2
                              else _random.random() * (a[0] if a else 1.0)),
        "interpolate": mp.interpolate,
    })

    # -- `make` ----------------------------------------------------------
    env["__special_forms__"]["make"] = make_special_form(state)

    # -- volume as a special form: (volume (center ...) (size ...)) ------
    def volume_sf(args, env2):
        props = {}
        for form in args:
            pname = _prop_name(form[0])
            vals = [eval_sexp(a, env2) for a in form[1:]]
            props[pname] = _cook_prop(pname, vals)
        return _volume_build(props, state)
    env["__special_forms__"]["volume"] = volume_sf

    # -- sim-touching functions ------------------------------------------
    def init_fields():
        state.get_sim().init_sim()
        E["fields"] = state          # non-null token: (null? fields) -> #f
        E["structure"] = state

    def reset_meep():
        state.reset()

    def restart_fields():
        # rebuild from the current input variables (reference zeroes fields
        # and resets t; our sims are cheap immutable builds, so a fresh
        # Simulation is the equivalent: meep.scm.in:518-523)
        state.sim = None
        state.get_sim()

    def change_k_point(k):
        E["k-point"] = k
        if state.sim is not None:
            state.sim = None   # rebuilt with new Bloch phase on next use

    def change_sources(new_sources):
        E["sources"] = list(new_sources)
        state.sim = None

    def meep_time():
        return state.get_sim().meep_time()

    def _include(path):
        import os as _os
        base = E.get("__ctl_dir__", ".")
        full = path if _os.path.isabs(path) else _os.path.join(base, path)
        with open(full) as f:
            text = f.read()
        from .interp import eval_program as _ep
        return _ep(text, E)

    E.update({
        "include": _include,
        "load": _include,
        "load-from-path": _include,
        "init-fields": init_fields,
        "init-structure": lambda *a: init_fields(),
        "reset-meep": reset_meep,
        "restart-fields": restart_fields,
        "change-k-point!": change_k_point,
        "change-sources!": change_sources,
        "meep-time": meep_time,
        "meep-round-time": meep_time,
        "meep-my-rank": lambda: 0,
        "meep-count-processors": mp.count_processors,
        "meep-all-wait": lambda: None,
        "meep-wall-time": __import__("time").time,
        "verbosity": lambda v=1: mp.verbosity(int(v)),
        "quiet": lambda q=True: mp.verbosity(0 if q is not False else 1),
    })

    # -- step-function combinators ---------------------------------------
    E.update({
        "at-beginning": lambda *f: mp.at_beginning(*_wrap_steps(f)),
        "at-end": lambda *f: mp.at_end(*_wrap_steps(f)),
        "at-every": lambda dt, *f: mp.at_every(dt, *_wrap_steps(f)),
        "at-time": lambda t, *f: mp.at_time(t, *_wrap_steps(f)),
        "after-time": lambda t, *f: mp.after_time(t, *_wrap_steps(f)),
        "before-time": lambda t, *f: mp.before_time(t, *_wrap_steps(f)),
        "after-sources": lambda *f: mp.after_sources(*_wrap_steps(f)),
        "after-sources+": lambda t, *f: mp.after_sources_and_time(
            t, *_wrap_steps(f)),
        "during-sources": lambda *f: mp.during_sources(*_wrap_steps(f)),
        "in-volume": lambda v, *f: _in_region(mp.in_volume, v, f),
        "in-point": lambda p, *f: _in_region(mp.in_point, p, f),
        "synchronized-magnetic": lambda *f: mp.synchronized_magnetic(
            *_wrap_steps(f)),
        "when-true": lambda c, *f: mp.when_true(_wrap_cond(c),
                                                *_wrap_steps(f)),
        "when-false": lambda c, *f: mp.when_false(_wrap_cond(c),
                                                  *_wrap_steps(f)),
        "combine-step-funcs": lambda *f: mp.combine_step_funcs(
            *_wrap_steps(f)),
        "display-progress": lambda *a: (lambda sim: None),
        "stop-when-fields-decayed": lambda dt, c, pt, decay:
            mp.stop_when_fields_decayed(dt, c, pt, decay),
        "stop-when-energy-decayed": lambda dt, decay:
            mp.stop_when_energy_decayed(dt, decay),
        "stop-after-walltime": mp.stop_after_walltime,
    })
    for name in ("output-epsilon", "output-mu", "output-dpwr", "output-hpwr",
                 "output-tot-pwr", "output-poynting", "output-png"):
        E[name] = getattr(mp, name.replace("-", "_"))
    for f in ("efield", "hfield", "dfield", "bfield", "sfield", "poynting"):
        for c in ("x", "y", "z", "r", "p"):
            E[f"output-{f}-{c}"] = getattr(mp, f"output_{f}_{c}")
        whole = getattr(mp, f"output_{f}", None)
        if whole is not None:
            E[f"output-{f}"] = whole
    E["output-png+h5"] = mp.output_png

    def to_appended(fname, *fns):
        # reference appends successive outputs along a new dim into one h5
        # (meep.scm.in:1058); our h5 writers timestamp per call, so pass
        # the wrapped step functions (and combinator tuples like at-end)
        # through to run's own parser — the files land beside the
        # reference's layout.
        return list(_wrap_steps(fns))
    E["to-appended"] = to_appended

    def _in_region(region_fn, where, fns):
        """(in-volume v ...) distributes over nested combinators: ctl
        composes (in-volume v (at-end output-...)) freely
        (meep.scm.in in-volume wraps the eval-step-func protocol)."""
        out = []
        for f in _wrap_steps(fns):
            if isinstance(f, tuple) and f:
                tag = f[0]
                if tag == "at_every":
                    out.append((tag, f[1], tuple(
                        _unwrap1(region_fn, where, g) for g in f[2])))
                elif isinstance(f[-1], (tuple, list)):
                    out.append(tuple(list(f[:-1]) + [tuple(
                        _unwrap1(region_fn, where, g) for g in f[-1])]))
                else:
                    out.append(f)
            else:
                out.append(_unwrap1(region_fn, where, f))
        return out

    def _unwrap1(region_fn, where, g):
        # region_fn returns ("at_every", 0.0, (wrapped,)) for one fn —
        # extract the wrapped callable so it nests inside any combinator
        res = region_fn(where, g)
        if isinstance(res, tuple) and res[0] == "at_every":
            return res[2][0]
        return res

    def _flatten_steps(fns):
        out = []
        for f in fns:
            if isinstance(f, list):
                out.extend(_flatten_steps(f))
            else:
                out.append(f)
        return out

    def output_real_field_function(name, cs, func, *h5):
        """Pointwise function of field components, written as one dataset
        (reference meep.scm.in:981 via fields::output_hdf5(field_function))."""
        f = (lambda *vals: apply_proc(func, list(vals))) \
            if isinstance(func, Procedure) else func

        def step(sim):
            arrs = [np.asarray(sim.get_array(component=c)) for c in cs]
            out = np.vectorize(lambda *v: float(np.real(f(*v))))(*arrs)
            _write_h5(_fname(name), {name: out})
        return step
    E["output-real-field-function"] = output_real_field_function
    E["output-field-function"] = output_real_field_function

    # -- harminv ----------------------------------------------------------
    def harminv_step(c, pt, fcen, df, *mxbands):
        h = mp.Harminv(c, pt, fcen, df,
                       mxbands[0] if mxbands else None)
        state.harminv_collectors.append(h)
        return h

    def _publish_harminv():
        bands = []
        for h in state.harminv_collectors:
            for m_ in h.modes:
                # meep band convention: complex frequency f - i*gamma with
                # gamma = decay/(2 pi), so Q = f/(2 gamma) = pi f / decay
                # (= Mode.Q; meep.scm.in:1129 harminv-freq-im)
                gim = m_.decay / (2.0 * math.pi)
                b = [complex(m_.freq, -gim), m_.amplitude, m_.err]
                bands.append(b)
                _print_run_data("harminv", [
                    m_.freq, -gim, m_.Q, abs(m_.amplitude),
                    m_.amplitude, m_.err])
        E["harminv-results"] = bands
        state.harminv_collectors = []
        return bands

    E.update({
        "harminv": harminv_step,
        "harminv-results": [],
        "harminv-freq": lambda b: b[0],
        "harminv-freq-re": lambda b: b[0].real,
        "harminv-freq-im": lambda b: b[0].imag,
        "harminv-Q": lambda b: b[0].real / (-2 * b[0].imag)
        if b[0].imag else float("inf"),
        "harminv-amp": lambda b: b[1],
        "harminv-err": lambda b: b[2],
    })

    # -- run functions ----------------------------------------------------
    def _print_run_data(name, vals):
        cols = ", ".join(_fmt(v) for v in vals)
        print(f"{name}{state.run_index}:, {cols}")

    def _fmt(v):
        if isinstance(v, complex):
            return f"{v.real:+g}{v.imag:+g}i"
        if isinstance(v, float):
            return f"{v:g}"
        return str(v)

    def run_until(cond, *step_funcs):
        sim = state.get_sim()
        if isinstance(cond, Procedure):
            cond = _wrap_cond(cond)
        sim.run(*_wrap_steps(_flatten_steps(step_funcs)), until=cond)
        if state.harminv_collectors:
            _publish_harminv()
        print(f"run {state.run_index} finished at t = "
              f"{sim._t * sim.dt:g} ({sim._t} timesteps)")
        state.run_index += 1

    def run_sources_plus(cond, *step_funcs):
        sim = state.get_sim()
        if isinstance(cond, Procedure):
            cond = _wrap_cond(cond)
        sim.run(*_wrap_steps(_flatten_steps(step_funcs)),
                until_after_sources=cond)
        if state.harminv_collectors:
            _publish_harminv()
        print(f"run {state.run_index} finished at t = "
              f"{sim._t * sim.dt:g} ({sim._t} timesteps)")
        state.run_index += 1

    def run_sources(*step_funcs):
        run_sources_plus(0, *step_funcs)

    def run_k_point(T, k):
        """meep.scm.in run-k-point: harminv at each source point over the
        source bandwidth after sources turn off."""
        srcs = E.get("sources") or []
        if not srcs:
            raise SchemeError("run-k-point requires sources")
        fmins, fmaxs = [], []
        for s in srcs:
            st = s.src
            if isinstance(st, mp.GaussianSource):
                fw = st.fwidth or (1.0 / st.width if st.width else 0.0)
                fmins.append(st.frequency - fw / 2)
                fmaxs.append(st.frequency + fw / 2)
        if not fmins:
            raise SchemeError("run-k-point requires a gaussian-src source")
        fmin, fmax = max(0.0, min(fmins)), max(fmaxs)
        change_k_point(k)
        restart_fields()
        s0 = srcs[0]
        h = harminv_step(s0.component, s0.center,
                         0.5 * (fmin + fmax), fmax - fmin)
        sim = state.get_sim()
        sim.run(mp.after_sources(h), until_after_sources=T)
        bands = _publish_harminv()
        return [b[0] for b in bands]

    def run_k_points(T, k_points):
        all_freqs = []
        for ki, k in enumerate(k_points, start=1):
            freqs = run_k_point(T, k)
            kx, ky, kz = _vec_items(k)
            print("freqs:, " + ", ".join(
                [str(ki), f"{kx:g}", f"{ky:g}", f"{kz:g}"] +
                [f"{f.real:g}" for f in freqs]))
            print("freqs-im:, " + ", ".join(
                [str(ki), f"{kx:g}", f"{ky:g}", f"{kz:g}"] +
                [f"{f.imag:g}" for f in freqs]))
            all_freqs.append(freqs)
        return all_freqs

    E.update({
        "run-until": run_until,
        "run-sources+": run_sources_plus,
        "run-sources": run_sources,
        "run-k-point": run_k_point,
        "run-k-points": run_k_points,
    })

    # -- monitors ----------------------------------------------------------
    def add_flux(fcen, df, nfreq, *regions):
        return state.get_sim().add_flux(fcen, df, int(nfreq), *regions)

    def add_energy(fcen, df, nfreq, region):
        return state.get_sim().add_energy(fcen, df, int(nfreq), region)

    def add_force(fcen, df, nfreq, *regions):
        return state.get_sim().add_force(fcen, df, int(nfreq), *regions)

    def add_near2far(fcen, df, nfreq, *regions, **kw):
        return state.get_sim().add_near2far(fcen, df, int(nfreq),
                                            *regions, **kw)

    def add_dft_fields(cs, fcen, df, nfreq, *where, **kw):
        sim = state.get_sim()
        if where and isinstance(where[0], mp.Volume):
            kw.setdefault("center", where[0].center)
            kw.setdefault("size", where[0].size)
        return sim.add_dft_fields(list(cs), fcen, df, int(nfreq), **kw)

    def add_mode_monitor(fcen, df, nfreq, region):
        return state.get_sim().add_flux(fcen, df, int(nfreq), region)

    def display_fluxes(*fluxes):
        if not fluxes:
            return
        sim = state.get_sim()
        freqs = mp.get_flux_freqs(fluxes[0])
        datas = [sim.get_fluxes(f) for f in fluxes]
        for row in zip(freqs, *datas):
            _print_run_data("flux", list(row))

    def display_forces(*forces):
        if not forces:
            return
        sim = state.get_sim()
        freqs = mp.get_force_freqs(forces[0])
        datas = [sim.get_forces(f) for f in forces]
        for row in zip(freqs, *datas):
            _print_run_data("force", list(row))

    def get_farfield(n2f, pt):
        return list(state.get_sim().get_farfield(n2f, pt))

    def get_farfields(n2f, res, where=None, **kw):
        return state.get_sim().get_farfields(
            n2f, res, center=getattr(where, "center", kw.get("center")),
            size=getattr(where, "size", kw.get("size")))

    def _fname(base):
        pre = E.get("filename-prefix")
        base = f"{pre}-{base}" if pre else str(base)
        return base if base.endswith(".h5") else base + ".h5"

    def _write_h5(fname, datasets: Dict[str, Any]):
        import h5py
        with h5py.File(fname, "w") as f:
            for k, v in datasets.items():
                a = np.asarray(v)
                if np.iscomplexobj(a):
                    f.create_dataset(k + ".r", data=a.real)
                    f.create_dataset(k + ".i", data=a.imag)
                else:
                    f.create_dataset(k, data=a)

    def output_farfields(n2f, fname, where, res):
        arrs = get_farfields(n2f, res, where)
        if isinstance(arrs, dict):
            _write_h5(_fname(fname), arrs)
        else:
            _write_h5(_fname(fname), {"farfields": np.asarray(arrs)})

    def _output_dft(handle, fname):
        sim = state.get_sim()
        comps = getattr(handle, "components", None) or ["ex", "ey", "ez",
                                                        "hx", "hy", "hz"]
        out = {}
        for c in comps:
            try:
                out[c] = np.asarray(sim.get_dft_array(handle, c))
            except Exception:
                continue
        _write_h5(_fname(fname), out)

    def dft_ldos(fcen, df, nfreq):
        sim = state.get_sim()
        if not hasattr(sim, "add_ldos"):
            raise SchemeError("dft-ldos unavailable")
        ldos = sim.add_ldos(fcen, df, int(nfreq))
        def finisher(sim):
            data = sim.get_ldos(ldos)
            freqs = mp.get_ldos_freqs(ldos)
            for fq, v in zip(freqs, data):
                _print_run_data("ldos", [fq, v])
            E["dft-ldos-data"] = list(np.asarray(data))
        return mp.at_end(finisher)

    E.update({
        "add-flux": add_flux,
        "add-energy": add_energy,
        "add-force": add_force,
        "add-near2far": add_near2far,
        "add-dft-fields": add_dft_fields,
        "add-mode-monitor": add_mode_monitor,
        "get-fluxes": lambda f: list(state.get_sim().get_fluxes(f)),
        "get-flux-freqs": lambda f: list(mp.get_flux_freqs(f)),
        "get-forces": lambda f: list(state.get_sim().get_forces(f)),
        "get-force-freqs": lambda f: list(mp.get_force_freqs(f)),
        "get-energy-freqs": lambda f: list(mp.get_energy_freqs(f)),
        "get-electric-energy": lambda f: list(
            state.get_sim().get_electric_energy(f)),
        "get-magnetic-energy": lambda f: list(
            state.get_sim().get_magnetic_energy(f)),
        "get-total-energy": lambda f: list(
            state.get_sim().get_total_energy(f)),
        "get-near2far-freqs": lambda f: list(mp.get_near2far_freqs(f)),
        "get-ldos-freqs": lambda f: list(mp.get_ldos_freqs(f)),
        "display-fluxes": display_fluxes,
        "display-forces": display_forces,
        "save-flux": lambda fname, f: state.get_sim().save_flux(fname, f),
        "load-flux": lambda fname, f: state.get_sim().load_flux(fname, f),
        "load-minus-flux": lambda fname, f:
            state.get_sim().load_minus_flux(fname, f),
        "save-near2far": lambda fname, f:
            state.get_sim().save_near2far(fname, f),
        "load-near2far": lambda fname, f:
            state.get_sim().load_near2far(fname, f),
        "load-minus-near2far": lambda fname, f:
            state.get_sim().load_minus_near2far(fname, f),
        "scale-flux-fields": lambda s, f: mp.scale_flux_fields(s, f),
        "get-farfield": get_farfield,
        "get-farfields": get_farfields,
        "output-farfields": output_farfields,
        # (flux n2f direction where resolution): Poynting flux through a
        # far surface from the near2far transform (near2far.cpp:506)
        "flux": lambda n2f, d, where, res=1.0: list(np.atleast_1d(
            state.get_sim().near2far_flux(
                n2f, d, center=getattr(where, "center", None),
                size=getattr(where, "size", None), resolution=res))),
        "dft-ldos": dft_ldos,
        "flux-in-box": lambda d, *a: state.get_sim().flux_in_box(
            d, **_box_kw(a)),
        "electric-energy-in-box": lambda *a:
            state.get_sim().electric_energy_in_box(**_box_kw(a)),
        "field-energy-in-box": lambda *a:
            state.get_sim().field_energy_in_box(**_box_kw(a)),
        "magnetic-energy-in-box": lambda *a:
            state.get_sim().magnetic_energy_in_box(**_box_kw(a))
            if hasattr(mp.Simulation, "magnetic_energy_in_box")
            else state.get_sim().field_energy_in_box(**_box_kw(a)),
    })

    def _box_kw(args):
        if len(args) == 1 and isinstance(args[0], mp.Volume):
            return {"center": args[0].center, "size": args[0].size}
        if len(args) == 2:
            return {"center": args[0], "size": args[1]}
        return {}

    # -- field queries ------------------------------------------------------
    def get_field_point(c, pt):
        return state.get_sim().get_field_point(c, pt)

    def get_epsilon_point(pt):
        sim = state.get_sim()
        eps = np.asarray(sim.get_epsilon())
        gv = sim.gv
        # nearest grid sample of the scalar permittivity map
        coords = _vec_items(pt)
        axes = [coords[i] for i in range(3)]
        idx = []
        arr_axes = getattr(gv, "axes", None)
        res = sim.resolution
        cs = _vec_items(sim.cell_size)
        shape = eps.shape
        live = [i for i, c in enumerate(cs) if c > 0][:eps.ndim]
        if len(live) < eps.ndim:
            live = list(range(eps.ndim))
        for dim, n in zip(live, shape):
            x = axes[dim] + 0.5 * cs[dim]
            idx.append(int(np.clip(round(x * res), 0, n - 1)))
        return float(eps[tuple(idx)])

    def integrate_field_function(cs, func, *where):
        kw = _box_kw(where)
        f = (lambda *a: apply_proc(func, list(a))) \
            if isinstance(func, Procedure) else func
        return state.get_sim().integrate_field_function(list(cs), f, **kw)

    def get_eigenmode_coefficients(flux, bands, **kw):
        """ctl surface returns (list coeffs vgrp kpoints kdom)
        (meep.scm.in:1206-1226); coeffs indexed [band][freq][fwd/back]
        via array-ref."""
        sim = state.get_sim()
        py_kw = {}
        par = _reduce_parity(kw.get("eig_parity"))
        if par is not None:
            py_kw["eig_parity"] = par
        if isinstance(kw.get("direction"), str):
            py_kw["direction_normal"] = kw["direction"]
        alpha = np.asarray(
            sim.get_eigenmode_coefficients(flux, list(bands), **py_kw))
        vgrp = np.zeros(alpha.shape[:2])
        return [alpha, vgrp, [], []]

    def solve_cw(*args):
        # (meep-fields-solve-cw fields tol maxiters L) SWIG spelling or
        # bare (solve-cw tol maxiters L)
        if args and not isinstance(args[0], (int, float)):
            args = args[1:]
        tol = args[0] if len(args) > 0 else 1e-8
        maxiters = args[1] if len(args) > 1 else 10000
        return state.get_sim().solve_cw(tol=tol, maxiters=int(maxiters))

    def initialize_field(*args):
        # (initialize-field c func) or the SWIG spelling
        # (meep-fields-initialize-field fields c func)
        if len(args) == 3:
            args = args[1:]
        c, func = args
        f = (lambda p: apply_proc(func, [_v3(p.x, p.y, p.z)])) \
            if isinstance(func, Procedure) else func
        return state.get_sim().initialize_field(c, f)

    E.update({
        "get-field-point": get_field_point,
        "get-epsilon-point": get_epsilon_point,
        "integrate-field-function": integrate_field_function,
        "get-eigenmode-coefficients": get_eigenmode_coefficients,
        "meep-fields-solve-cw": solve_cw,
        "solve-cw": solve_cw,
        "meep-fields-initialize-field": initialize_field,
        "initialize-field": initialize_field,
        "output-dft": lambda h, fname: _output_dft(h, fname),
        "get-dft-array": lambda h, c, nf=0:
            np.asarray(state.get_sim().get_dft_array(h, c, int(nf))),
        "get-array": lambda **kw: np.asarray(state.get_sim().get_array(**kw)),
        "array-ref": lambda a, *ix: _array_ref(a, ix),
        "compute-group-velocity-component": lambda *a: None,
        "geometric-object-duplicates": mp.geometric_object_duplicates,
        "geometric-objects-duplicates": mp.geometric_objects_duplicates,
        "geometric-objects-lattice-duplicates":
            mp.geometric_objects_lattice_duplicates,
    })

    def _array_ref(a, ix):
        out = np.asarray(a)[tuple(int(i) for i in ix)]
        if np.ndim(out) == 0:
            val = out.item()
            return val
        return out


def make_ctl_env(params: Optional[Dict[str, Any]] = None):
    """Build a ready-to-run ctl environment; returns (env, state)."""
    env = standard_env()
    state = CtlState(env)
    install(env, state)
    if params:
        env["__ctl_params__"].update(params)
    return env, state
