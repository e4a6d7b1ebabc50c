"""Reference adjoint-package API surface (python/adjoint/objective.py,
utils.py, wrapper.py, optimization_problem.py:572, filter_source.py):
class-style ObjectiveQuantity wrappers over this framework's functional
objectives, the monitor plumbing helpers, the JAX wrapper, and the
Nuttall-basis FilteredSource."""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.source import CustomSource


def atleast_3d(*arys):
    """numpy atleast_3d with meep's convention: 1d data stays on the
    FIRST axis (optimization_problem.py:572)."""
    res = []
    for ary in arys:
        ary = np.asanyarray(ary)
        if ary.ndim == 0:
            result = ary.reshape(1, 1, 1)
        elif ary.ndim == 1:
            result = ary[:, np.newaxis, np.newaxis]
        elif ary.ndim == 2:
            result = ary[:, :, np.newaxis]
        else:
            result = ary
        res.append(result)
    return res[0] if len(res) == 1 else res


# ---------------------------------------------------------------------------
# ObjectiveQuantity classes (objective.py:21-619)
# ---------------------------------------------------------------------------


class ObjectiveQuantity:
    """Base class (objective.py:21): a monitor-backed quantity that an
    objective function consumes.  register_monitors(frequencies) adds
    the monitor to the simulation (call BEFORE the first run);
    make_fn() returns the differentiable function of the DTFT dict;
    __call__ returns the last evaluated value."""

    def __init__(self, sim):
        self.sim = sim
        self._handle = None
        self._eval = None

    @property
    def frequencies(self):
        return None if self._handle is None else \
            np.asarray(self._handle.freqs)

    def register_monitors(self, frequencies):
        raise NotImplementedError

    def make_fn(self) -> Callable:
        raise NotImplementedError

    def __call__(self):
        if self._eval is None:
            fn = self.make_fn()
            from ..stepper.step import dft_view
            self._eval = np.asarray(fn({
                k: dft_view(v)
                for k, v in self.sim.fields_state["dft"].items()}))
        return self._eval

    def get_evaluation(self):
        """Last value (objective.py get_evaluation)."""
        return self()

    @staticmethod
    def _freq_triple(frequencies):
        freqs = np.atleast_1d(np.asarray(frequencies, float))
        fcen = 0.5 * (freqs[0] + freqs[-1])
        df = freqs[-1] - freqs[0]
        return fcen, df, len(freqs)


class EigenmodeCoefficient(ObjectiveQuantity):
    """Mode-amplitude objective (objective.py:157): the complex a+/a-
    coefficient of `mode` on a flux plane."""

    def __init__(self, sim, volume, mode: int = 1, forward: bool = True,
                 kpoint_func=None, decimation_factor=0, **kwargs):
        super().__init__(sim)
        self.volume = volume
        self.mode = int(mode)
        self.forward = bool(forward)
        self.decimation_factor = decimation_factor

    def register_monitors(self, frequencies):
        from ..models.geom import get_center_and_size
        from ..models.simulation import FluxRegion
        c, s = get_center_and_size(self.volume)
        fcen, df, nfreq = self._freq_triple(frequencies)
        self._handle = self.sim.add_mode_monitor(
            fcen, df, nfreq, FluxRegion(center=c, size=s),
            decimation_factor=self.decimation_factor)
        return self._handle

    def make_fn(self):
        from .objectives import eigenmode_coefficient
        return eigenmode_coefficient(self.sim, self._handle,
                                     band=self.mode,
                                     forward=self.forward)


class FourierFields(ObjectiveQuantity):
    """Raw DTFT fields of one component over a volume
    (objective.py:308)."""

    def __init__(self, sim, volume, component, yee_grid: bool = False,
                 decimation_factor=0):
        super().__init__(sim)
        self.volume = volume
        self.component = component
        self.decimation_factor = decimation_factor

    def register_monitors(self, frequencies):
        from ..models.geom import get_center_and_size
        c, s = get_center_and_size(self.volume)
        fcen, df, nfreq = self._freq_triple(frequencies)
        self._handle = self.sim.add_dft_fields(
            [self.component], fcen, df, nfreq, center=c, size=s,
            decimation_factor=self.decimation_factor)
        return self._handle

    def make_fn(self):
        from .objectives import fourier_fields
        return fourier_fields(self.sim, self._handle, self.component)


class Near2FarFields(ObjectiveQuantity):
    """Far fields at a list of points (objective.py:435)."""

    def __init__(self, sim, Near2FarRegions, far_pts,
                 decimation_factor=0, norm_near_fields=None):
        super().__init__(sim)
        self.regions = list(Near2FarRegions)
        self.far_pts = list(far_pts)
        self.decimation_factor = decimation_factor

    def register_monitors(self, frequencies):
        fcen, df, nfreq = self._freq_triple(frequencies)
        self._handle = self.sim.add_near2far(
            fcen, df, nfreq, *self.regions,
            decimation_factor=self.decimation_factor)
        return self._handle

    def make_fn(self):
        from .objectives import near2far_fields
        return near2far_fields(self.sim, self._handle, self.far_pts)


class LDOS(ObjectiveQuantity):
    """LDOS spectrum objective (objective.py:545)."""

    def __init__(self, sim, decimation_factor=0):
        super().__init__(sim)
        self.decimation_factor = decimation_factor

    def register_monitors(self, frequencies):
        fcen, df, nfreq = self._freq_triple(frequencies)
        self._handle = self.sim.add_ldos(
            fcen, df, nfreq, decimation_factor=self.decimation_factor)
        return self._handle

    def make_fn(self):
        from .objectives import ldos_objective
        return ldos_objective(self.sim, self._handle)


# ---------------------------------------------------------------------------
# utils.py plumbing (python/adjoint/utils.py)
# ---------------------------------------------------------------------------


def register_monitors(objective_quantities, frequencies):
    """Register every objective quantity's monitor (utils.py
    register_monitors)."""
    return [q.register_monitors(frequencies)
            for q in objective_quantities]


def install_design_region_monitors(simulation, design_regions,
                                   frequencies, decimation_factor=0):
    """dft_fields over each design region (utils.py:140) — the native
    jax.grad engine does not need them, but the handles let user code
    inspect the design-region DTFTs."""
    from ..models.geom import Vector3
    freqs = np.atleast_1d(np.asarray(frequencies, float))
    fcen = 0.5 * (freqs[0] + freqs[-1])
    df = freqs[-1] - freqs[0]
    out = []
    for dr in design_regions:
        if dr.volume is not None:
            from ..models.geom import get_center_and_size
            c, s = get_center_and_size(dr.volume)
        else:
            c = Vector3(*(list(dr.center) + [0.0] * (3 - len(dr.center))))
            s = Vector3(*(list(dr.size) + [0.0] * (3 - len(dr.size))))
        live = [cc for cc in ("ex", "ey", "ez")
                if cc in simulation.fields_state["f"]] \
            if simulation._state is not None else ["ez"]
        out.append(simulation.add_dft_fields(live, fcen, df, len(freqs),
                                             center=c, size=s))
    return out


def gather_monitor_values(objective_quantities):
    """Stack each quantity's evaluation (utils.py gather_monitor_values
    role)."""
    return [q() for q in objective_quantities]


def validate_and_update_design(design_regions, design_variables):
    """Clip-validate and write new weights into each design region's
    MaterialGrid (utils.py validate_and_update_design)."""
    for dr, x in zip(design_regions, design_variables):
        dr.update_design_parameters(np.asarray(x))


def calculate_vjps(simulation, design_regions, frequencies,
                   fwd_fields, adj_fields, design_variable_shapes,
                   sum_freq_partials=True):
    """The reference's per-design-voxel VJP assembly (utils.py:46 →
    meepgeom.cpp:2829) is not used by this framework: gradients come
    from jax.grad through the stepper or from the physical two-run
    engine (adjoint/tworun.py), both of which assemble the
    forward×adjoint pairing internally.  Provided for API parity; use
    OptimizationProblem instead."""
    raise NotImplementedError(
        "calculate_vjps: gradients are produced by OptimizationProblem "
        "(jax.grad or gradient_method='pair'); the manual VJP assembly "
        "path has no role in this framework")


def create_adjoint_sources(objective_quantities, objective_gradients):
    """Adjoint sources for a hand-driven two-run gradient: this
    framework derives them inside adjoint.tworun.TwoRunGradient (the
    monitor-sampling transpose); this helper exposes that engine's
    source builder shape for compatibility."""
    raise NotImplementedError(
        "create_adjoint_sources: use "
        "OptimizationProblem(gradient_method='pair'), which builds the "
        "transposed-sampling adjoint sources internally "
        "(adjoint/tworun.py)")


# ---------------------------------------------------------------------------
# wrapper.py (MeepJaxWrapper)
# ---------------------------------------------------------------------------


class MeepJaxWrapper:
    """Differentiable callable over design weights (wrapper.py:63
    MeepJaxWrapper): wraps a Simulation + monitors into
    rho -> monitor values with a JAX-registered gradient.  Here the
    whole simulation is already jax-differentiable, so this is a thin
    adapter over OptimizationProblem's machinery."""

    def __init__(self, simulation, sources, monitors, design_regions,
                 frequencies=None, until_after_sources=None, **kwargs):
        self.simulation = simulation
        self.monitors = list(monitors)
        self.design_regions = list(design_regions)
        if sources:
            simulation.sources = list(sources)
        for q in self.monitors:
            if isinstance(q, ObjectiveQuantity) and q._handle is None:
                if frequencies is None:
                    raise ValueError("frequencies= required to register "
                                     "objective monitors")
                q.register_monitors(frequencies)
        simulation.init_sim()
        self._plan = simulation.plan
        live_e = [s.ec for s in self._plan.eh_specs_e]
        for dr in self.design_regions:
            dr.bind(self._plan.gv, live_e)
        if until_after_sources is None:
            until_after_sources = 50.0
        last = max((s.src.last_time() for s in simulation.sources),
                   default=0.0)
        self._nsteps = int(round((last + float(until_after_sources))
                                 / self._plan.dt))
        fns = None

        def run(*rhos):
            from .optimization import run_differentiable
            from ..stepper.step import dft_view
            nonlocal fns
            coefs = self._plan.coefs
            for dr, rho in zip(self.design_regions, rhos):
                coefs = dr.apply(rho, coefs, self._plan)
            state = run_differentiable(self._plan, self._nsteps, coefs)
            dfts = {k: dft_view(v) for k, v in state["dft"].items()}
            if fns is None:
                fns = [q.make_fn() if isinstance(q, ObjectiveQuantity)
                       else q for q in self.monitors]
            return tuple(fn(dfts) for fn in fns)

        self._run = jax.jit(run)

    def __call__(self, *design_variables):
        return self._run(*[jnp.asarray(x) for x in design_variables])


# ---------------------------------------------------------------------------
# filter_source.py (FilteredSource)
# ---------------------------------------------------------------------------


def _nuttall(t, T):
    """Continuous Nuttall window on [0, T] (filter_source.py nuttall)."""
    a = (0.355768, -0.487396, 0.144232, -0.012604)
    u = np.clip(np.asarray(t, float) / T, 0.0, 1.0)
    return sum(ak * np.cos(2 * np.pi * k * u) for k, ak in enumerate(a))


class FilteredSource(CustomSource):
    """Broadband source whose DTFT matches a prescribed frequency
    response at the sample frequencies (filter_source.py:10): a basis of
    Nuttall-windowed tones at the objective frequencies is least-squares
    fitted so that DTFT[f](f_k) = time_src_dtft(f_k) * H(f_k) — the
    reference's single-run broadband adjoint source."""

    def __init__(self, center_frequency, frequencies, frequency_response,
                 dt, time_src=None):
        dt = dt / 2          # staggered E/H half-interval, as the reference
        freqs = np.atleast_1d(np.asarray(frequencies, float))
        H = np.atleast_1d(np.asarray(frequency_response, complex))
        if len(freqs) > 1:
            T = float(np.max(np.abs(1.0 / np.diff(freqs))))
        else:
            T = 1.0 / (abs(freqs[0]) * 0.05 + 1e-12)
        N = int(np.rint(T / dt))
        t = np.arange(N) * dt
        if time_src is not None:
            sig = np.array([time_src.current(ti, dt) for ti in t])
            sig_dtft = np.array([
                np.sum(sig * np.exp(1j * 2 * np.pi * f * t)) * dt
                / np.sqrt(2 * np.pi) for f in freqs])
            H = H * sig_dtft
        # basis: Nuttall window times each sample tone
        win = _nuttall(t, T)
        B = win[None, :] * np.exp(-1j * 2 * np.pi * freqs[:, None]
                                  * t[None, :])      # (nb, N)
        # DTFT of each basis function at each sample frequency
        A = (B @ np.exp(1j * 2 * np.pi
                        * np.outer(t, freqs))) * dt / np.sqrt(2 * np.pi)
        A = A.T                                       # (nfreq, nb)
        nodes, *_ = np.linalg.lstsq(A, H, rcond=None)
        self.nodes = nodes
        self.err = float(np.linalg.norm(A @ nodes - H))
        self.frequencies = freqs
        self.T = T

        def func(tt):
            if tt > T or tt < 0:
                return 0.0
            w = _nuttall(tt, T)
            return complex(np.sum(nodes * w * np.exp(
                -1j * 2 * np.pi * freqs * tt)))

        fw = (freqs[-1] - freqs[0]) + 4.0 / T
        super().__init__(func, start_time=0.0, end_time=T,
                         center_frequency=float(center_frequency),
                         fwidth=float(fw))

    def dtft(self, y, freqs):
        """DTFT of a sampled signal at `freqs` (filter_source.py
        dtft)."""
        t = np.arange(len(np.asarray(y))) * self.T / max(len(y), 1)
        dt = t[1] - t[0] if len(t) > 1 else 1.0
        return np.array([np.sum(np.asarray(y)
                                * np.exp(1j * 2 * np.pi * f * t)) * dt
                         / np.sqrt(2 * np.pi) for f in freqs])
