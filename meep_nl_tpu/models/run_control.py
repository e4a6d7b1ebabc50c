"""Run-control DSL: step-function combinators and stop conditions
(analog of python/simulation.py:4991-5445).

TPU adaptation: python callbacks cannot run inside the compiled scan, so the
runner splits the time loop into jitted blocks and invokes callbacks at block
boundaries (every `dt` time units); Harminv-style collectors instead ride the
scan as probe outputs (stepper.step ProbeSpec) and never leave the device
mid-run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class StepFuncs:
    """Parsed step functions for one run() invocation."""
    every: List          # (interval_time, fn)
    begin: List
    end: List
    after_sources_fns: List
    collectors: List     # Harminv-likes: (obj, only_after_sources)


def at_every(dt: float, *fns):
    """Apply fns every dt time units (simulation.py at_every)."""
    return ("at_every", dt, fns)


def at_beginning(*fns):
    return ("at_beginning", fns)


def at_end(*fns):
    return ("at_end", fns)


def after_sources_marker(fns):
    return ("after_sources", fns)


def during_sources(*fns):
    return ("during_sources", fns)


def in_volume(volume, *fns):
    """Restrict output functions to a volume (wraps fn with a region)."""
    def wrap(fn):
        def inner(sim):
            return fn(sim, volume=volume)
        return inner
    return ("at_every", 0.0, tuple(wrap(f) for f in fns))


@dataclasses.dataclass
class stop_when_fields_decayed:
    """Stop condition: |component|^2 at pt decayed by decay_by from its peak
    (simulation.py:5225).  Matching the reference, the decision uses the MAX
    of |f|^2 over each dt window — never a single instantaneous sample, which
    could land on a zero crossing of the oscillating field and terminate the
    run prematurely.  The runner rides an in-scan probe at pt so every
    timestep inside the window is sampled (the reference samples every step
    via its per-step closure)."""
    dt: float
    c: str
    pt: Any
    decay_by: float = 1e-3
    _peak: float = 0.0

    def check_window(self, window_max_abs: float) -> bool:
        """Decide from the max |f| over the past dt window (probe-fed)."""
        cur = float(window_max_abs) ** 2
        self._peak = max(self._peak, cur)
        return self._peak > 0 and cur <= self.decay_by * self._peak

    def check(self, sim) -> bool:
        # fallback (no probe available): instantaneous sample
        return self.check_window(abs(sim.get_field_point(self.c, self.pt)))


@dataclasses.dataclass
class stop_when_dft_decayed:
    """Stop when all DFT accumulators stop changing relative to their norms
    (simulation.py:5357)."""
    tol: float = 1e-6
    minimum_run_time: float = 0.0
    maximum_run_time: float = 1e20
    dt: float = 4.0
    _prev: Optional[dict] = None

    def check(self, sim) -> bool:
        import jax
        cur = {k: np.asarray(jax.device_get(v))
               for k, v in sim.fields_state["dft"].items()}
        if sim.meep_time() < self.minimum_run_time:
            self._prev = cur
            return False
        if sim.meep_time() >= self.maximum_run_time:
            return True
        if self._prev is None:
            self._prev = cur
            return False
        ok = True
        for k, v in cur.items():
            dv = np.abs(v - self._prev[k]).max()
            norm = np.abs(v).max() or 1.0
            if dv > self.tol * norm:
                ok = False
        self._prev = cur
        return ok


# ---------------------------------------------------------------------------
# output step functions (simulation.py:5509 output_* family)
# ---------------------------------------------------------------------------


def output_field(component: str, fname_prefix: str = "field"):
    """Save the component array to an .npy per invocation."""
    counter = {"n": 0}

    def fn(sim, volume=None):
        arr = np.asarray(sim.get_array(component=component))
        np.save(f"{fname_prefix}-{component}-{counter['n']:06d}.npy", arr)
        counter["n"] += 1

    return fn


def output_efield_z(sim, volume=None):
    np.save(f"ez-{int(sim.meep_time() * 1000):08d}.npy",
            np.asarray(sim.get_array(component="ez")))


def output_epsilon(sim, volume=None):
    np.save("epsilon.npy", np.asarray(sim.get_epsilon()))


class FieldProbe:
    """In-scan point time-series sampler: records component `c` at `pt`
    every step at full scan speed (rides the same probe mechanism as
    Harminv; no per-step host sync).  After run(), `.data` holds the
    series and `.dt` the timestep."""

    def __init__(self, c, pt):
        self.c = c
        self.pt = pt
        self.data = np.zeros(0)
        self.dt = None

    def _collect(self, data, dt):
        self.data = np.concatenate([self.data, np.asarray(data)])
        self.dt = dt

    def _analyze(self):
        pass


class WeightedProbe(FieldProbe):
    """In-scan weighted-sum sampler: records sum_i w_i f_c(site_i) every
    step (the per-step surface integral of the Casimir stress-tensor
    method, casimir.cpp stress_chunkloop).  `indices` is an (npts, ndim)
    int array of component-grid indices, `weights` the matching reals."""

    def __init__(self, c, indices, weights):
        super().__init__(c, None)
        self.indices = np.asarray(indices, np.int32)
        self.weights = np.asarray(weights)


def _is_collector(x) -> bool:
    return hasattr(x, "_collect") and hasattr(x, "c") and hasattr(x, "pt")


def parse_step_funcs(step_funcs) -> StepFuncs:
    out = StepFuncs([], [], [], [], [])
    for sf in step_funcs:
        if _is_collector(sf):
            out.collectors.append((sf, False))
        elif isinstance(sf, tuple) and sf:
            tag = sf[0]
            if tag == "after_sources":
                for fn in sf[1]:
                    if _is_collector(fn):
                        out.collectors.append((fn, True))
                    else:
                        out.after_sources_fns.append(fn)
            elif tag == "at_every":
                for fn in sf[2]:
                    out.every.append((sf[1], fn))
            elif tag == "at_beginning":
                out.begin.extend(sf[1])
            elif tag == "at_end":
                out.end.extend(sf[1])
            elif tag == "during_sources":
                for fn in sf[1]:
                    out.every.append((0.0, _only_during_sources(fn)))
        elif callable(sf):
            out.every.append((0.0, sf))
    return out


def _only_during_sources(fn):
    def inner(sim):
        last = max((s.src.last_time() for s in sim.sources), default=0.0)
        if sim.meep_time() <= last:
            fn(sim)
    return inner
