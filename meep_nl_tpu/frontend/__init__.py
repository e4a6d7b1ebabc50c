"""ctl (libctl/Scheme) frontend for meep_nl_tpu.

The reference ships a guile-based Scheme frontend (reference scheme/meep.scm.in
+ scheme/meep.i SWIG layer) whose scripts look like:

    (set! geometry-lattice (make lattice (size 16 8 no-size)))
    (set! geometry (list (make block (center 0 0) (size infinity 1 infinity)
                           (material (make dielectric (epsilon 12))))))
    (set! sources (list (make source (src (make continuous-src (frequency 0.15)))
                          (component Ez) (center -7 0))))
    (set! pml-layers (list (make pml (thickness 1.0))))
    (set! resolution 10)
    (run-until 200 (at-beginning output-epsilon)
                   (at-every 0.6 output-efield-z))

This package re-creates that surface as a self-hosted Scheme subset
(`sexp.py` reader + `interp.py` tail-call evaluator) bound onto the
package's JAX Simulation API (`bindings.py`), so reference .ctl scripts run
unmodified:

    python -m meep_nl_tpu.frontend script.ctl [param=value ...]
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from .bindings import CtlState, make_ctl_env
from .interp import Environment, SchemeError, eval_program, eval_sexp
from .sexp import SexpError, parse_all, parse_one


def run_ctl_string(text: str, params: Optional[Dict[str, Any]] = None):
    """Run a ctl program from a string; returns (env, state) for
    inspection (monitor handles, harminv-results, the built Simulation)."""
    env, state = make_ctl_env(params)
    eval_program(text, env)
    return env, state


def run_ctl_file(path: str, params: Optional[Dict[str, Any]] = None):
    import os

    with open(path) as f:
        text = f.read()
    env, state = make_ctl_env(params)
    env["__ctl_dir__"] = os.path.dirname(os.path.abspath(path))
    eval_program(text, env)
    return env, state


__all__ = ["run_ctl_string", "run_ctl_file", "make_ctl_env", "CtlState",
           "Environment", "SchemeError", "SexpError", "eval_program",
           "eval_sexp", "parse_all", "parse_one"]
