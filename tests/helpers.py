"""Shared test helpers."""

import numpy as np

from meep_nl_tpu.stepper.plan import MaterialSpec, SrcVolSpec


def vacuum_mat():
    return MaterialSpec(chi1inv={})


def make_point_source(gv, comp, pt, src, amplitude=1.0, is_integrated=False):
    pts = gv.interp_weights(comp, pt)
    idx = np.array([p for p, w in pts], dtype=np.int32)
    amps = np.array([w * amplitude for p, w in pts], dtype=np.complex128)
    amps *= gv.resolution ** gv.ndim  # delta-function restriction weight
    return SrcVolSpec(comp, idx, amps, src, is_integrated=is_integrated)


def total_field_energy(state, live):
    return sum(float(np.sum(np.abs(np.asarray(state["f"][c])) ** 2))
               for c in live)
