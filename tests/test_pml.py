"""uPML absorbing boundaries (analog of tests/pml.cpp: reflection decay
with thickness/resolution)."""

import numpy as np

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, run

from helpers import make_point_source, vacuum_mat, total_field_energy


def _residual_energy_2d(pml_thick, res=16.0, cell=8.0):
    gv = G.GridVolume.create("2d", [cell, cell], res)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.0, 0.0], src)
    pmls = ([PMLSpec("x", pml_thick), PMLSpec("y", pml_thick)]
            if pml_thick > 0 else [])
    plan = compile_plan(gv, vacuum_mat(), pmls=pmls, sources=[s])
    state = init_state(plan)
    # run long enough for the pulse to cross the cell several times
    nsteps = int(6 * cell / plan.dt * 0.5)
    state = run(plan, state, nsteps)
    return total_field_energy(state, ["ez", "hx", "hy"])


def test_pml_absorbs():
    e_pec = _residual_energy_2d(0.0)
    e_pml = _residual_energy_2d(1.0)
    assert e_pec > 1e-3
    # PML should kill at least 5 orders of magnitude of the bouncing energy
    assert e_pml < e_pec * 1e-5, (e_pml, e_pec)


def test_pml_thicker_is_better():
    e_thin = _residual_energy_2d(0.5)
    e_thick = _residual_energy_2d(2.0)
    assert e_thick < e_thin


def test_pml_1d():
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ex", [0.0], src)
    plan = compile_plan(gv, vacuum_mat(), pmls=[PMLSpec("z", 1.0)],
                        sources=[s])
    state = init_state(plan)
    state = run(plan, state, 1200)
    e = total_field_energy(state, ["ex", "hy"])
    assert e < 1e-10, e


def test_pml_one_sided():
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ex", [0.0], src)
    plan = compile_plan(gv, vacuum_mat(),
                        pmls=[PMLSpec("z", 1.0, side=+1)], sources=[s])
    state = init_state(plan)
    state = run(plan, state, 700)
    # right-going half absorbed, left-going half reflected off PEC
    e = total_field_energy(state, ["ex", "hy"])
    assert 1e-4 < e


def test_pml_custom_profile_matches_power_law():
    """PML(pml_profile=lambda u: u**2) must reproduce the default
    quadratic power law bit-for-bit in the built sig/kap arrays
    (python/simulation.py pml_profile; structure.cpp:630 profile
    quadrature)."""
    from meep_nl_tpu.stepper.plan import build_pml_arrays
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    a = build_pml_arrays(gv, [PMLSpec("z", 1.0)], dt=0.025)
    b = build_pml_arrays(gv, [PMLSpec("z", 1.0,
                                      pml_profile=lambda u: u * u)],
                         dt=0.025)
    for k in ("sig", "kap", "siginv"):
        np.testing.assert_allclose(a["z"][k], b["z"][k], rtol=1e-6)


def test_pml_custom_linear_profile_absorbs():
    """A linear pml_profile still absorbs the pulse (different shape,
    same asymptotic reflection target)."""
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ex", [0.0], src)
    plan = compile_plan(gv, vacuum_mat(),
                        pmls=[PMLSpec("z", 1.0,
                                      pml_profile=lambda u: u)],
                        sources=[s])
    state = run(plan, init_state(plan), 1200)
    e = total_field_energy(state, ["ex", "hy"])
    # linear profiles reflect slightly more at the interface (derivative
    # discontinuity) than the default quadratic; still deep absorption
    assert e < 1e-8, e
