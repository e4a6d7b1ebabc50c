"""Basic stepper physics: vacuum propagation, PEC boundaries, energy
conservation, and dimensional consistency.

Mirrors the reference's analytic regression strategy (tests/physical.cpp
energy conservation, tests/one_dimensional.cpp)."""

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import MaterialSpec, SrcVolSpec, compile_plan
from meep_nl_tpu.stepper.step import init_state, run


from helpers import make_point_source, vacuum_mat, total_field_energy


def test_1d_pulse_propagates():
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ex", [0.0], src)
    plan = compile_plan(gv, vacuum_mat(), sources=[s])
    state = init_state(plan)
    state = run(plan, state, 200)
    ex = np.asarray(state["f"]["ex"])
    assert np.all(np.isfinite(ex))
    # pulse (emitted at center, t=200*dt=5.0 after ~2.6 peak delay) should
    # have reached |z| ~ 2.4 and not the boundaries
    n = gv.num[0]
    center = n // 2
    assert np.max(np.abs(ex)) > 1e-4
    # symmetric emission
    np.testing.assert_allclose(ex[center + 10], ex[center - 10], rtol=1e-4)


def test_1d_energy_conserved_after_source_off():
    gv = G.GridVolume.create("1d", [10.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=1.0)
    s = make_point_source(gv, "ex", [0.0], src)
    plan = compile_plan(gv, vacuum_mat(), sources=[s])
    state = init_state(plan)
    # run past the source turn-off
    nsrc = int(src.last_time() / plan.dt) + 10
    state = run(plan, state, nsrc)
    e1 = total_field_energy(state, ["ex", "hy"])
    state = run(plan, state, 50)  # still inside the cell (PEC reflects anyway)
    e2 = total_field_energy(state, ["ex", "hy"])
    assert e1 > 0
    # E and H are staggered in time so the naive sum oscillates by O(dt);
    # the reference synchronizes fields before energy sums
    # (energy_and_flux.cpp:54).  1% is the unsynchronized bound.
    assert abs(e2 - e1) / e1 < 1e-2


def test_2d_tm_pulse_isotropic():
    gv = G.GridVolume.create("2d", [8.0, 8.0], 16.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.0, 0.0], src)
    plan = compile_plan(gv, vacuum_mat(), sources=[s])
    # only TM components should be live
    live = [sp.ec for sp in plan.eh_specs_e] + [sp.ec for sp in plan.eh_specs_h]
    assert set(live) == {"ez", "hx", "hy"}
    state = init_state(plan)
    state = run(plan, state, 150)
    ez = np.asarray(state["f"]["ez"])
    assert np.all(np.isfinite(ez))
    # 4-fold symmetry of a point source in vacuum
    n = gv.num[0]
    c = n // 2
    r = 20
    np.testing.assert_allclose(ez[c + r, c], ez[c - r, c], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(ez[c + r, c], ez[c, c + r], rtol=1e-4, atol=1e-9)


def test_pec_boundary_zeroes_tangential_e():
    gv = G.GridVolume.create("2d", [4.0, 4.0], 8.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.0, 0.0], src)
    plan = compile_plan(gv, vacuum_mat(), sources=[s])
    state = init_state(plan)
    state = run(plan, state, 300)  # long enough to bounce off walls
    ez = np.asarray(state["f"]["ez"])
    assert np.max(np.abs(ez[0, :])) == 0.0
    assert np.max(np.abs(ez[-1, :])) == 0.0
    assert np.max(np.abs(ez[:, 0])) == 0.0
    assert np.max(np.abs(ez[:, -1])) == 0.0
    # and the field bounced around is still finite & nonzero
    assert 1e-6 < np.max(np.abs(ez)) < 1e3


def test_3d_runs_and_finite():
    gv = G.GridVolume.create("3d", [2.0, 2.0, 2.0], 8.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.0, 0.0, 0.0], src)
    plan = compile_plan(gv, vacuum_mat(), sources=[s])
    state = init_state(plan)
    state = run(plan, state, 60)
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        assert np.all(np.isfinite(np.asarray(state["f"][c]))), c
    assert np.max(np.abs(np.asarray(state["f"]["ez"]))) > 1e-8


def test_courant_relation():
    gv = G.GridVolume.create("2d", [4.0, 4.0], 10.0)
    plan = compile_plan(gv, vacuum_mat())
    assert plan.dt == pytest.approx(0.5 * 0.1)
