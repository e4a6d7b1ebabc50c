"""Exactness of the 2-step temporally-fused kernel (ops/pallas/fdtd3d_t2)
vs the jnp stepper, across the supported envelope (interpret mode; the
compiled path is exercised on the TPU by bench.py)."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import fdtd3d_t2

from test_fdtd3d_kernel import _plan


def _compare(plan, nsteps=20, bx=8, atol=2e-6):
    assert fdtd3d_t2.supported(plan, bx), "plan must be inside the envelope"
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx)
    st_k = ker.run(ker.init_state(), nsteps)
    full_k = ker.to_full(st_k)
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    for c in st_j["f_u"]:
        np.testing.assert_allclose(np.asarray(full_k["f_u"][c]),
                                   np.asarray(st_j["f_u"][c]),
                                   atol=atol * scale, err_msg=f"f_u[{c}]")
    for c in st_j["f_w"]:
        np.testing.assert_allclose(np.asarray(full_k["f_w"][c]),
                                   np.asarray(st_j["f_w"][c]),
                                   atol=atol * scale, err_msg=f"f_w[{c}]")
    assert int(full_k["t"]) == int(st_j["t"])


def test_vacuum_upml_all_axes():
    """Full 3-call pipeline: lo-edge (+1 interior block), mid, hi-edge."""
    _compare(_plan("xyz"))


def test_vacuum_upml_yz_only():
    """Single first+last call with the extra step-2 iteration."""
    _compare(_plan("yz"))


def test_vacuum_upml_x_only():
    _compare(_plan("x"))


def test_vacuum_no_pml():
    _compare(_plan(""))


def test_eps_slab_upml():
    """Inhomogeneous chi1inv: step-2 reads u only on the stored-E slabs."""
    _compare(_plan("xyz", with_eps=True))


def test_odd_steps_residue():
    """Odd step counts finish with one 1-step-kernel residue step."""
    _compare(_plan("xyz"), nsteps=21)


def test_longer_run_stability():
    _compare(_plan("xyz"), nsteps=60, atol=5e-6)


def _compare_depth3(plan, nsteps, atol=2e-6):
    assert fdtd3d_t2.supported(plan, 8, depth=3)
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, 8, depth=3)
    st_k = ker.run(ker.init_state(), nsteps)
    full_k = ker.to_full(st_k)
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    assert int(full_k["t"]) == int(st_j["t"])


def test_depth3_xyz_pml():
    """Three-stage pipeline (stage-2 middle package): needs depth-1
    interior blocks past the lo x-compact range."""
    _compare_depth3(_plan("xyz", cells=(40, 16, 16)), nsteps=21)


def test_depth3_eps():
    _compare_depth3(_plan("xyz", cells=(40, 16, 16), with_eps=True),
                    nsteps=18)


# ---------------------------------------------------------------------------
# dispersive envelope through the 2-step schedule (round-3: the flagship
# Lorentz/chi3/chi2-NR physics in the temporally-fused hot loop)
# ---------------------------------------------------------------------------

from test_fdtd3d_disp import _plan as _dplan


def _compare_disp(plan, nsteps=20, atol=2e-6, check_pol=True):
    assert fdtd3d_t2.supported(plan), "plan must be inside the t2 envelope"
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan)
    assert ker.L.disp is not None
    st_k = ker.run(ker.init_state(), nsteps)
    full_k = ker.to_full(st_k)
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    if check_pol:
        for pi in range(len(st_j["pol"])):
            for c in st_j["pol"][pi]["p"]:
                np.testing.assert_allclose(
                    np.asarray(full_k["pol"][pi]["p"][c]),
                    np.asarray(st_j["pol"][pi]["p"][c]),
                    atol=atol * scale, err_msg=f"pol{pi}:p:{c}")
    for c in st_j["f_w"]:
        np.testing.assert_allclose(np.asarray(full_k["f_w"][c]),
                                   np.asarray(st_j["f_w"][c]),
                                   atol=atol * scale, err_msg=f"f_w[{c}]")


def test_disp_lorentz_ball_t2():
    _compare_disp(_dplan(with_pol=True))


def test_disp_nr_chi2_ball_t2():
    """chi2-Newton: exercises the stage-2 in-register next-plane rebuild."""
    _compare_disp(_dplan(with_pol=False, with_nr=True))


def test_disp_chi3_ball_t2():
    _compare_disp(_dplan(with_pol=False, with_chi3=True))


def test_disp_flagship_lorentz_nr_t2():
    """The flagship combination (BASELINE configs 3-5 physics)."""
    _compare_disp(_dplan(with_pol=True, with_nr=True))


def test_disp_longer_run_t2():
    _compare_disp(_dplan(with_pol=True, with_nr=True), nsteps=48, atol=5e-6)


def test_disp_odd_steps_t2():
    """Odd step counts finish with one 1-step-kernel residue step."""
    _compare_disp(_dplan(with_pol=True, with_nr=True), nsteps=21)


def test_disp_partial_y_window_t2():
    plan = _dplan(cells=(32, 64, 24), with_pol=True, with_nr=True)
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan)
    wy0, wy1 = ker.L.win_y
    assert wy1 - wy0 < plan.storage_shape[1] - 8, (wy0, wy1)
    _compare_disp(plan)


def test_disp_roundtrip_t2():
    plan = _dplan(with_pol=True, with_nr=True)
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan)
    st = ker.run(ker.init_state(), 12)
    st2 = ker.from_full(ker.to_full(st))
    a = ker.to_full(ker.run(st, 10, t0=12))
    b = ker.to_full(ker.run(st2, 10, t0=12))
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in a["f"].values())
    for c in a["f"]:
        np.testing.assert_allclose(np.asarray(b["f"][c]),
                                   np.asarray(a["f"][c]),
                                   atol=1e-6 * scale, err_msg=c)


# ---------------------------------------------------------------------------
# dispersive envelope through the THREE-step schedule (pure-ADE windows:
# the middle stage runs its own disp D-half from stage-1's snapshots and
# relays P/PP/de + the window-coef caches one more iteration; chi2/chi3
# NL windows are rejected -- their dmp halos are not chained 3 deep)
# ---------------------------------------------------------------------------


def _compare_disp3(plan, nsteps=21, atol=2e-6, check_pol=True):
    assert fdtd3d_t2.supported(plan, depth=3), "must fit the 3-step envelope"
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, depth=3)
    assert ker.L.disp is not None
    st_k = ker.run(ker.init_state(), nsteps)
    full_k = ker.to_full(st_k)
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    if check_pol:
        for pi in range(len(st_j["pol"])):
            for c in st_j["pol"][pi]["p"]:
                np.testing.assert_allclose(
                    np.asarray(full_k["pol"][pi]["p"][c]),
                    np.asarray(st_j["pol"][pi]["p"][c]),
                    atol=atol * scale, err_msg=f"pol{pi}:p:{c}")
    for c in st_j["f_w"]:
        np.testing.assert_allclose(np.asarray(full_k["f_w"][c]),
                                   np.asarray(st_j["f_w"][c]),
                                   atol=atol * scale, err_msg=f"f_w[{c}]")


def test_disp3_lorentz_ball():
    _compare_disp3(_dplan(with_pol=True))


def test_disp3_drude_ball():
    _compare_disp3(_dplan(with_pol=True, drude=True))


def test_disp3_odd_steps():
    """nsteps % 3 != 0: the residue runs through the 1-step kernel."""
    _compare_disp3(_dplan(with_pol=True), nsteps=23)


def test_disp3_longer_run():
    _compare_disp3(_dplan(with_pol=True), nsteps=48, atol=5e-6)


def test_disp3_nr_chi2_ball():
    """chi2-Newton through the 3-step schedule: the middle stage's NL
    next-plane dmp is rebuilt from stage-1's in-register results and
    the final stage's from the middle's (the same nl_next2 relation,
    one stage up)."""
    _compare_disp3(_dplan(with_pol=False, with_nr=True), check_pol=False)


def test_disp3_chi3_ball():
    _compare_disp3(_dplan(with_pol=False, with_chi3=True), check_pol=False)


def test_disp3_flagship_lorentz_nr():
    """The flagship Lorentz + chi2-Newton combination at depth 3."""
    _compare_disp3(_dplan(with_pol=True, with_nr=True))


def test_pingpong_slots_interpret():
    """The hardware path's ping-pong (2-slot) package scratch indexing,
    forced in interpret mode (MNT_T2_PP_FORCE=1), is exact vs the jnp
    stepper on the flagship depth-3 dispersive plan — the gate for the
    slot arithmetic itself (interpret tests otherwise run the
    semantically-equivalent snapshot fallback for speed)."""
    os.environ["MNT_T2_PP_FORCE"] = "1"
    try:
        _compare_disp3(_dplan(with_pol=True, with_nr=True))
        _compare(_plan("xyz"), nsteps=8)
    finally:
        del os.environ["MNT_T2_PP_FORCE"]


def _mirror_plan(sx=3):
    """3D uPML cell folded by a node-aligned y-mirror (phase +1, even
    cell count) through the public Simulation, so the plan carries the
    genuine mirror_node fold the production path produces."""
    import meep_nl_tpu as mp
    sim = mp.Simulation(
        cell_size=mp.Vector3(sx, 2, 2), resolution=8,
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez,
                           center=mp.Vector3(0.3, 0, 0.2))],
        boundary_layers=[mp.PML(0.5)],
        symmetries=[mp.Mirror(mp.Y, phase=+1)])
    sim.init_sim()
    plan = sim.plan
    assert plan.mirror_node, "fold must be node-aligned"
    plan.slab_opt = True
    return plan


def test_mirror_fold_depth2():
    """y node-mirror ghost through the fused kernel (VERDICT r3 task 5):
    the fold's backward-difference ghost at the mirror plane is an
    in-register row read (fdtd3d.mirror_yz_info), bitwise vs the jnp
    stepper on the folded cell (which test_symmetry gates against the
    unfolded full cell)."""
    _compare(_mirror_plan())


def test_mirror_fold_depth3():
    # wider x so the depth-3 lo/mid/hi call split has room at bx=8
    _compare_depth3(_mirror_plan(sx=6), nsteps=21)
