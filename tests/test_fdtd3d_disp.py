"""Exactness of the fused kernel's dispersive envelope (Lorentz ADE +
chi3 Pade + chi2-Newton, ops/pallas/fdtd3d.py disp call) vs the jnp
stepper — the fork's flagship physics (susceptibility.cpp:188,
step_generic.cpp:546-815) running inside the fused hot loop.

Runs in pallas interpret mode on CPU (compiled path exercised on the TPU
by bench.py / test_hybrid)."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, PolSpec,
                                      SrcVolSpec, compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import fdtd3d


def _plan(res=8.0, cells=(32, 24, 24), with_pol=True, with_nr=False,
          with_chi3=False, pml_axes="xyz", drude=False):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    shape = gv.shape
    x, y, z = [gv.comp_coords("ez", ax) for ax in range(3)]
    cx, cy, cz = [0.5 * (c[0] + c[-1]) for c in (x, y, z)]
    XX, YY, ZZ = np.meshgrid(x - cx, y - cy, z - cz, indexing="ij")
    ball = XX ** 2 + YY ** 2 + ZZ ** 2 < (min(size) / 6) ** 2
    eps = np.ones(shape)
    eps[ball] = 4.0
    chi1inv = {c: {c[1]: 1.0 / eps} for c in ("ex", "ey", "ez")}
    pols = []
    if with_pol:
        pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05, drude=drude,
                        sigma={(c, c[1]): 0.3 * ball.astype(np.float64)
                               for c in ("ex", "ey", "ez")})]
    nr = {}
    chi3 = {}
    if with_nr:
        c2 = np.zeros(shape)
        c2[ball] = 0.08
        nr = {c: c2 for c in ("ex", "ey", "ez")}
    if with_chi3:
        c3 = np.zeros(shape)
        c3[ball] = 0.02
        chi3 = {c: c3 for c in ("ex", "ey", "ez")}
    mat = MaterialSpec(chi1inv=chi1inv, pols=pols, nr_chi2=nr, chi3=chi3)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [size[0] * 0.3, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[src],
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def _compare(plan, nsteps=20, bx=8, atol=2e-6, check_pol=True):
    assert fdtd3d.supported(plan, bx), "plan must be inside the envelope"
    ker = fdtd3d.Fdtd3dKernel(plan, bx)
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


def test_lorentz_ball():
    _compare(_plan(with_pol=True))


def test_drude_ball():
    _compare(_plan(with_pol=True, drude=True))


def test_nr_chi2_ball():
    _compare(_plan(with_pol=False, with_nr=True))


def test_chi3_ball():
    _compare(_plan(with_pol=False, with_chi3=True))


def test_flagship_lorentz_nr():
    """The flagship combination: Lorentz pole + chi2-NR in an eps ball."""
    _compare(_plan(with_pol=True, with_nr=True))


def test_longer_run():
    _compare(_plan(with_pol=True, with_nr=True), nsteps=48, atol=5e-6)


def test_partial_y_window():
    """Tall-Y cell: the dispersive state's y-window is a strict subset of
    the grid (exercises the windowed overlay/carry/halo paths)."""
    plan = _plan(cells=(32, 64, 24), with_pol=True, with_nr=True)
    from meep_nl_tpu.ops.pallas.fdtd3d import _Layout
    L = _Layout(plan, 8)
    wy0, wy1 = L.win_y
    assert wy1 - wy0 < plan.storage_shape[1] - 8, (wy0, wy1)
    _compare(plan, nsteps=20)


def test_roundtrip_disp():
    plan = _plan(with_pol=True, with_nr=True)
    ker = fdtd3d.Fdtd3dKernel(plan, 8)
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


@pytest.mark.slow
def test_graft_flagship_plan():
    """The actual __graft_entry__ flagship plan (eps ball + Lorentz pole +
    chi2-NR, full uPML) fits the fused envelope at production-proportioned
    sizes (at the 32-cell compile-gate size the ball touches the PML inner
    edge, which the stencil guard rightly rejects)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_plan
    plan = _flagship_plan(shape_cells=(48, 48, 48), pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    assert fdtd3d.supported(plan, 8)
    _compare(plan, nsteps=10)
