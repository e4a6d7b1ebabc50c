"""Exactness of the fused Pallas FDTD kernel (ops/pallas/fdtd3d.py) vs the
jnp stepper, on the kernel's whole supported envelope.

Runs in pallas interpret mode on the CPU test mesh (the compiled path is
exercised on the TPU by bench.py)."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import fdtd3d


def _plan(pml_axes="xyz", with_eps=False, res=8.0, cells=(24, 16, 16)):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    chi1inv = {}
    if with_eps:
        eps = np.ones(gv.shape)
        x = gv.comp_coords("ez", 0)
        cx = 0.5 * (x[0] + x[-1])
        for c in ("ex", "ey", "ez"):
            e = np.ones(gv.shape)
            xx = gv.comp_coords(c, 0)
            e[np.abs(xx - cx) < size[0] / 6, :, :] = 4.0
            chi1inv[c] = {c[1]: 1.0 / e}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), pmls=pmls,
                        sources=[src], pad_to_multiple=(8, 1, 1))
    # jnp reference runs the slab-local aux path, whose f_u/f_w storage
    # semantics match the kernel's compact state (equivalence of slab_opt
    # to the full chain is proven separately by test_slab_opt)
    plan.slab_opt = True
    return plan


def _compare(plan, nsteps=20, bx=8, atol=2e-6):
    assert fdtd3d.supported(plan, bx), "plan must be inside the envelope"
    ker = fdtd3d.Fdtd3dKernel(plan, bx)
    st_k = ker.run(ker.init_state(), nsteps)
    full_k = ker.to_full(st_k)
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        ref = np.asarray(st_j["f"][c])
        got = np.asarray(full_k["f"][c])
        np.testing.assert_allclose(got, ref, atol=atol * scale,
                                   err_msg=f"f[{c}]")
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
    _compare(_plan("xyz"))


def test_vacuum_upml_yz_only():
    """No x-PML: single interior call, no x-compact aux."""
    _compare(_plan("yz"))


def test_vacuum_upml_x_only():
    _compare(_plan("x"))


def test_vacuum_no_pml():
    _compare(_plan(""))


def test_eps_slab_upml():
    """Inhomogeneous diagonal chi1inv (full-3D u arrays)."""
    _compare(_plan("xyz", with_eps=True))


def test_longer_run_stability():
    """60 steps through source turn-on; fields finite and still exact."""
    _compare(_plan("xyz"), nsteps=60, atol=5e-6)


def test_from_full_roundtrip():
    """from_full(to_full(s)) is PHYSICALLY equivalent to s: compact aux in
    dead-padding rows is don't-care (masked fields), so equivalence is
    checked by evolving both states further and comparing fields."""
    plan = _plan("xyz")
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
                                   atol=1e-7 * scale, err_msg=c)


def test_envelope_rejections():
    plan = _plan("xyz")
    plan2 = _plan("xyz")
    plan2.bfast_k = (0.5, 0.0, 0.0)
    assert not fdtd3d.supported(plan2)
    assert fdtd3d.supported(plan)
