"""Core-tier smoke coverage of the fused Mosaic kernels (interpret
mode, tiny grids): the exhaustive exactness sweeps live in the
medium-tier modules (test_fdtd3d_kernel / _t2 / _disp / test_hybrid /
test_fused_mesh*); this file keeps every kernel subsystem exercised in
the <15-minute core run."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, PolSpec,
                                      SrcVolSpec, compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import fdtd3d, fdtd3d_t2


def _tiny_plan(pml_axes="xyz", disp=False, res=8.0, cells=(16, 8, 8)):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    shape = gv.shape
    mat_kw = {}
    if disp:
        xs = gv.comp_coords("ez", 0)
        cx = 0.5 * (xs[0] + xs[-1])
        box = np.zeros(shape)
        box[np.abs(xs - cx) < size[0] / 8, :, :] = 1.0
        mat_kw["pols"] = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                                  sigma={(c, c[1]): 0.3 * box
                                         for c in ("ex", "ey", "ez")})]
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, **mat_kw), pmls=pmls,
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def _check(ker_state_full, plan, nsteps, atol=3e-6):
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(ker_state_full["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")


def test_smoke_fdtd3d_1step():
    plan = _tiny_plan()
    ker = fdtd3d.Fdtd3dKernel(plan, 2)
    st = ker.run(ker.init_state(), 6)
    _check(ker.to_full(st), plan, 6)


def test_smoke_t2_depth2():
    plan = _tiny_plan("yz")
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, 2, depth=2)
    st = ker.run(ker.init_state(), 6)
    _check(ker.to_full(st), plan, 6)


def test_smoke_t2_dispersive():
    plan = _tiny_plan("yz", disp=True, cells=(24, 8, 8))
    bx = fdtd3d_t2._pick_bx(plan, None, 2)
    assert fdtd3d_t2.supported(plan, bx, depth=2)
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx, depth=2)
    st = ker.run(ker.init_state(), 6)
    _check(ker.to_full(st), plan, 6)


def test_smoke_hybrid_monitored():
    """Public-API hybrid cycle driver with a flux monitor (CPU opt-in)."""
    os.environ["MNT_HYBRID_CPU"] = "1"
    try:
        import meep_nl_tpu as mp
        sims = []
        for fused in (True, False):
            sim = mp.Simulation(
                cell_size=mp.Vector3(2, 1, 1), resolution=8,
                sources=[mp.Source(
                    mp.GaussianSource(frequency=1.0, fwidth=0.5),
                    component=mp.Ez, center=mp.Vector3(-0.4, 0, 0))],
                boundary_layers=[mp.PML(0.25, direction="x")],
                use_fused=fused)
            fl = sim.add_flux(1.0, 0.2, 2, mp.FluxRegion(
                center=mp.Vector3(0.5, 0, 0),
                size=mp.Vector3(0, 0.5, 0.5)))
            sim.run(until=4.0)
            sims.append(np.asarray(sim.get_fluxes(fl)))
        np.testing.assert_allclose(sims[0], sims[1], rtol=2e-4)
        assert np.any(np.abs(sims[1]) > 0)
    finally:
        os.environ.pop("MNT_HYBRID_CPU", None)


def test_smoke_sharded_fused():
    """Sharded fused driver vs single-device jnp on the 8-device mesh."""
    from meep_nl_tpu.parallel import mesh as PM
    plan = _tiny_plan("yz")
    st0 = init_state(plan)
    ref = run(plan, st0, 4)
    out = PM.sharded_run(plan, PM.make_mesh(2), st0, 4, prefer_fused=True)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in ref["f"].values())
    for c in ref["f"]:
        np.testing.assert_allclose(np.asarray(out["f"][c]),
                                   np.asarray(ref["f"][c]),
                                   atol=3e-6 * scale, err_msg=c)
