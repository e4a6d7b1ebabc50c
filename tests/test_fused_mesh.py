"""Sharded fused kernel (parallel/fused_mesh.py): the Mosaic kernel per
shard with explicit ppermute halo/carry exchange must match the
single-device kernel and the jnp stepper (the reference's per-chunk
kernels + comms, step.cpp:226-288).

Runs on the CPU test mesh in pallas interpret mode."""

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
from meep_nl_tpu.parallel import mesh as PM
from meep_nl_tpu.parallel.fused_mesh import ShardedFdtd3d, sharded_supported


def _plan(pml_axes="xyz", with_eps=False, res=8.0, cells=(63, 16, 16)):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    chi1inv = {}
    if with_eps:
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
    plan.slab_opt = True
    return plan


def _compare(plan, n_shards=4, nsteps=16, bx=8, atol=3e-6):
    assert sharded_supported(plan, n_shards, bx)
    mesh = PM.make_mesh(n_shards, shape=(n_shards,))
    sk = ShardedFdtd3d(plan, mesh, bx=bx)
    st_s = sk.run(sk.init_state(), nsteps)
    full_s = jax.device_get(sk.to_full(st_s))

    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_s["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    # and against the single-device fused kernel (tighter)
    ker = fdtd3d.Fdtd3dKernel(plan, bx)
    full_k = jax.device_get(ker.to_full(ker.run(ker.init_state(), nsteps)))
    for c in full_k["f"]:
        np.testing.assert_allclose(np.asarray(full_s["f"][c]),
                                   np.asarray(full_k["f"][c]),
                                   atol=2e-6 * scale, err_msg=f"k f[{c}]")


def test_sharded_vacuum_xyz_pml():
    _compare(_plan("xyz"))


def test_sharded_vacuum_yz_pml():
    _compare(_plan("yz"))


def test_sharded_eps_slab():
    _compare(_plan("xyz", with_eps=True))


def test_sharded_no_pml():
    _compare(_plan(""))


def test_sharded_longer():
    _compare(_plan("xyz"), nsteps=40, atol=6e-6)


def test_envelope():
    plan = _plan("xyz")
    assert sharded_supported(plan, 4, 8)
    assert not sharded_supported(plan, 5, 8)   # 64 % 5 != 0


def test_sharded_run_routes_to_fused():
    """parallel/mesh.sharded_run auto-routes DFT-free plans inside the
    fused envelope through the per-shard Mosaic kernel and matches the
    jnp SPMD path."""
    from meep_nl_tpu.stepper.step import init_state
    plan = _plan("xyz")
    # default-bx engagement: _fit_bx halves the single-device pick down
    # to the per-shard span (a vacuous fall-back here = routing bug)
    assert sharded_supported(plan, 4)
    mesh = PM.make_mesh(4, shape=(4,))
    st_f = PM.sharded_run(plan, mesh, init_state(plan), 12)
    st_j = PM.sharded_run(plan, mesh, init_state(plan), 12,
                          prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(st_f["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=3e-6 * scale, err_msg=c)


def _plan_with_flux(decimation=4):
    """Vacuum xyz-PML plan plus one flux plane (4 DTFT specs) with a
    uniform decimation, inside the sharded fused envelope."""
    from meep_nl_tpu.stepper import monitors as M
    res, cells = 8.0, (63, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    freqs = np.linspace(0.9, 1.1, 3)
    specs = M.flux_specs(gv, "flux0:0", "x", [size[0] / 4, 0.0, 0.0],
                         [0.0, 1.2, 1.2], freqs, decimation=decimation)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[src], dfts=specs,
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def test_sharded_hybrid_dft():
    """Monitored sharded runs: fused cycles + DFT-only sample reads must
    reproduce the jnp SPMD path's DTFT accumulators and fields."""
    from meep_nl_tpu.stepper.step import init_state
    from meep_nl_tpu.parallel.fused_mesh import sharded_hybrid_run
    plan = _plan_with_flux()
    mesh = PM.make_mesh(4, shape=(4,))
    nsteps = 160
    # direct call (no exception swallowing): must engage, not fall back
    st_f = sharded_hybrid_run(plan, mesh, init_state(plan), nsteps, 0)
    assert st_f is not None
    st_j = PM.sharded_run(plan, mesh, init_state(plan), nsteps,
                          prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(st_f["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=3e-6 * scale, err_msg=c)
    # tolerance on the global accumulator scale: cross-polarized flux
    # components are ~0 by symmetry (noise-level, not comparable per-key)
    dscale = max(float(np.abs(np.asarray(v)).max())
                 for v in st_j["dft"].values())
    assert dscale > 0
    for k in st_j["dft"]:
        np.testing.assert_allclose(np.asarray(st_f["dft"][k]),
                                   np.asarray(st_j["dft"][k]),
                                   atol=1e-5 * dscale, err_msg=f"dft[{k}]")
    # and the sharded_run router reaches the same result
    st_r = PM.sharded_run(plan, mesh, init_state(plan), nsteps)
    for k in st_j["dft"]:
        np.testing.assert_allclose(np.asarray(st_r["dft"][k]),
                                   np.asarray(st_j["dft"][k]),
                                   atol=1e-5 * dscale, err_msg=f"r {k}")


def _plan_disp(with_nl=True, cells=(63, 16, 16), res=8.0):
    """Lorentz-pole ball STRADDLING the shard-1/2 boundary (pol ADEs are
    pointwise and shard anywhere) plus an optional chi2-NR block interior
    to shard 2 (NL stencils must clear boundaries), xyz uPML."""
    from meep_nl_tpu.stepper.plan import PolSpec
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    shape = gv.shape

    def site_mask(c, x_rng, y_rng, z_rng):
        m = np.zeros(shape)
        m[x_rng[0]:x_rng[1], y_rng[0]:y_rng[1], z_rng[0]:z_rng[1]] = 1.0
        return m

    eps = np.ones(shape)
    eps[26:38, 5:12, 5:12] = 4.0
    chi1inv = {c: {c[1]: 1.0 / eps} for c in ("ex", "ey", "ez")}
    pol_m = site_mask("ez", (26, 38), (5, 12), (5, 12))
    pols = [PolSpec(field_type="e", omega0=1.1, gamma=0.04,
                    sigma={("ex", "x"): 0.3 * pol_m,
                           ("ey", "y"): 0.3 * pol_m,
                           ("ez", "z"): 0.3 * pol_m})]
    nr = {}
    if with_nl:
        nr_m = site_mask("ez", (36, 42), (6, 11), (6, 11))
        nr = {c: 0.5 * nr_m for c in ("ex", "ey", "ez")}
    mat = MaterialSpec(chi1inv=chi1inv, pols=pols, nr_chi2=nr)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [-1.5, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    plan = compile_plan(gv, mat, pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def test_sharded_disp_lorentz():
    """Pol ADE (Lorentz) straddling a shard boundary through the sharded
    fused kernel: pointwise P updates need no exchange."""
    _compare(_plan_disp(with_nl=False), nsteps=24, atol=5e-6)


def test_sharded_disp_nl():
    """Lorentz + chi2-Newton (the flagship material class) sharded."""
    _compare(_plan_disp(with_nl=True), nsteps=24, atol=5e-6)


def test_sharded_disp_envelope():
    plan = _plan_disp(with_nl=True)
    # NL block x-sites [36, 42): fine for 4 shards (boundaries 16/32/48,
    # clearance 3), rejected for 8 (boundary 40 inside the block)
    assert sharded_supported(plan, 4, 8)
    assert not sharded_supported(plan, 8)


def test_sharded_hybrid_dft_depth2_pairs():
    """Monitored sharded runs take depth-2 halo-in-time pairs inside
    each DFT cycle when the plan fits the sharded t2 envelope (source
    clear of shard boundaries): outputs must match the jnp SPMD path."""
    from meep_nl_tpu.stepper.step import init_state
    from meep_nl_tpu.stepper import monitors as M
    from meep_nl_tpu.parallel.fused_mesh import sharded_hybrid_run
    from meep_nl_tpu.parallel.fused_mesh_t2 import sharded_t2_supported
    res, cells = 8.0, (63, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [-0.9, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    freqs = np.linspace(0.9, 1.1, 3)
    specs = M.flux_specs(gv, "flux0:0", "x", [size[0] / 4, 0.0, 0.0],
                         [0.0, 1.2, 1.2], freqs, decimation=4)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[src], dfts=specs,
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    mesh = PM.make_mesh(4, shape=(4,))
    assert sharded_t2_supported(plan, 4), "pair path must engage"
    nsteps = 96
    st_f = sharded_hybrid_run(plan, mesh, init_state(plan), nsteps, 0)
    assert st_f is not None
    st_j = PM.sharded_run(plan, mesh, init_state(plan), nsteps,
                          prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(st_f["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=3e-6 * scale, err_msg=c)
    dscale = max(float(np.abs(np.asarray(v)).max())
                 for v in st_j["dft"].values())
    assert dscale > 0
    for k in st_j["dft"]:
        np.testing.assert_allclose(np.asarray(st_f["dft"][k]),
                                   np.asarray(st_j["dft"][k]),
                                   atol=1e-5 * dscale, err_msg=f"dft[{k}]")
