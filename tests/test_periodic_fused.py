"""Periodic-x fused stepping (ops/pallas/periodicx.py): the Mosaic
kernel driven with wrap ghosts + a redundantly-recomputed wrap carry
must reproduce the jnp stepper's Bloch wrap (ops/stencil.shift periodic
branch / boundaries.cpp:347 CONNECT_PHASE) for real (+-1) phases.

Runs in pallas interpret mode on the CPU test mesh."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import periodicx


def _plan_periodic(kx=0.0, with_eps=False, res=8.0, cells=(24, 16, 16),
                   pml_axes="yz", src_comp="ez", src_x=0.3):
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
    pts = gv.interp_weights(src_comp, [src_x, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec(src_comp, idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), pmls=pmls,
                        periodic=(True, False, False),
                        bloch_k=(kx, 0.0, 0.0),
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def _compare(plan, nsteps=30, bx=8, atol=2e-6):
    assert periodicx.periodic_supported(plan, bx), "inside the envelope"
    ker = periodicx.PeriodicXKernel(plan, bx)
    full_k = ker.to_full(ker.run(ker.init_state(), nsteps))
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    # the wrap must be live: energy reaches the first live planes within
    # nsteps (the run would also pass trivially if the pulse never
    # reached the wrap boundary)
    ez = np.asarray(st_j["f"]["e" + plan.sources[0].component[1]])
    assert np.abs(ez[:2]).max() > 1e-5 * scale


def test_periodic_k0():
    _compare(_plan_periodic(kx=0.0), nsteps=40)


def test_periodic_phase_minus1():
    # phase = exp(i 2 pi k Lx) = -1 at k = 0.5 / Lx
    plan = _plan_periodic(kx=0.0)
    Lx = plan.gv.size[0]
    _compare(_plan_periodic(kx=0.5 / Lx), nsteps=40)


def test_periodic_eps_structure():
    _compare(_plan_periodic(kx=0.0, with_eps=True), nsteps=40)


def test_periodic_rejects_complex_phase():
    plan = _plan_periodic(kx=0.1)
    assert not periodicx.periodic_supported(plan)


def test_periodic_hybrid_sim():
    """Simulation-level: a periodic cell with k_point at the zone edge
    rides the fused path."""
    pytest.importorskip("jax")
    os.environ["MNT_HYBRID_CPU"] = "1"

    def mk(use_fused):
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(3.0, 2.0, 2.0), resolution=8,
            sources=[mnt.Source(mnt.GaussianSource(1.0, fwidth=0.4),
                                component=mnt.Ez,
                                center=mnt.Vector3(0.3, 0, 0))],
            boundary_layers=[mnt.PML(0.5, mnt.Y), mnt.PML(0.5, mnt.Z)],
            k_point=mnt.Vector3(0, 0, 0),
            use_fused=use_fused)
        return sim

    try:
        sim_j = mk(False)
        sim_j.run(until=4.0)
        sim_h = mk(True)
        sim_h.run(until=4.0)
    finally:
        os.environ.pop("MNT_HYBRID_CPU", None)
    assert not getattr(sim_h._plan, "_hybrid_broken", False)
    ez_j = sim_j.get_array(mnt.Ez)
    ez_h = sim_h.get_array(mnt.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)


def test_pair_periodic_complex_phase():
    """Arbitrary-k_x Bloch through the real-pair channel pair: two real
    kernel passes with channel-rotated wrap ghosts/carries must match
    the jnp real-pair stepper."""
    from meep_nl_tpu.ops.pallas import periodicx
    plan = _plan_periodic(kx=0.23)
    plan.real_pair = True
    plan.slab_opt = True
    assert periodicx.pair_periodic_supported(plan)
    ker = periodicx.PairPeriodicXKernel(plan)
    st_j = run(plan, init_state(plan), 40)
    full_k = ker.to_full(ker.run(ker.init_state(), 40))
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=2e-6 * scale, err_msg=f"f[{c}]")
    # the im channel must be live (a complex phase mixes channels)
    assert np.abs(np.asarray(st_j["f"]["ez"])[1]).max() > 1e-4 * scale


def test_pair_periodic_eps_and_source_amp():
    """Complex-phase wrap with an eps structure; the source rides both
    channels (complex amp through the swapped waveform rows)."""
    from meep_nl_tpu.ops.pallas import periodicx
    plan = _plan_periodic(kx=0.37, with_eps=True)
    plan.real_pair = True
    plan.slab_opt = True
    assert periodicx.pair_periodic_supported(plan)
    ker = periodicx.PairPeriodicXKernel(plan)
    st_j = run(plan, init_state(plan), 40)
    full_k = ker.to_full(ker.run(ker.init_state(), 40))
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=2e-6 * scale, err_msg=f"f[{c}]")


def test_pair_periodic_hybrid_sim():
    """Simulation-level: oblique k_point (complex Bloch phase) with the
    real-pair state rides the pair fused path."""
    os.environ["MNT_HYBRID_CPU"] = "1"
    os.environ["MNT_REAL_PAIR"] = "1"

    def mk(use_fused):
        return mnt.Simulation(
            cell_size=mnt.Vector3(3.0, 2.0, 2.0), resolution=8,
            sources=[mnt.Source(mnt.GaussianSource(1.0, fwidth=0.4),
                                component=mnt.Ez,
                                center=mnt.Vector3(0.3, 0, 0))],
            boundary_layers=[mnt.PML(0.5, mnt.Y), mnt.PML(0.5, mnt.Z)],
            k_point=mnt.Vector3(0.23, 0, 0),
            use_fused=use_fused)

    try:
        sim_j = mk(False)
        sim_j.run(until=4.0)
        sim_h = mk(True)
        sim_h.run(until=4.0)
    finally:
        os.environ.pop("MNT_HYBRID_CPU", None)
        os.environ.pop("MNT_REAL_PAIR", None)
    assert not getattr(sim_h._plan, "_hybrid_broken", False)
    ker = getattr(sim_h._plan, "_t2_kernel", None)
    assert ker is not None and type(ker).__name__ in (
        "PairPeriodicGhostT2Kernel",) or (
        ker is not None
        and type(getattr(ker, "_k1", None)).__name__
        == "PairPeriodicXKernel")
    ez_j = sim_j.get_array(mnt.Ez)
    ez_h = sim_h.get_array(mnt.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)


def test_periodic_t2_depth2():
    """Depth-2 temporal fusion across the wrap (halo-in-time): the
    PeriodicXT2Kernel must match the jnp wrap over even AND odd step
    counts, at k=0 and the zone edge, with an eps structure."""
    for kx_lab, kx, eps in (("k0", 0.0, False), ("edge", 0.5 / 3.0, True)):
        plan = _plan_periodic(kx=kx, with_eps=eps)
        plan.slab_opt = True
        assert periodicx.periodic_t2_supported(plan), kx_lab
        ker = periodicx.PeriodicXT2Kernel(plan)
        for nsteps in (40, 31):
            st_j = run(plan, init_state(plan), nsteps)
            full_k = ker.to_full(ker.run(ker.init_state(), nsteps))
            scale = max(float(np.max(np.abs(np.asarray(v))))
                        for v in st_j["f"].values())
            assert scale > 0
            for c in st_j["f"]:
                np.testing.assert_allclose(
                    np.asarray(full_k["f"][c]), np.asarray(st_j["f"][c]),
                    atol=2e-6 * scale,
                    err_msg=f"f[{c}] {kx_lab} n={nsteps}")


def _ghost_compare(plan, nsteps=30, atol=3e-6, depth=None):
    assert periodicx.periodic_ghost_supported(plan)
    ker = periodicx.PeriodicGhostT2Kernel(plan, depth=depth)
    full_k = ker.to_full(ker.run(ker.init_state(), nsteps))
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    num0 = plan.gv.num[0]
    for c in st_j["f"]:
        np.testing.assert_allclose(
            np.asarray(full_k["f"][c])[:num0],
            np.asarray(st_j["f"][c])[:num0],
            atol=atol * scale, err_msg=f"f[{c}]")
    first = float(np.abs(np.asarray(st_j["f"]["ez"][:2])).max())
    assert first > 1e-9 * scale
    return ker


def test_periodic_ghost_k0():
    """Ghost-ring periodic driver (round 5): the PLAIN temporally-fused
    kernel on the Bloch-wrapped extended grid matches the jnp periodic
    stepper — no wrap-strip recompute (ref boundaries.cpp:88)."""
    ker = _ghost_compare(_plan_periodic(kx=0.0))
    assert ker.depth >= 2


def test_periodic_ghost_phase_minus1():
    # half-integer k: wrap phase -1
    res, cells = 8.0, (24, 16, 16)
    kx = 0.5 / (cells[0] / res)
    _ghost_compare(_plan_periodic(kx=kx))


def test_periodic_ghost_eps():
    _ghost_compare(_plan_periodic(with_eps=True))


def test_periodic_ghost_eps_phase_minus1():
    """eps structure + wrap phase -1: coefficients must wrap WITHOUT
    the Bloch phase (only fields/sources carry it) — the case that
    catches a phase-on-coefs mixup."""
    res, cells = 8.0, (24, 16, 16)
    kx = 0.5 / (cells[0] / res)
    _ghost_compare(_plan_periodic(kx=kx, with_eps=True))


def test_periodic_ghost_source_near_wrap():
    """A source within the ghost margin of the wrap gets phase-scaled
    images in the opposite ghost zone; the run stays exact."""
    size = [n / 8.0 for n in (24, 16, 16)]
    gv = G.GridVolume.create("3d", size, 8.0)
    pts = gv.interp_weights("ez", [-size[0] / 2 + 0.15, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps,
                     mnt.GaussianSource(frequency=1.0, fwidth=0.5))
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "yz"],
                        periodic=(True, False, False),
                        bloch_k=(0.0, 0.0, 0.0),
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    _ghost_compare(plan)


def test_periodic_ghost_dispersive():
    """A Lorentz + chi2-NR window INSIDE a periodic cell runs fused
    through the ghost-ring driver (the strip-based periodic kernels are
    linear-only) — gratings with real material models stay fused
    (VERDICT r4 missing #4)."""
    from meep_nl_tpu.stepper.plan import PolSpec
    res, cells = 8.0, (32, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    win = np.zeros(gv.shape)
    win[12:20, 4:12, 4:12] = 1.0
    pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                    sigma={("ex", "x"): 0.2 * win,
                           ("ey", "y"): 0.2 * win,
                           ("ez", "z"): 0.2 * win})]
    chi2 = np.zeros(gv.shape)
    chi2[13:19, 6:10, 6:10] = 0.05
    nr = {c: chi2 for c in ("ex", "ey", "ez")}
    pts = gv.interp_weights("ez", [0.5 - size[0] / 2, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps,
                     mnt.GaussianSource(frequency=1.0, fwidth=0.5))
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=pols,
                                         nr_chi2=nr),
                        pmls=[PMLSpec(d, 0.5) for d in "yz"],
                        periodic=(True, False, False),
                        bloch_k=(0.0, 0.0, 0.0),
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    _ghost_compare(plan, nsteps=24)


def test_pair_periodic_ghost_complex_phase():
    """Arbitrary-k_x Bloch through the PAIR ghost-ring driver: two real
    channels on the Bloch-wrapped extended grid, channel-rotated ghost
    refresh + complex source images, vs the jnp real-pair stepper."""
    from meep_nl_tpu.ops.pallas import periodicx
    plan = _plan_periodic(kx=0.23)
    plan.real_pair = True
    plan.slab_opt = True
    assert periodicx.pair_periodic_ghost_supported(plan)
    ker = periodicx.PairPeriodicGhostT2Kernel(plan)
    st_j = run(plan, init_state(plan), 42)
    full_k = ker.to_full(ker.run(ker.init_state(), 42))
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    num0 = plan.gv.num[0]
    for c in st_j["f"]:
        np.testing.assert_allclose(
            np.asarray(full_k["f"][c])[:, :num0],
            np.asarray(st_j["f"][c])[:, :num0],
            atol=3e-6 * scale, err_msg=f"f[{c}]")
    assert np.abs(np.asarray(st_j["f"]["ez"])[1]).max() > 1e-4 * scale


def test_pair_periodic_ghost_eps_and_source_near_wrap():
    """Complex-phase ghost-ring with an eps structure and a source
    INSIDE the ghost margin of the wrap (phase-rotated images in both
    channels)."""
    from meep_nl_tpu.ops.pallas import periodicx
    plan = _plan_periodic(kx=0.37, with_eps=True, src_x=-1.2)
    plan.real_pair = True
    plan.slab_opt = True
    assert periodicx.pair_periodic_ghost_supported(plan)
    ker = periodicx.PairPeriodicGhostT2Kernel(plan)
    st_j = run(plan, init_state(plan), 40)
    full_k = ker.to_full(ker.run(ker.init_state(), 40))
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    num0 = plan.gv.num[0]
    for c in st_j["f"]:
        np.testing.assert_allclose(
            np.asarray(full_k["f"][c])[:, :num0],
            np.asarray(st_j["f"][c])[:, :num0],
            atol=3e-6 * scale, err_msg=f"f[{c}]")
