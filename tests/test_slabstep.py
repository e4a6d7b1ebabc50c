"""Slab-stored stepper (stepper/slabstep.py) vs the uniform stepper.

Starting from zero fields (where the slab invariants fu == f and
E == u*D hold exactly), a driven run must produce identical E/H fields:
the slab mode is a storage refactor, not an approximation."""

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, make_step, build_xs


def _run(chi1inv, nsteps=30, dims=(2.0, 2.0, 2.0), res=8.0):
    gv = G.GridVolume.create("3d", list(dims), res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.1, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    kw = dict(pmls=[PMLSpec(d, 0.5) for d in "xyz"],
              sources=[SrcVolSpec("ez", idx, amps, src_t)],
              pad_to_multiple=(4, 4, 8))
    p_ref = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), **kw)
    p_slab = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), **kw)
    p_slab.slab_store = True
    from meep_nl_tpu.stepper.slabstep import slab_supported
    assert slab_supported(p_slab)

    out = []
    for plan in (p_ref, p_slab):
        step = make_step(plan)
        xs = build_xs(plan, nsteps)
        st = init_state(plan)
        for n in range(nsteps):
            x1 = {k: v[n] for k, v in xs.items()}
            st = step(st, x1, plan.coefs)
        out.append(st)
    return out


def _compare_eh(s_ref, s_slab):
    sc = max(np.abs(np.asarray(s_ref["f"][c])).max()
             for c in ("ex", "ey", "ez"))
    assert sc > 1e-6
    for c in ("ex", "ey", "ez", "hx", "hy", "hz"):
        a = np.asarray(s_ref["f"][c])
        b = np.asarray(s_slab["f"][c])
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * sc,
                                   err_msg=c)


def test_vacuum_matches_uniform():
    _compare_eh(*_run({}))


def test_uniform_dielectric_matches():
    gv = G.GridVolume.create("3d", [2.0, 2.0, 2.0], 8.0)
    chi1inv = {}
    for c in ("ex", "ey", "ez"):
        n = [gv.num[a] + 1 for a in range(3)]
        chi1inv[c] = {c[1]: np.full(n, 0.25)}
    _compare_eh(*_run(chi1inv))


def test_heterogeneous_falls_back():
    """Spatially varying u is outside the envelope; plan must fall back."""
    gv = G.GridVolume.create("3d", [2.0, 2.0, 2.0], 8.0)
    n = [gv.num[a] + 1 for a in range(3)]
    arr = np.ones(n)
    arr[: n[0] // 2] = 0.25
    chi1inv = {"ez": {"z": arr}}
    plan = compile_plan(gv, MaterialSpec(chi1inv=chi1inv),
                        pmls=[PMLSpec(d, 0.5) for d in "xyz"], sources=[])
    plan.slab_store = True
    from meep_nl_tpu.stepper.slabstep import slab_supported
    assert not slab_supported(plan)
    make_step(plan)  # builds the uniform step without raising
    st = init_state(plan)
    assert "dz" in st["f"]  # uniform layout


def test_flux_through_simulation_api():
    """End-to-end: flux conservation with slab_store through Simulation."""
    import meep_nl_tpu as mp

    def run(slab):
        sim = mp.Simulation(
            cell_size=mp.Vector3(2.5, 2.5, 2.5), resolution=8,
            sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.4),
                               component=mp.Ez, center=mp.Vector3())],
            boundary_layers=[mp.PML(0.5)], eps_averaging=False)
        fl = sim.add_flux(1.0, 0.2, 3, mp.FluxRegion(
            center=mp.Vector3(0.6, 0, 0), size=mp.Vector3(0, 1.2, 1.2)))
        sim.init_sim()
        if slab:
            sim._plan.slab_store = True
            from meep_nl_tpu.stepper import step as S
            sim._state = S.init_state(sim._plan)
        sim.run(until=25)
        return np.array(sim.get_fluxes(fl))

    f_ref = run(False)
    f_slab = run(True)
    np.testing.assert_allclose(f_slab, f_ref, rtol=1e-4)
