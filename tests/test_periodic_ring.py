"""Sharded periodic-x fused stepping (parallel/periodic_ring.py): the
per-shard Mosaic kernel with ring-topology boundary exchange and a
phase-carrying wrap must reproduce the jnp stepper's Bloch wrap.

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
from meep_nl_tpu.parallel import mesh as PM
from meep_nl_tpu.parallel.periodic_ring import (ShardedPeriodicX,
                                                sharded_periodic_supported)


def _plan_periodic(kx=0.0, with_eps=False, res=8.0, cells=(56, 16, 16)):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    chi1inv = {}
    if with_eps:
        cx = 0.5 * (gv.comp_coords("ez", 0)[0] + gv.comp_coords("ez", 0)[-1])
        for c in ("ex", "ey", "ez"):
            e = np.ones(gv.shape)
            xx = gv.comp_coords(c, 0)
            e[np.abs(xx - cx) < size[0] / 6, :, :] = 4.0
            chi1inv[c] = {c[1]: 1.0 / e}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.3, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv=chi1inv),
                        pmls=[PMLSpec(d, 0.5) for d in "yz"],
                        periodic=(True, False, False),
                        bloch_k=(kx, 0.0, 0.0),
                        sources=[src], pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def _compare(plan, nsteps=64, n_shards=4, atol=3e-6):
    assert sharded_periodic_supported(plan, n_shards), "inside envelope"
    mesh = PM.make_mesh(n_shards, shape=(n_shards,))
    sk = ShardedPeriodicX(plan, mesh)
    import jax
    full_k = jax.jit(sk.to_full)(sk.run(sk.init_state(), nsteps))
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")
    # the wrap must actually be live within nsteps
    ez = np.asarray(st_j["f"]["ez"])
    assert np.abs(ez[:2]).max() > 1e-5 * scale


def test_ring_k0():
    _compare(_plan_periodic(kx=0.0))


def test_ring_phase_minus1_eps():
    plan0 = _plan_periodic()
    Lx = plan0.gv.size[0]
    _compare(_plan_periodic(kx=0.5 / Lx, with_eps=True), nsteps=144)


def test_ring_rejects_live_plane_off_last_shard():
    # 24-cell grid pads to 32: span 8, (n-1)*span = 24 > num0-1 = 23
    plan = _plan_periodic(cells=(24, 16, 16))
    assert not sharded_periodic_supported(plan, 4)


def test_sharded_run_routes_periodic_ring():
    plan = _plan_periodic(with_eps=True)
    assert sharded_periodic_supported(plan, 4)
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


def test_pair_ring_oblique_bloch():
    """Arbitrary-k_x Bloch over the shard ring (two real channels with
    2x2 wrap rotations) must match the complex jnp SPMD stepper."""
    from meep_nl_tpu.parallel.periodic_ring import (
        ShardedPairPeriodicX, sharded_pair_periodic_supported)
    kx = 0.22 / 7.0                  # oblique: phase exp(2 pi i kx Lx)
    res, cells = 8.0, (56, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.3, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "yz"],
                        periodic=(True, False, False),
                        bloch_k=(kx, 0.0, 0.0),
                        sources=[SrcVolSpec("ez", idx, amps, src_t)],
                        pad_to_multiple=(8, 1, 1),
                        complex_fields=True)
    plan.real_pair = True
    plan.slab_opt = True
    assert sharded_pair_periodic_supported(plan, 4)
    mesh = PM.make_mesh(4, shape=(4,))
    sk = ShardedPairPeriodicX(plan, mesh)
    nsteps = 96
    import jax
    full_k = jax.jit(sk.to_full)(sk.run(sk.init_state(), nsteps))
    st_j = run(plan, init_state(plan), nsteps)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert scale > 0
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_k["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=4e-6 * scale, err_msg=f"f[{c}]")
    # the wrap is live AND carries a genuinely complex phase: both
    # channels have energy at the re-entry planes
    for ch in (0, 1):
        ez = np.asarray(st_j["f"]["ez"])[ch]
        assert np.abs(ez[:2]).max() > 1e-6 * scale, ch


def test_sharded_run_routes_pair_ring():
    kx = 0.22 / 7.0
    res, cells = 8.0, (56, 16, 16)
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.3, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "yz"],
                        periodic=(True, False, False),
                        bloch_k=(kx, 0.0, 0.0),
                        sources=[SrcVolSpec("ez", idx, amps, src_t)],
                        pad_to_multiple=(8, 1, 1), complex_fields=True)
    plan.real_pair = True
    plan.slab_opt = True
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
