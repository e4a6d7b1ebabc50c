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
