"""Re-sharding invariance: the same simulation on 1 vs N shards must agree
(the analog of the reference's num_chunks>1 serial tests, test_chunks.py)."""

import numpy as np
import jax

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import MaterialSpec, PMLSpec, compile_plan
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.parallel import mesh as PM

from helpers import make_point_source, vacuum_mat


def _setup(res=16.0):
    gv = G.GridVolume.create("2d", [6.0, 6.0], res)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.3, -0.2], src)
    # heterogeneous: an eps=4 block and PML, so shards see different materials
    eps = np.ones(gv.shape)
    x = gv.comp_coords("ez", 0)
    y = gv.comp_coords("ez", 1)
    eps[np.ix_(x > 1.0, y > 0.5)] = 4.0
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    plan = compile_plan(gv, mat, pmls=[PMLSpec("x", 1.0), PMLSpec("y", 1.0)],
                        sources=[s], pad_to_multiple=8)
    return plan


def test_eight_shards_match_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    plan = _setup()
    nsteps = 120

    state_ref = run(plan, init_state(plan), nsteps)

    mesh = PM.make_mesh(8, shape=(8,))
    state_sh = PM.sharded_run(plan, mesh, init_state(plan), nsteps)

    ez_ref = np.asarray(state_ref["f"]["ez"])
    ez_sh = np.asarray(jax.device_get(state_sh["f"]["ez"]))
    scale = np.max(np.abs(ez_ref))
    assert scale > 0
    np.testing.assert_allclose(ez_sh, ez_ref, atol=2e-6 * scale)


def test_2d_mesh_decomposition():
    plan = _setup()
    nsteps = 60
    state_ref = run(plan, init_state(plan), nsteps)
    mesh = PM.make_mesh(8, shape=(4, 2))
    state_sh = PM.sharded_run(plan, mesh, init_state(plan), nsteps)
    ez_ref = np.asarray(state_ref["f"]["ez"])
    ez_sh = np.asarray(jax.device_get(state_sh["f"]["ez"]))
    scale = np.max(np.abs(ez_ref))
    np.testing.assert_allclose(ez_sh, ez_ref, atol=2e-6 * scale)
