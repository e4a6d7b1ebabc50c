"""The slab-local PML chain optimization is mathematically exact; numerically
it differs from the uniform path only by fp32 rounding (the uniform path
computes the interior delta via the (fu+dfl)-fu detour)."""

import dataclasses
import numpy as np

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, compile_plan)
from meep_nl_tpu.stepper.step import init_state, run

from helpers import make_point_source, vacuum_mat


def _run(slab_opt, dim, size, res, nsteps):
    gv = G.GridVolume.create(dim, size, res)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    comp = "ex" if dim == "1d" else "ez"
    pt = [0.3] if dim == "1d" else [0.3, -0.2][:gv.ndim] + [0.0] * (gv.ndim - 2)
    s = make_point_source(gv, comp, pt[:gv.ndim], src)
    eps = np.ones(gv.shape)
    if gv.ndim >= 2:
        eps[tuple(slice(n // 3, n // 2) for n in gv.shape)] = 4.0
    mat = MaterialSpec(chi1inv={comp: {comp[1]: 1.0 / eps}})
    pmls = [PMLSpec(d, 1.0) for d in gv.axes]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[s])
    plan.slab_opt = slab_opt
    st = init_state(plan)
    st = run(plan, st, nsteps)
    return {k: np.asarray(v) for k, v in st["f"].items()}


def _compare(a, b):
    # components that are zero by symmetry carry only roundoff noise, so
    # tolerances are relative to the global field scale
    scale = max(np.abs(v).max() for v in b.values())
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-4 * scale, err_msg=k)


def test_slab_opt_exact_2d():
    _compare(_run(True, "2d", [6.0, 5.0], 10.0, 150),
             _run(False, "2d", [6.0, 5.0], 10.0, 150))


def test_slab_opt_exact_3d():
    # run long enough for developed fields (early-time leading-edge values
    # are cancellation-dominated and roundoff looks large relatively)
    _compare(_run(True, "3d", [3.0, 3.0, 3.0], 8.0, 150),
             _run(False, "3d", [3.0, 3.0, 3.0], 8.0, 150))


def test_slab_opt_exact_1d():
    _compare(_run(True, "1d", [8.0], 16.0, 200),
             _run(False, "1d", [8.0], 16.0, 200))
