"""Run-cache probe identity (ADVICE r2 high): two different probes with the
same auto-generated name and block length must not collide on a cached
jitted runner (stepper/step.py run cache)."""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import MaterialSpec, SrcVolSpec, compile_plan
from meep_nl_tpu.stepper import step as S


def _plan():
    gv = G.GridVolume.create("2d", [4.0, 4.0], 10)
    src_t = mp.GaussianSource(frequency=0.8, fwidth=0.4)
    pts = gv.interp_weights("ez", [0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    return compile_plan(gv, MaterialSpec(chi1inv={}),
                        sources=[SrcVolSpec("ez", idx, amps, src_t)])


def test_same_name_different_probe_not_cached():
    plan = _plan()
    st = S.init_state(plan)
    p1 = S.ProbeSpec("hm0", "ez", np.array([[20, 20]], np.int32),
                     np.array([1.0]))
    p2 = S.ProbeSpec("hm0", "ez", np.array([[25, 30]], np.int32),
                     np.array([1.0]))
    _, ys1 = S.run(plan, st, 24, probes=[p1], t0=0)
    _, ys2 = S.run(plan, st, 24, probes=[p2], t0=0)
    a, b = np.asarray(ys1["hm0"]), np.asarray(ys2["hm0"])
    assert np.abs(a).max() > 0
    assert not np.array_equal(a, b)


def test_identical_probe_reuses_cache():
    plan = _plan()
    st = S.init_state(plan)
    p = S.ProbeSpec("hm0", "ez", np.array([[20, 20]], np.int32),
                    np.array([1.0]))
    S.run(plan, st, 24, probes=[p], t0=0)
    n = len(plan._run_cache)
    S.run(plan, st, 24, probes=[p], t0=0)
    assert len(plan._run_cache) == n
