"""Nonlinear media: chi3 Kerr (Pade) third-harmonic generation and the fork's
full-tensor chi2 Newton-Raphson E-from-D inversion.

Analogs: tests/harmonics.cpp, python/tests/test_3rd_harm_1d.py, and
newton_raphson.cpp's coupled quadratic system."""

import os

import numpy as np
import jax.numpy as jnp

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, make_step, run
from meep_nl_tpu.stepper import monitors as M

from helpers import make_point_source

LIVE_1D = ["ex", "hy"]


def thg_amplitude(chi3_val, amp):
    """1d Kerr medium: DTFT |Ex| at f0 and 3*f0 downstream of the source."""
    res = 40.0
    gv = G.GridVolume.create("1d", [12.0], res)
    f0 = 1.0 / 3.0
    src_t = mnt.GaussianSource(frequency=f0, fwidth=f0 / 20.0)
    s = make_point_source(gv, "ex", [-4.0], src_t, amplitude=amp)
    chi3 = np.full(gv.shape, chi3_val)
    mat = MaterialSpec(chi1inv={}, chi3={"ex": chi3})
    freqs = np.array([f0, 3 * f0])
    specs = M.field_specs(gv, "probe", "ex", [4.0], [0.0], freqs)
    plan = compile_plan(gv, mat, pmls=[PMLSpec("z", 2.0)], sources=[s],
                        dfts=specs)
    st = init_state(plan)
    st = run(plan, st, int((src_t.last_time() + 20.0) / plan.dt))
    from meep_nl_tpu.stepper.step import dft_view
    d = np.asarray(dft_view(np.asarray(st["dft"]["probe"])))
    d = d.reshape(-1, 2).sum(axis=0)
    return np.abs(d)


def test_thg_scales_linearly_with_chi3():
    """|E(3f0)| scales linearly in chi3 (for fixed pump, weak conversion) -
    the reference's harmonics.cpp:150 check."""
    a1 = thg_amplitude(1e-3, 1.0)
    a2 = thg_amplitude(2e-3, 1.0)
    # fundamental barely changed
    np.testing.assert_allclose(a1[0], a2[0], rtol=1e-3)
    # third harmonic doubled
    assert a1[1] > 0
    np.testing.assert_allclose(a2[1] / a1[1], 2.0, rtol=0.05)


def test_thg_cubic_in_pump():
    """|E(3f0)| scales as pump amplitude cubed."""
    a1 = thg_amplitude(1e-3, 1.0)
    a2 = thg_amplitude(1e-3, 2.0)
    np.testing.assert_allclose(a2[1] / a1[1], 8.0, rtol=0.1)


def test_no_chi3_no_harmonic():
    a = thg_amplitude(0.0, 1.0)
    assert a[1] < a[0] * 1e-4


def test_nr_chi2_inversion_in_step():
    """Run one step with a hand-planted D field in a chi2 (zinc-blende)
    medium and verify the NR branch solved D = eps*E + chi2*(E x E cyclic)
    (newton_raphson.cpp equations at :146)."""
    gv = G.GridVolume.create("3d", [1.0, 1.0, 1.0], 8.0)
    eps_val, chi2_val = 4.0, 0.5
    eps = np.full(gv.shape, eps_val)
    chi1inv = {c: {c[1]: 1.0 / eps} for c in ["ex", "ey", "ez"]}
    nr = {c: np.full(gv.shape, chi2_val) for c in ["ex", "ey", "ez"]}
    mat = MaterialSpec(chi1inv=chi1inv, nr_chi2=nr)
    plan = compile_plan(gv, mat)
    st = init_state(plan)
    # plant spatially uniform D (so the neighbor averages are trivial)
    Dx, Dy, Dz = 0.3, -0.2, 0.25
    f = dict(st["f"])
    f["dx"] = jnp.full(gv.shape, Dx)
    f["dy"] = jnp.full(gv.shape, Dy)
    f["dz"] = jnp.full(gv.shape, Dz)
    st = {**st, "f": f}
    step = make_step(plan)
    from meep_nl_tpu.stepper.step import build_xs
    xs = build_xs(plan, 1)
    xs1 = {k: v[0] for k, v in xs.items()}
    st = step(st, xs1)
    # interior point, away from masked boundaries
    pt = (4, 4, 4)
    Ex = float(st["f"]["ex"][pt])
    Ey = float(st["f"]["ey"][pt])
    Ez = float(st["f"]["ez"][pt])
    # the curl of H=0 leaves D unchanged; E must satisfy the quadratic system
    np.testing.assert_allclose(eps_val * Ex + chi2_val * Ey * Ez, Dx, rtol=1e-5)
    np.testing.assert_allclose(eps_val * Ey + chi2_val * Ex * Ez, Dy, rtol=1e-5)
    np.testing.assert_allclose(eps_val * Ez + chi2_val * Ex * Ey, Dz, rtol=1e-5)
    # and differs measurably from the linear solution
    assert abs(Ex - Dx / eps_val) > 1e-5


def test_nr_chi2_zero_matches_linear():
    """With chi2 == 0 the NR branch must reduce exactly to E = D/eps."""
    gv = G.GridVolume.create("3d", [1.0, 1.0, 1.0], 8.0)
    eps = np.full(gv.shape, 2.0)
    chi1inv = {c: {c[1]: 1.0 / eps} for c in ["ex", "ey", "ez"]}
    nr = {c: np.zeros(gv.shape) for c in ["ex", "ey", "ez"]}
    mat = MaterialSpec(chi1inv=chi1inv, nr_chi2=nr)
    plan = compile_plan(gv, mat)
    st = init_state(plan)
    f = dict(st["f"])
    f["dz"] = jnp.full(gv.shape, 0.5)
    st = {**st, "f": f}
    from meep_nl_tpu.stepper.step import build_xs
    xs = build_xs(plan, 1)
    st = make_step(plan)(st, {k: v[0] for k, v in xs.items()})
    assert abs(float(st["f"]["ez"][4, 4, 4]) - 0.25) < 1e-6


def test_nr_iteration_margin():
    """The fixed 3-step Newton default (from the perturbative seed,
    error O(r^2)) reaches fp32 roundoff up to an NL correction
    chi2 E / eps ~ 0.2 — far beyond physical chi2 FDTD operating
    points: 3 vs 24 iterations agree to fp32 eps and satisfy the
    quadratic system (the reference's adaptive 1e-8 tolerance,
    newton_raphson.cpp:30).  Beyond ~0.3 Newton fails to converge at
    ANY iteration count (the coupled quadratic loses its perturbative
    root), so extra fixed iterations buy nothing there either."""
    import meep_nl_tpu.stepper.step as S

    eps = jnp.full((8, 8), 1.0)
    chi2 = jnp.full((8, 8), 1.0)
    A1 = jnp.full((8, 8), 0.20)
    A2 = jnp.full((8, 8), -0.17)
    A3 = jnp.full((8, 8), 0.23)
    seeds = (A1 / eps, A2 / eps, A3 / eps)

    def solve(iters):
        old = os.environ.get("MNT_NR_ITERS")
        os.environ["MNT_NR_ITERS"] = str(iters)
        try:
            return S._nr_solve(A1, A2, A3, eps, chi2, *seeds)
        finally:
            if old is None:
                os.environ.pop("MNT_NR_ITERS", None)
            else:
                os.environ["MNT_NR_ITERS"] = old

    x3, y3, z3 = [np.asarray(v) for v in solve(3)]
    x24, y24, z24 = [np.asarray(v) for v in solve(24)]
    # ratio check: this configuration is genuinely strong
    ratio = float(chi2[0, 0] * abs(x24[0, 0]) / eps[0, 0])
    assert ratio > 0.15, ratio
    for a, b in ((x3, x24), (y3, y24), (z3, z24)):
        np.testing.assert_allclose(a, b, rtol=3e-7, atol=3e-7)
    # residual of the quadratic system at the 3-iter solution
    r1 = np.abs(eps * x3 + chi2 * y3 * z3 - A1).max()
    r2 = np.abs(eps * y3 + chi2 * x3 * z3 - A2).max()
    r3 = np.abs(eps * z3 + chi2 * x3 * y3 - A3).max()
    assert max(r1, r2, r3) < 5e-7, (r1, r2, r3)
