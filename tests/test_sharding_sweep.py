"""Sharded-correctness sweep: flagship physics 8-shard vs 1-shard.

The reference's bar is running its whole python suite under mpirun
(python/Makefile.am:6-26); the GSPMD analog is that every update family —
dispersion, chi2-Newton, BFAST, cylindrical, multilevel (f_w_prev), noisy
media (rng), monitors, and adjoint gradients — must be invariant under
re-sharding of the grid over the device mesh."""

import numpy as np
import jax
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, PolSpec,
                                      SrcVolSpec, compile_plan)
from meep_nl_tpu.stepper import monitors as M
from meep_nl_tpu.stepper.step import init_state, run, make_step, build_xs
from meep_nl_tpu.parallel import mesh as PM

from helpers import make_point_source


def _compare(plan, nsteps, atol_scale=5e-6, mesh_shape=(8,)):
    state_ref = run(plan, init_state(plan), nsteps)
    mesh = PM.make_mesh(int(np.prod(mesh_shape)), shape=mesh_shape)
    state_sh = PM.sharded_run(plan, mesh, init_state(plan), nsteps)
    # fp32 halo/reduction reorder noise is set by the DOMINANT field scale,
    # so small components are gated against the global scale, not their own
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in state_ref["f"].values())
    assert scale > 0
    for c, ref in state_ref["f"].items():
        ref = np.asarray(ref)
        sh = np.asarray(jax.device_get(state_sh["f"][c]))
        np.testing.assert_allclose(sh, ref, atol=atol_scale * scale,
                                   err_msg=f"component {c}")
    for k, ref in state_ref["dft"].items():
        ref = np.asarray(ref)
        sh = np.asarray(jax.device_get(state_sh["dft"][k]))
        dscale = np.max(np.abs(ref)) or 1.0
        # the DTFT accumulates early-ramp fields whose roundoff is set by
        # the peak FIELD amplitude, so its relative gate is looser
        np.testing.assert_allclose(sh, ref, atol=100 * atol_scale * dscale,
                                   err_msg=f"dft {k}")
    return state_ref, state_sh


def test_flagship_3d_lorentz_chi2nr_pml_flux():
    """The exact dryrun_multichip configuration: 3D uPML + Lorentz ball +
    chi2 Newton + DTFT flux monitor, 8 x-shards vs single device."""
    import __graft_entry__ as GE
    plan = GE._flagship_plan(shape_cells=(32, 16, 16),
                             pad_to_multiple=(8, 1, 1), res=8.0)
    _compare(plan, 160)


def test_bfast_sharded():
    """BFAST flip-flop aux (f_bfast state) under sharding — exercises the
    derived (not hard-coded) sharding pytree."""
    res = 16.0
    gv = G.GridVolume.create("3d", [0.25, 0.25, 8.0], res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ex", [0.0, 0.0, -3.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ex", idx, amps, src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec("z", 1.0)], sources=[src],
                        bloch_k=[0.0, 0.0, 0.0],
                        bfast_scaled_k=(0.5, 0.0, 0.0),
                        courant=0.2, pad_to_multiple=(1, 1, 8))
    state_ref = run(plan, init_state(plan), 60)
    mesh = PM.make_mesh(8, shape=(8,), axis_names=("gx",))
    # shard along z (the only extended axis): mesh axis must map to axis 2
    mesh = PM.make_mesh(8, shape=(1, 1, 8))
    state_sh = PM.sharded_run(plan, mesh, init_state(plan), 60)
    ref = np.asarray(state_ref["f"]["ex"])
    sh = np.asarray(jax.device_get(state_sh["f"]["ex"]))
    scale = np.max(np.abs(ref))
    assert scale > 0
    np.testing.assert_allclose(sh, ref, atol=5e-6 * scale)


def test_cylindrical_sharded():
    """Cylindrical m=1 (complex fields, i*m/r terms) under r-sharding."""
    gv = G.GridVolume.create("cyl", [2.0, 4.0], 16.0)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [1.0, 0.0], src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec("z", 1.0)], sources=[s], m=1,
                        courant=0.4, pad_to_multiple=(8, 1))
    _compare(plan, 50)


def test_multilevel_sharded():
    """Multilevel atoms carry (T,)+grid P stacks, populations N, and
    f_w_prev — all must shard (previously a hard-coded-key crash)."""
    gv = G.GridVolume.create("1d", [16.0], 20.0)
    f0 = 0.7
    shape = gv.shape
    z = gv.comp_coords("ex", 0)
    gain = (np.abs(z) < 3.0).astype(np.float64) * 0.3
    pol = PolSpec(field_type="e", omega0=f0, gamma=0.05,
                  sigma={("ex", "x"): gain},
                  kind="multilevel",
                  ml_Gamma=np.array([[0.0, 0.0], [0.0, 0.0]]),
                  ml_N0=np.array([0.0, 1.0]),
                  ml_alpha=np.array([[1.0], [-1.0]]) * 0.005,
                  ml_omega=np.array([f0]),
                  ml_gamma=np.array([0.05]),
                  ml_sigmat=np.array([[1.0, 1.0, 1.0]]))
    src_t = mnt.GaussianSource(frequency=f0, fwidth=0.1)
    s = make_point_source(gv, "ex", [-5.0], src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=[pol]),
                        pmls=[PMLSpec("z", 1.5)], sources=[s],
                        pad_to_multiple=8)
    state_ref, state_sh = _compare(plan, 80)
    N_ref = np.asarray(state_ref["pol"][0]["N"])
    N_sh = np.asarray(jax.device_get(state_sh["pol"][0]["N"]))
    np.testing.assert_allclose(N_sh, N_ref, atol=1e-7)


def test_noisy_sharded_runs():
    """Noisy media carry an rng key (replicated); the sharded run must
    compile and stay finite.  (Bitwise equality is not required: the
    reference's noise fields are also rank-layout dependent.)"""
    gv = G.GridVolume.create("2d", [4.0, 4.0], 16.0)
    shape = gv.shape
    pol = PolSpec(field_type="e", omega0=0.8, gamma=0.1,
                  sigma={("ez", "z"): np.full(shape, 0.1)},
                  kind="noisy", noise_amp=0.05)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [0.0, 0.0], src_t)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, pols=[pol]),
                        pmls=[PMLSpec("x", 1.0), PMLSpec("y", 1.0)],
                        sources=[s], pad_to_multiple=8)
    mesh = PM.make_mesh(8, shape=(8,))
    state_sh = PM.sharded_run(plan, mesh, init_state(plan), 40)
    ez = np.asarray(jax.device_get(state_sh["f"]["ez"]))
    assert np.all(np.isfinite(ez)) and np.abs(ez).max() > 0


def test_adjoint_gradient_sharded():
    """d(sum Ez^2)/d(source amplitude scale) via jax.grad through the
    sharded scan matches the single-device gradient."""
    gv = G.GridVolume.create("2d", [4.0, 4.0], 16.0)
    eps = np.ones(gv.shape)
    x = gv.comp_coords("ez", 0)
    eps[x > 0.5, :] = 4.0
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    s = make_point_source(gv, "ez", [-1.0, 0.0], src_t)
    plan = compile_plan(gv, mat,
                        pmls=[PMLSpec("x", 1.0), PMLSpec("y", 1.0)],
                        sources=[s], pad_to_multiple=8)
    nsteps = 60
    xs = build_xs(plan, nsteps, 0)
    step = make_step(plan)
    C = plan.coefs

    def loss_single(a):
        st = init_state(plan)
        xs_a = jax.tree.map(lambda v: v * a, xs)

        def body(carry, x):
            return step(carry, x, C), None

        st, _ = jax.lax.scan(body, st, xs_a)
        return (st["f"]["ez"] ** 2).sum()

    g_ref = float(jax.grad(loss_single)(1.0))

    mesh = PM.make_mesh(8, shape=(8,))

    def loss_sharded(a):
        st = init_state(plan)
        sh = PM.state_shardings(plan, mesh, st)
        st = jax.lax.with_sharding_constraint(st, sh)
        xs_a = jax.tree.map(lambda v: v * a, xs)

        def body(carry, x):
            return step(carry, x, C), None

        st, _ = jax.lax.scan(body, st, xs_a)
        return (st["f"]["ez"] ** 2).sum()

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        g_sh = float(jax.jit(jax.grad(loss_sharded))(1.0))
    assert abs(g_sh - g_ref) <= 1e-4 * max(1.0, abs(g_ref)), (g_sh, g_ref)
