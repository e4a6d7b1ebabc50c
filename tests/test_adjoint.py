"""Adjoint gradients vs finite differences (BASELINE config 5 pattern;
analog of python/tests/test_adjoint_solver.py)."""

import numpy as np
import jax.numpy as jnp

import meep_nl_tpu as mp
from meep_nl_tpu.adjoint import (DesignRegion, DesignVariables,
                                 OptimizationProblem, filters)


def _problem(beta=0.0, **dv_kw):
    """Small 2D transmission-maximization problem with a 6x6 design grid."""
    fcen, df = 0.8, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 6), resolution=10,
        geometry=[
            # placeholder over the design region so eps rows exist
            mp.Block(size=mp.Vector3(2, 2, mp.inf), center=mp.Vector3(0, 0),
                     material=mp.Medium(epsilon=6.0)),
        ],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3(-2.5, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    flux = sim.add_flux(fcen, 0.0, 1,
                        mp.FluxRegion(center=mp.Vector3(2.5, 0),
                                      size=mp.Vector3(0, 2)))

    def objective(dfts):
        # transmitted power at the single frequency (flux assembly inline,
        # must be jnp for autodiff)
        total = 0.0
        for i in range(2):
            ekey, hkey = f"{flux.name}:0:e{i}", f"{flux.name}:0:h{i}"
            if ekey not in dfts:
                continue
            total = total + jnp.sum(
                jnp.real(dfts[ekey] * jnp.conj(dfts[hkey])))
        return total

    dr = DesignRegion(DesignVariables(shape=(6, 6), eps_min=1.0, eps_max=9.0,
                                      beta=beta, **dv_kw),
                      center=[0.0, 0.0], size=[2.0, 2.0])
    opt = OptimizationProblem(simulation=sim, objective=objective,
                              design_regions=[dr], run_time=30.0)
    return opt


def test_gradient_matches_finite_difference():
    opt = _problem()
    rng = np.random.RandomState(0)
    rho = 0.4 + 0.2 * rng.rand(6, 6)
    f0, (g,) = opt(jnp.asarray(rho, jnp.float32))
    assert np.isfinite(f0) and f0 > 0
    assert g.shape == (6, 6)
    # compare a handful of entries against central differences
    for idx in [(1, 1), (3, 2), (4, 4)]:
        fd = opt.calculate_fd_gradient(rho, idx, drho=3e-3)
        # measured agreement is ~0.01-0.1% (central FD); gate at 1%
        assert abs(g[idx] - fd) <= 0.01 * max(abs(fd), 1e-6), (idx, g[idx], fd)


def test_gradient_through_filter_and_projection():
    opt = _problem()
    rng = np.random.RandomState(1)
    rho0 = 0.5 + 0.1 * rng.rand(6, 6)

    import jax

    def J(r):
        r = filters.tanh_projection(r, beta=4.0)
        return opt._J(r)

    g = jax.grad(J)(jnp.asarray(rho0, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    # chain rule direction check against FD through the same composition
    idx = (2, 3)
    dr = 1e-3
    rp = rho0.copy(); rp[idx] += dr
    rm = rho0.copy(); rm[idx] -= dr
    fd = (float(J(jnp.asarray(rp, jnp.float32)))
          - float(J(jnp.asarray(rm, jnp.float32)))) / (2 * dr)
    assert abs(float(g[idx]) - fd) <= 0.01 * max(abs(fd), 1e-6)


def test_damping_gradient_and_absorption():
    """MaterialGrid damping (epsilon_material_grid, meepgeom.cpp:623-626):
    sigma = damping*u*(1-u) absorbs at gray densities, and the AD
    gradient through the conductivity chain matches finite differences."""
    fcen = 0.8
    opt0 = _problem(beta=2.0)
    optd = _problem(beta=2.0, damping=0.3 * 2 * np.pi * fcen)
    rho = np.full((6, 6), 0.5)
    f_plain, _ = opt0(jnp.asarray(rho, jnp.float32), need_gradient=False)
    f_damped, (g,) = optd(jnp.asarray(rho, jnp.float32))
    # gray design + damping absorbs: transmission strictly below undamped
    assert f_damped < 0.98 * f_plain, (f_damped, f_plain)
    rng = np.random.RandomState(3)
    rho = 0.35 + 0.3 * rng.rand(6, 6)
    f0, (g,) = optd(jnp.asarray(rho, jnp.float32))
    for idx in [(1, 1), (4, 3)]:
        fd = optd.calculate_fd_gradient(rho, idx, drho=3e-3)
        assert abs(g[idx] - fd) <= 0.02 * max(abs(fd), 1e-6), (idx, g[idx], fd)


def test_do_averaging_gradient():
    """do_averaging routes through the subpixel-smoothed projection
    (differentiable analog of the reference's do_averaging fallback,
    meepgeom.cpp:1083): gradients stay finite/accurate at steep beta."""
    opt = _problem(beta=16.0, do_averaging=True)
    rng = np.random.RandomState(5)
    rho = 0.35 + 0.3 * rng.rand(6, 6)
    f0, (g,) = opt(jnp.asarray(rho, jnp.float32))
    assert np.isfinite(f0) and np.all(np.isfinite(np.asarray(g)))
    for idx in [(2, 2), (3, 4)]:
        fd = opt.calculate_fd_gradient(rho, idx, drho=3e-3)
        assert abs(g[idx] - fd) <= 0.03 * max(abs(fd), 1e-5), (idx, g[idx], fd)
