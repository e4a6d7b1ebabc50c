"""Differentiable objective quantities (adjoint/objectives.py; analog of
python/adjoint/objective.py EigenmodeCoefficient / FourierFields / LDOS):
the mode-coefficient objective must be differentiable through the time
loop and its gradient must match finite differences."""

import numpy as np
import jax.numpy as jnp
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.adjoint import (DesignRegion, DesignVariables,
                                 OptimizationProblem)
from meep_nl_tpu.adjoint.objectives import (eigenmode_coefficient,
                                            fourier_fields)


def _coupler(beta=0.0):
    """Waveguide with a design region: maximize fundamental-mode
    transmission |a+|^2 (the canonical EigenmodeCoefficient problem)."""
    fcen = 0.6
    wg = mp.Block(size=mp.Vector3(mp.inf, 1.0, mp.inf),
                  material=mp.Medium(epsilon=6.0))
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 6), resolution=10,
        geometry=[wg,
                  mp.Block(size=mp.Vector3(2, 2, mp.inf),
                           center=mp.Vector3(0, 0),
                           material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(-2.8, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    flux = sim.add_flux(fcen, 0.0, 1,
                        mp.FluxRegion(center=mp.Vector3(2.6, 0),
                                      size=mp.Vector3(0, 3)))
    apfn = eigenmode_coefficient(sim, flux, band=1)

    def objective(dfts):
        ap = apfn(dfts)
        return jnp.sum(jnp.abs(ap) ** 2)

    dr = DesignRegion(DesignVariables(shape=(6, 6), eps_min=1.0,
                                      eps_max=9.0, beta=beta),
                      center=[0.0, 0.0], size=[2.0, 2.0])
    return OptimizationProblem(simulation=sim, objective=objective,
                               design_regions=[dr], run_time=35.0)


def test_eigenmode_coefficient_gradient():
    opt = _coupler()
    rng = np.random.RandomState(0)
    rho = 0.5 + 0.2 * rng.rand(6, 6)
    f0, (g,) = opt(jnp.asarray(rho, jnp.float32))
    assert np.isfinite(f0) and f0 > 0
    for idx in [(2, 2), (4, 1)]:
        fd = opt.calculate_fd_gradient(rho, idx, drho=1e-3)
        assert abs(g[idx] - fd) <= 0.08 * max(abs(fd), 1e-6), (
            idx, float(g[idx]), fd)


def test_optimization_improves_mode_coupling():
    opt = _coupler()
    rng = np.random.RandomState(2)
    rho = jnp.asarray(0.4 + 0.2 * rng.rand(6, 6), jnp.float32)
    f0, (g,) = opt(rho)
    ghat = g / (jnp.abs(g).max() + 1e-30)
    for step in (0.3, 0.1, 0.03):
        f1, _ = opt(jnp.clip(rho + step * ghat, 0, 1),
                    need_gradient=False)
        if f1 > f0:
            break
    assert f1 > f0, (f0, f1)


def test_fourier_fields_objective():
    fcen = 0.6
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 4), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(2, 2, mp.inf),
                           center=mp.Vector3(0, 0),
                           material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(-2.0, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    dft = sim.add_dft_fields([mp.Ez], fcen, 0, 1,
                             center=mp.Vector3(2.0, 0),
                             size=mp.Vector3(0, 1))
    fldfn = fourier_fields(sim, dft, mp.Ez)

    def objective(dfts):
        return jnp.sum(jnp.abs(fldfn(dfts)) ** 2)

    dr = DesignRegion(DesignVariables(shape=(4, 4), eps_min=1.0,
                                      eps_max=9.0),
                      center=[0.0, 0.0], size=[2.0, 2.0])
    opt = OptimizationProblem(simulation=sim, objective=objective,
                              design_regions=[dr], run_time=25.0)
    rho = jnp.full((4, 4), 0.5, jnp.float32)
    f0, (g,) = opt(rho)
    assert np.isfinite(f0) and f0 > 0
    fd = opt.calculate_fd_gradient(np.asarray(rho), (1, 2), drho=1e-3)
    assert abs(g[1, 2] - fd) <= 0.08 * max(abs(fd), 1e-6)


def test_near2far_objective_matches_host_farfield():
    """The differentiable near2far objective's weights must reproduce the
    host get_farfield path exactly (same Green's functions, fp32 dfts)."""
    from meep_nl_tpu.adjoint.objectives import near2far_fields

    fcen = 0.6
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 4), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(1, 1, mp.inf),
                           material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(-2.0, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    n2f = sim.add_near2far(fcen, 0.1, 3,
                           mp.Near2FarRegion(center=mp.Vector3(2.0, 0),
                                             size=mp.Vector3(0, 2)))
    far_pts = [mp.Vector3(30.0, 4.0), mp.Vector3(25.0, -10.0)]
    fn = near2far_fields(sim, n2f, far_pts)
    sim.run(until=40.0)
    EH = np.asarray(fn(sim._state["dft"]))
    for i, p in enumerate(far_pts):
        ref = sim.get_farfield(n2f, p)
        np.testing.assert_allclose(EH[i], ref, rtol=2e-5,
                                   atol=2e-5 * np.abs(ref).max())


def test_near2far_objective_gradient():
    """d|E_far|^2/drho through the time loop vs finite differences
    (the Near2FarFields inverse-design setting, objective.py:435)."""
    from meep_nl_tpu.adjoint.objectives import near2far_fields

    fcen = 0.6
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 4), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(2, 2, mp.inf),
                           material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(-2.0, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    n2f = sim.add_near2far(fcen, 0.0, 1,
                           mp.Near2FarRegion(center=mp.Vector3(2.0, 0),
                                             size=mp.Vector3(0, 2)))
    fldfn = near2far_fields(sim, n2f, [mp.Vector3(40.0, 0.0)])

    def objective(dfts):
        EH = fldfn(dfts)
        return jnp.sum(jnp.abs(EH[:, 2, :]) ** 2)   # |Ez_far|^2

    dr = DesignRegion(DesignVariables(shape=(4, 4), eps_min=1.0,
                                      eps_max=9.0),
                      center=[0.0, 0.0], size=[2.0, 2.0])
    opt = OptimizationProblem(simulation=sim, objective=objective,
                              design_regions=[dr], run_time=25.0)
    rho = jnp.full((4, 4), 0.5, jnp.float32)
    f0, (g,) = opt(rho)
    assert np.isfinite(f0) and f0 > 0
    fd = opt.calculate_fd_gradient(np.asarray(rho), (1, 2), drho=1e-3)
    assert abs(g[1, 2] - fd) <= 0.08 * max(abs(fd), 1e-6), (float(g[1, 2]), fd)


def test_connectivity_penalty():
    """Connectivity constraint (adjoint/connectivity.py; reference
    python/adjoint/connectivity.py): connected designs ~0, disconnected
    islands penalized, differentiable."""
    import jax
    from meep_nl_tpu.adjoint.connectivity import connectivity_penalty

    n = 24
    rho_c = np.full((n, n), 0.01)
    rho_c[10:14, :] = 1.0            # bar reaching the ymin seed
    rho_d = np.full((n, n), 0.01)
    rho_d[10:14, 12:20] = 1.0        # floating island
    pc = float(connectivity_penalty(jnp.asarray(rho_c), seed="ymin"))
    pd = float(connectivity_penalty(jnp.asarray(rho_d), seed="ymin"))
    assert pc < 0.05 and pd > 0.3 and pd > 100 * pc, (pc, pd)
    # screening sharpens the contrast (suppresses leakage through the
    # low-density background)
    pds = float(connectivity_penalty(jnp.asarray(rho_d), seed="ymin",
                                     alpha=0.5))
    assert pds > pd
    g = jax.grad(lambda r: connectivity_penalty(r, seed="ymin"))(
        jnp.asarray(rho_d))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
