"""3D eigenmode-coefficient adjoint objective: gradient vs central FD
(objective.py:157 EigenmodeCoefficient in 3D; mpb.cpp:925 overlaps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.adjoint import (DesignRegion, DesignVariables,
                                 OptimizationProblem)
from meep_nl_tpu.adjoint.objectives import eigenmode_coefficient


def _problem3d():
    fcen = 0.6
    wg = mp.Medium(epsilon=6.0)
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 3, 3), resolution=8,
        geometry=[
            mp.Block(size=mp.Vector3(mp.inf, 0.8, 0.8), center=mp.Vector3(),
                     material=wg),
            # placeholder over the design region so eps rows exist
            mp.Block(size=mp.Vector3(1.0, 1.5, 1.5), center=mp.Vector3(0, 0),
                     material=mp.Medium(epsilon=4.0)),
        ],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ey, center=mp.Vector3(-2.0, 0, 0),
                           size=mp.Vector3(0, 1.6, 1.6))],
        boundary_layers=[mp.PML(0.75)])
    flux = sim.add_flux(fcen, 0.0, 1,
                        mp.FluxRegion(center=mp.Vector3(2.0, 0, 0),
                                      size=mp.Vector3(0, 1.6, 1.6)))
    sim.init_sim()
    coeff = eigenmode_coefficient(sim, flux, band=1, forward=True)

    def objective(dfts):
        a = coeff(dfts)
        return jnp.sum(jnp.abs(a) ** 2)

    dr = DesignRegion(DesignVariables(shape=(4, 4), eps_min=1.0,
                                      eps_max=8.0, beta=0.0),
                      center=[0.0, 0.0, 0.0], size=[1.0, 1.5, 0.0])
    opt = OptimizationProblem(simulation=sim, objective=objective,
                              design_regions=[dr], run_time=35.0)
    return opt


@pytest.mark.slow
def test_eigenmode_coefficient_3d_gradient_vs_fd():
    opt = _problem3d()
    rng = np.random.RandomState(3)
    rho = 0.45 + 0.1 * rng.rand(4, 4)
    f0, (g,) = opt(jnp.asarray(rho, jnp.float32))
    assert np.isfinite(f0) and f0 > 0
    for idx in [(1, 1), (2, 3)]:
        # drho balances fp32 objective roundoff (~1e-7 relative) against
        # truncation; 6e-3 keeps the central-difference noise below the 1%
        # gate for this ~1e-3-scale gradient
        fd = opt.calculate_fd_gradient(rho, idx, drho=6e-3)
        assert abs(float(g[idx]) - fd) <= 0.01 * max(abs(fd), 1e-9), \
            (idx, float(g[idx]), fd)


def test_eigenmode_coefficient_3d_forward_dominates():
    """Physics sanity at low cost: with the waveguide driven from the left,
    |a+|^2 >> |a-|^2 on a monitor right of the source."""
    fcen = 0.6
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 3, 3), resolution=8,
        geometry=[mp.Block(size=mp.Vector3(mp.inf, 0.8, 0.8),
                           center=mp.Vector3(), material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ey, center=mp.Vector3(-2.0, 0, 0),
                           size=mp.Vector3(0, 1.6, 1.6))],
        boundary_layers=[mp.PML(0.75)])
    flux = sim.add_flux(fcen, 0.0, 1,
                        mp.FluxRegion(center=mp.Vector3(2.0, 0, 0),
                                      size=mp.Vector3(0, 1.6, 1.6)))
    sim.init_sim()
    fwd = eigenmode_coefficient(sim, flux, band=1, forward=True)
    bwd = eigenmode_coefficient(sim, flux, band=1, forward=False)
    sim.run(until=35)
    dfts = sim.fields_state["dft"]
    ap = float(jnp.abs(fwd(dfts))[0])
    am = float(jnp.abs(bwd(dfts))[0])
    assert ap > 0
    assert ap > 5 * am, (ap, am)
