"""Inverse design of a waveguide coupler by gradient ascent (reference
python/adjoint examples): maximize the fundamental-mode transmission
|a+|^2 through a 2x2 design region with jax.grad flowing through the
full FDTD time loop."""

import numpy as np
import jax.numpy as jnp
import meep_nl_tpu as mp
from meep_nl_tpu.adjoint import (DesignRegion, DesignVariables,
                                 OptimizationProblem,
                                 eigenmode_coefficient)


def main(iters=5):
    fcen = 0.6
    wg = mp.Block(size=mp.Vector3(mp.inf, 1.0, mp.inf),
                  material=mp.Medium(epsilon=6.0))
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 6), resolution=10,
        geometry=[wg, mp.Block(size=mp.Vector3(2, 2, mp.inf),
                               material=mp.Medium(epsilon=6.0))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(-2.8, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    flux = sim.add_flux(fcen, 0.0, 1,
                        mp.FluxRegion(center=mp.Vector3(2.6, 0),
                                      size=mp.Vector3(0, 3)))
    apfn = eigenmode_coefficient(sim, flux, band=1)
    opt = OptimizationProblem(
        simulation=sim,
        objective=lambda d: jnp.sum(jnp.abs(apfn(d)) ** 2),
        design_regions=[DesignRegion(
            DesignVariables(shape=(8, 8), eps_min=1.0, eps_max=9.0),
            center=[0, 0], size=[2, 2])],
        run_time=35.0)

    rho = jnp.full((8, 8), 0.5, jnp.float32)
    for it in range(iters):
        f, (g,) = opt(rho)
        print(f"iter {it}: |a+|^2 = {float(f):.5f}")
        step = 0.15
        for _ in range(4):            # backtracking line search
            trial = jnp.clip(rho + step * g / (jnp.abs(g).max() + 1e-30),
                             0, 1)
            f2, _ = opt(trial, need_gradient=False)
            if f2 > f:
                rho = trial
                break
            step /= 3
    f_final, _ = opt(rho, need_gradient=False)
    print(f"final: |a+|^2 = {float(f_final):.5f}")
    return rho


if __name__ == "__main__":
    main()
