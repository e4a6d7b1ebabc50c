"""Differentiable connectivity constraint for topology optimization
(reference python/adjoint/connectivity.py: a Poisson-solve-based penalty
that keeps the design connected to a seed boundary so it is fabricable).

Physics analogy ("heat method"): treat the design density rho as a heat
conductor, hold the seed edge at temperature 1, add a uniform loss term,
and solve the screened Poisson equation

    div(rho grad u) - alpha^2 u = 0,    u|_seed = 1

with a FIXED number of damped-Jacobi sweeps (a lax.scan, so jax.grad
flows through the solve).  Material that is connected to the seed heats
up (u -> 1); disconnected islands stay cold, so

    penalty = sum rho * (1 - u)^2 / sum rho

is ~0 for connected designs and O(1) for disconnected ones."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def connectivity_penalty(rho: jnp.ndarray, seed: str = "ymin",
                         alpha: float = 0.0, n_iters: int = 3000,
                         rho_min: float = 1e-3) -> jnp.ndarray:
    """Connectivity penalty of a 2D density grid (0..1).

    seed: which edge the structure must connect to
          ('xmin'/'xmax'/'ymin'/'ymax').
    alpha: screening (0 = pure diffusion; small positive values penalize
           long tenuous connections).
    """
    rho = jnp.clip(rho, rho_min, 1.0)
    nx, ny = rho.shape

    def pad_seed(u):
        """Apply boundary conditions: u = 1 on the seed edge, Neumann
        elsewhere (edge replication)."""
        up = jnp.pad(u, 1, mode="edge")
        if seed == "xmin":
            up = up.at[0, :].set(1.0)
        elif seed == "xmax":
            up = up.at[-1, :].set(1.0)
        elif seed == "ymin":
            up = up.at[:, 0].set(1.0)
        elif seed == "ymax":
            up = up.at[:, -1].set(1.0)
        else:
            raise ValueError(seed)
        return up

    # face conductances (harmonic mean of neighboring densities)
    def face(a, b):
        return 2.0 * a * b / (a + b)

    rp = jnp.pad(rho, 1, mode="edge")
    cxm = face(rho, rp[:-2, 1:-1])
    cxp = face(rho, rp[2:, 1:-1])
    cym = face(rho, rp[1:-1, :-2])
    cyp = face(rho, rp[1:-1, 2:])
    diag = cxm + cxp + cym + cyp + alpha ** 2 * rho

    def sweep(u, _):
        up = pad_seed(u)
        num = (cxm * up[:-2, 1:-1] + cxp * up[2:, 1:-1]
               + cym * up[1:-1, :-2] + cyp * up[1:-1, 2:])
        u_new = num / jnp.maximum(diag, 1e-12)
        return u_new, None      # Jacobi sweep

    u0 = jnp.zeros_like(rho)
    u, _ = jax.lax.scan(sweep, u0, None, length=n_iters)
    solid = rho
    return jnp.sum(solid * (1.0 - u) ** 2) / jnp.maximum(
        jnp.sum(solid), 1e-12)
