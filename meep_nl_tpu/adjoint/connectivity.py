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


def constraint_connectivity(rho=None, nx=None, ny=None, nz=None,
                            cond_v: float = 1.0, cond_s: float = 1e4,
                            src_v: float = 0.0, src_s: float = 1.0,
                            solver_option: int = 0, thresh: float = 50.0,
                            p: float = 3.0, need_grad: bool = True):
    """Reference-style connectivity constraint
    (python/adjoint/connectivity.py:11): treat the density as a heat
    conductor (cond_v void / cond_s solid) with internal heating
    (src_v/src_s) and a cold seed at the bottom z face, solve the heat
    equation with a fixed-iteration damped-Jacobi sweep (differentiable),
    and return f = ||T||_p / thresh - 1 (<= 0 when the structure is
    connected to the seed) plus d f / d rho when need_grad."""
    import numpy as np
    rho = jnp.asarray(rho, jnp.float64).reshape(
        (nz or 1, ny or 1, nx or 1))

    def field(r):
        k = cond_v + r * (cond_s - cond_v)
        q = src_v + r * (src_s - src_v)

        def axis_terms(T, ax):
            """Neighbor flux terms along one axis: harmonic-mean face
            conductivities, cold (T=0) seed ghost below the first z
            plane, insulated (zero-flux) elsewhere."""
            kf = 2 * k * jnp.roll(k, 1, ax) / (k + jnp.roll(k, 1, ax))
            kb = jnp.roll(kf, -1, ax)
            lo = tuple(slice(0, 1) if a == ax else slice(None)
                       for a in range(r.ndim))
            hi = tuple(slice(-1, None) if a == ax else slice(None)
                       for a in range(r.ndim))
            Tm = jnp.roll(T, 1, ax)
            Tp = jnp.roll(T, -1, ax)
            if ax == 0:
                Tm = Tm.at[lo].set(0.0)          # seed face: T = 0 ghost
                kb = kb.at[hi].set(0.0)          # top face insulated
            else:
                kf = kf.at[lo].set(0.0)          # side faces insulated
                kb = kb.at[hi].set(0.0)
            return kf * Tm + kb * Tp, kf + kb

        def sweep(T, _):
            num = q
            den = jnp.zeros_like(r)
            for ax in range(r.ndim):
                if r.shape[ax] < 2:
                    continue
                nu, de = axis_terms(T, ax)
                num = num + nu
                den = den + de
            Tn = num / jnp.maximum(den, 1e-12)
            return 0.5 * T + 0.5 * Tn, None

        T, _ = jax.lax.scan(sweep, jnp.zeros_like(r), None,
                            length=100 * max(rho.shape[0], 10))
        return T

    def f_of(r):
        T = field(r)
        w = r
        pn = (jnp.sum(w * jnp.abs(T) ** p)
              / jnp.maximum(jnp.sum(w), 1e-12)) ** (1.0 / p)
        return pn / thresh - 1.0

    if need_grad:
        f, g = jax.value_and_grad(f_of)(rho)
        return float(f), np.asarray(g).ravel()
    return float(f_of(rho))


def cc_fd(rho, nx, ny, nz, cond_v=1, cond_s=1e6, src_v=0, src_s=1,
          solver_option=0, thresh=None, p=4, num_grad=6, db=1e-6):
    """Finite-difference check of constraint_connectivity gradients at
    num_grad random pixels (python/adjoint/connectivity.py:247)."""
    import numpy as np
    rho = np.asarray(rho, np.float64).ravel().copy()
    n = nx * ny * nz
    rng = np.random.default_rng(0)
    fdidx = rng.choice(n, num_grad, replace=False)
    fdgrad = []
    for k in fdidx:
        rho[k] += db
        fp = constraint_connectivity(rho, nx, ny, nz, cond_v, cond_s,
                                     src_v, src_s, solver_option,
                                     thresh or 50.0, p, need_grad=False)
        rho[k] -= 2 * db
        fm = constraint_connectivity(rho, nx, ny, nz, cond_v, cond_s,
                                     src_v, src_s, solver_option,
                                     thresh or 50.0, p, need_grad=False)
        rho[k] += db
        fdgrad.append((fp - fm) / (2 * db))
    return fdidx, np.asarray(fdgrad)
