"""Design-variable bases and the inverse-mapping utility.

`BilinearInterpolationBasis` is the role of the reference's
python/adjoint/basis.py:45 (rho vector on a coarse design lattice,
bilinearly interpolated onto simulation points, with optional mirror
symmetry folding); `unfilter_design` is python/adjoint/unfilter_design.py
(given a target post-processing output, fit the pre-filter design
variables by gradient descent).  Both are jax-native: gradients/VJPs come
from jax.grad instead of autograd + nlopt.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class BilinearInterpolationBasis:
    """rho vector on an (Nx, Ny) design lattice over a rectangular volume,
    evaluated anywhere by bilinear interpolation (basis.py:45).

    `symmetry` may contain 'x'/'y': points are folded onto the positive
    half and the lattice shrinks accordingly (mirror-symmetric designs
    with half the degrees of freedom)."""

    def __init__(self, resolution: float, center=(0.0, 0.0),
                 size=(1.0, 1.0), symmetry: Optional[Sequence[str]] = None,
                 rho_vector=None):
        cx, cy = float(center[0]), float(center[1])
        sx, sy = float(size[0]), float(size[1])
        self.center = (cx, cy)
        self.symmetry = set(symmetry or ())
        if "x" in self.symmetry:
            self.Nx = int(resolution * sx / 2) + 1
            self.rho_x = np.linspace(cx, cx + sx / 2, self.Nx)
        else:
            self.Nx = int(resolution * sx) + 1
            self.rho_x = np.linspace(cx - sx / 2, cx + sx / 2, self.Nx)
        if "y" in self.symmetry:
            self.Ny = int(resolution * sy / 2) + 1
            self.rho_y = np.linspace(cy, cy + sy / 2, self.Ny)
        else:
            self.Ny = int(resolution * sy) + 1
            self.rho_y = np.linspace(cy - sy / 2, cy + sy / 2, self.Ny)
        self.num_design_params = self.Nx * self.Ny
        self.rho_vector = jnp.ones(self.num_design_params) \
            if rho_vector is None else jnp.asarray(rho_vector)

    def _fold(self, x, y):
        cx, cy = self.center
        if "x" in self.symmetry:
            x = cx + jnp.abs(x - cx)
        if "y" in self.symmetry:
            y = cy + jnp.abs(y - cy)
        return x, y

    def interpolate(self, rho_vector, xs, ys):
        """Bilinear interpolation of rho at points (xs, ys); fully
        traceable, so jax.vjp/grad provide the basis VJP natively."""
        rho = jnp.asarray(rho_vector).reshape(self.Nx, self.Ny)
        x, y = self._fold(jnp.asarray(xs), jnp.asarray(ys))
        dx = self.rho_x[1] - self.rho_x[0] if self.Nx > 1 else 1.0
        dy = self.rho_y[1] - self.rho_y[0] if self.Ny > 1 else 1.0
        fx = jnp.clip((x - self.rho_x[0]) / dx, 0.0, self.Nx - 1 - 1e-9)
        fy = jnp.clip((y - self.rho_y[0]) / dy, 0.0, self.Ny - 1 - 1e-9)
        ix = jnp.floor(fx).astype(int)
        iy = jnp.floor(fy).astype(int)
        tx = fx - ix
        ty = fy - iy
        v00 = rho[ix, iy]
        v10 = rho[ix + 1, iy]
        v01 = rho[ix, iy + 1]
        v11 = rho[ix + 1, iy + 1]
        return ((1 - tx) * (1 - ty) * v00 + tx * (1 - ty) * v10
                + (1 - tx) * ty * v01 + tx * ty * v11)

    def __call__(self, p):
        x = p.x if hasattr(p, "x") else p[0]
        y = p.y if hasattr(p, "y") else p[1]
        return float(self.interpolate(self.rho_vector,
                                      jnp.asarray([x]), jnp.asarray([y]))[0])

    def func(self) -> Callable:
        """Material-function closure for Simulation geometry/amp uses."""
        def _f(p):
            return self(p)
        return _f

    def set_rho_vector(self, rho_vector):
        self.rho_vector = jnp.asarray(rho_vector)

    def get_basis_vjp(self, dJ_du, xs, ys):
        """VJP of the interpolation: dJ/drho_vector from dJ/du at points
        (basis.py:187 get_basis_vjp, via jax.vjp instead of a hand-built
        sparse matrix)."""
        _, vjp = jax.vjp(lambda r: self.interpolate(r, xs, ys),
                         self.rho_vector)
        return vjp(jnp.asarray(dJ_du))[0]


def unfilter_design(target, processing: Callable, maxiter: int = 100,
                    step: float = 0.05, ftol: float = 1e-7):
    """Fit design variables x in [0,1] minimizing
    ||processing(x) - target||^2 (unfilter_design.py:6): initialize a
    beta-continuation run so the realized (filtered+projected) design
    matches a given target layout.  Projected Adam via optax replaces the
    reference's nlopt CCSAQ."""
    import optax

    target = jnp.asarray(target, jnp.float64)

    def loss(x):
        return jnp.sum((processing(x) - target.ravel()) ** 2)

    grad = jax.jit(jax.value_and_grad(loss))
    x = jnp.clip(target.ravel(), 0.0, 1.0)
    opt = optax.adam(step)
    state = opt.init(x)
    prev = np.inf
    for _ in range(maxiter):
        v, g = grad(x)
        upd, state = opt.update(g, state)
        x = jnp.clip(x + upd, 0.0, 1.0)
        if abs(prev - float(v)) < ftol * max(abs(float(v)), 1e-30):
            break
        prev = float(v)
    return np.asarray(x)


class Basis:
    """Abstract design-variable basis (python/adjoint/basis.py:15):
    rho vector over a volume, evaluated pointwise via __call__."""

    def __init__(self, rho_vector=None, volume=None, size=None,
                 center=None):
        from ..models.geom import Vector3, Volume
        self.volume = volume or Volume(center=center or Vector3(),
                                       size=size)
        self.rho_vector = rho_vector

    def func(self):
        def _f(p):
            return self(p)
        return _f

    def get_basis_vjp(self, *a, **kw):
        raise NotImplementedError(
            "derived class must implement get_basis_vjp")

    def __call__(self, p=(0.0, 0.0)):
        raise NotImplementedError(
            "derived class must implement __call__()")
