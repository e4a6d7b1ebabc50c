"""Design regions for inverse design (analog of python/geom.py MaterialGrid
+ python/adjoint/utils.py DesignRegion).

A DesignRegion maps a density grid rho in [0,1] onto the inverse-epsilon
coefficient arrays of the step plan, with bilinear interpolation onto each
component's Yee sites (material_grid_val, meepgeom.cpp:489) and optional
tanh projection (meepgeom.cpp:497).  Because the mapping is pure jnp, the
whole chain rho -> eps -> fields -> objective differentiates with jax.grad
--- replacing the reference's hand-built adjoint-source machinery
(material_grids_addgradient, meepgeom.cpp:2829) with native AD.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import grid as G


def tanh_projection(x, beta: float, eta: float = 0.5):
    """Smoothed Heaviside projection (meepgeom.cpp:497, adjoint/filters.py)."""
    if beta == 0:
        return x
    num = jnp.tanh(beta * eta) + jnp.tanh(beta * (x - eta))
    den = jnp.tanh(beta * eta) + jnp.tanh(beta * (1 - eta))
    return num / den


@dataclasses.dataclass
class DesignVariables:
    """Shape/medium description of one design grid (MaterialGrid,
    python/geom.py:578)."""
    shape: Tuple[int, ...]           # design grid resolution (per grid axis)
    eps_min: float = 1.0
    eps_max: float = 12.0
    beta: float = 0.0                # tanh projection steepness
    eta: float = 0.5
    #: subpixel-smoothed projection (the differentiable analog of the
    #: reference's do_averaging fallback quadrature, meepgeom.cpp:1083):
    #: level-set smoothing of the projection keeps gradients nonzero
    #: even at beta = inf
    do_averaging: bool = False
    #: artificial conductivity sigma = damping * u * (1 - u) at design
    #: sites (epsilon_material_grid, meepgeom.cpp:623-626): damps
    #: intermediate densities to stabilize interpolated susceptibilities
    damping: float = 0.0


@dataclasses.dataclass
class DesignRegion:
    """A box of the cell whose epsilon is controlled by a density grid.

    Reference-compatible construction (python/adjoint/utils.py
    DesignRegion): `DesignRegion(material_grid, volume=mp.Volume(...))`
    — `design_parameters` aliases `variables` and a `volume` supplies
    center/size as Vector3s (converted to grid axes at bind time)."""
    variables: Any = None
    center: Sequence[float] = None   # grid-axis coordinates (or Vector3)
    size: Sequence[float] = None
    volume: Any = None
    design_parameters: dataclasses.InitVar[Any] = None

    # filled at bind time:
    _site_maps: Optional[Dict[str, Tuple]] = None

    def __post_init__(self, design_parameters):
        if self.variables is None and design_parameters is not None:
            self.variables = design_parameters
        if self.volume is not None and self.center is None:
            from ..models.geom import get_center_and_size
            self.center, self.size = get_center_and_size(self.volume)

    def update_design_parameters(self, x):
        """Reference DesignRegion.update_design_parameters: forward to
        the MaterialGrid."""
        self.variables.update_weights(np.asarray(x))

    def bind(self, gv: G.GridVolume, live_e: Sequence[str]):
        """Precompute, per E component, the site slice inside the region and
        the fractional design-grid coordinates of each site (for bilinear
        interpolation; material_grid_val meepgeom.cpp:489)."""
        # Vector3-style center/size (reference DesignRegion volumes)
        # convert to grid-axis coordinates here, where gv is known
        if self.center is not None and hasattr(self.center, "x"):
            from ..models.simulation import _vec_to_axes
            self.center = _vec_to_axes(gv, self.center)
            self.size = _vec_to_axes(gv, self.size)
        maps = {}
        for c in live_e:
            slices = []
            fracs = []
            ok = True
            for ax in range(gv.ndim):
                lo = self.center[ax] - self.size[ax] / 2
                hi = self.center[ax] + self.size[ax] / 2
                coords = gv.comp_coords(c, ax)
                inside = np.where((coords >= lo - 1e-9) & (coords <= hi + 1e-9))[0]
                if len(inside) == 0:
                    ok = False
                    break
                i0, i1 = inside[0], inside[-1] + 1
                slices.append((int(i0), int(i1)))
                # fractional design coordinates in [0, n_design-1]; design
                # grids with fewer dims than the cell are extruded uniformly
                # along the trailing axes (2D pattern in a 3D cell)
                shp = self.variables.shape
                nd = shp[ax] if ax < len(shp) else 1
                u = (coords[i0:i1] - lo) / max(hi - lo, 1e-300)
                fracs.append(np.clip(u, 0.0, 1.0) * (nd - 1))
            if ok:
                maps[c] = (tuple(slices), [np.asarray(f) for f in fracs])
        self._site_maps = maps
        # design-grid resolution (pixels per unit length) for the
        # smoothed-projection kernel radius
        res = [self.variables.shape[ax] / max(float(self.size[ax]), 1e-300)
               for ax in range(min(len(self.variables.shape), gv.ndim))
               if self.size[ax] > 0]
        self._design_res = float(np.mean(res)) if res else 1.0
        return self

    def _project(self, rho: jnp.ndarray) -> jnp.ndarray:
        """Projected density on the design grid: tanh projection, or the
        subpixel-smoothed level-set projection when do_averaging is set
        (the differentiable role of the reference's do_averaging
        quadrature fallback, meepgeom.cpp:1083/2929)."""
        v = self.variables
        if getattr(v, "do_averaging", False) and v.beta != 0:
            from .filters import smoothed_projection
            return smoothed_projection(rho, beta=v.beta, eta=v.eta,
                                       resolution=self._design_res)
        return tanh_projection(rho, v.beta, v.eta)

    def u_at_sites(self, rho: jnp.ndarray, c: str) -> jnp.ndarray:
        """Projected density bilinearly interpolated onto component c's
        in-region Yee sites (material_grid_val, meepgeom.cpp:489)."""
        slices, fracs = self._site_maps[c]
        v = self.variables
        rho_p = self._project(rho)
        # pad trailing axes so a lower-dim design grid extrudes uniformly
        shape3 = tuple(v.shape) + (1,) * (len(fracs) - len(v.shape))
        out = rho_p.reshape(shape3)
        for ax, f in enumerate(fracs):
            nd = shape3[ax]
            i0 = jnp.asarray(np.floor(f).astype(np.int64))
            i0 = jnp.clip(i0, 0, nd - 2) if nd > 1 else i0 * 0
            w = jnp.asarray(f) - i0
            lo = jnp.take(out, i0, axis=ax)
            hi = jnp.take(out, jnp.minimum(i0 + 1, nd - 1), axis=ax)
            out = lo * (1 - w.reshape([-1 if a == ax else 1
                                       for a in range(out.ndim)])) \
                + hi * w.reshape([-1 if a == ax else 1
                                  for a in range(out.ndim)])
        return out

    def eps_at_sites(self, rho: jnp.ndarray, c: str) -> jnp.ndarray:
        """Bilinear-interpolated epsilon at component c's in-region sites
        (epsilon_material_grid, meepgeom.cpp:569-600)."""
        v = self.variables
        return v.eps_min + (v.eps_max - v.eps_min) * self.u_at_sites(rho, c)

    def apply(self, rho: jnp.ndarray, coefs: Dict, plan) -> Dict:
        """Return new coefs with the design epsilon written into the
        inverse-eps rows (the differentiable analog of update_weights,
        meepgeom.hpp:286).  A nonzero MaterialGrid damping additionally
        writes the artificial conductivity sigma = damping * u * (1 - u)
        into the D-conductivity coefficient rows (epsilon_material_grid,
        meepgeom.cpp:623-626) — the plan must carry those rows (the
        Simulation must be compiled with the design region's damping
        known; OptimizationProblem arranges this)."""
        new = dict(coefs)
        shape = plan.storage_shape or plan.gv.shape
        damp = float(getattr(self.variables, "damping", 0.0))
        for c, (slices, fracs) in self._site_maps.items():
            u = self.u_at_sites(rho, c)
            v = self.variables
            eps = v.eps_min + (v.eps_max - v.eps_min) * u
            key = f"{c}:u"
            base = new.get(key)
            if base is None:
                base = jnp.ones(shape, dtype=plan.dtype)
            sl = tuple(slice(a, b) for a, b in slices)
            new[key] = base.at[sl].set(1.0 / eps)
            if damp:
                ck, ik = f"d{c[1]}:cnd", f"d{c[1]}:cndinv"
                if ck not in new:
                    raise ValueError(
                        f"MaterialGrid damping needs conductivity rows "
                        f"for d{c[1]} in the plan; construct the "
                        "OptimizationProblem before init_sim (it "
                        "forces the rows), or add a D_conductivity "
                        "placeholder over the design region")
                cnd = jnp.asarray(new[ck]) * jnp.ones(shape,
                                                      dtype=plan.dtype)
                cnd = cnd.at[sl].add(damp * u * (1.0 - u))
                new[ck] = cnd
                new[ik] = 1.0 / (1.0 + 0.5 * plan.dt * cnd)
        return new


class MaterialGrid(DesignVariables):
    """Reference-shaped constructor (python/geom.py MaterialGrid):
    MaterialGrid(grid_size, medium1, medium2, weights=None, beta=0,
    eta=0.5, damping=0).  Wraps DesignVariables (this framework's design
    grid) with eps_min/eps_max taken from the two media."""

    def __init__(self, grid_size, medium1=None, medium2=None,
                 weights=None, grid_type=None, do_averaging=False,
                 beta=0.0, eta=0.5, damping=0.0):
        try:
            gs = tuple(int(v) for v in grid_size if int(v) > 0)
        except TypeError:
            gs = (int(grid_size),)

        def _eps(m, default):
            if m is None:
                return default
            d = getattr(m, "epsilon_diag", None)
            if d is not None:
                import numpy as _np
                return float(_np.mean([d.x, d.y, d.z]))
            return float(getattr(m, "epsilon", default))
        super().__init__(shape=gs, eps_min=_eps(medium1, 1.0),
                         eps_max=_eps(medium2, 12.0), beta=float(beta),
                         eta=float(eta))
        self.medium1 = medium1
        self.medium2 = medium2
        self.weights = weights
        self.grid_type = grid_type
        self.do_averaging = do_averaging
        self.damping = float(damping)
        self.num_params = int(np.prod(gs))

    def check_weights(self, w):
        """Clip (with a warning) weights outside [0, 1]
        (python/geom.py MaterialGrid.check_weights)."""
        w = np.asarray(w)
        if w.size and (w.min() < 0.0 or w.max() > 1.0):
            import warnings
            warnings.warn("The weights parameter of MaterialGrid must "
                          "be in the range [0,1].")
            w = np.clip(w, 0.0, 1.0)
        return w

    def update_weights(self, x):
        """Reset the design weights (python/geom.py
        MaterialGrid.update_weights)."""
        x = np.asarray(x)
        if x.size != self.num_params:
            raise ValueError(
                f"weights of size {x.size} do not match the grid "
                f"dimension {self.num_params}")
        self.weights = self.check_weights(x).reshape(self.shape) \
            .astype(np.float64)
