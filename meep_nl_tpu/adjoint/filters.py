"""Density filters, projections, morphology, and length-scale constraints
for topology optimization.

jnp re-implementations of the reference's autograd filter suite
(python/adjoint/filters.py): conic/gaussian/cylindrical filters via FFT
convolution, tanh / exponential-Heaviside / subpixel-smoothed projections,
the Sigmund-2007 morphological erosion/dilation family, and the
Zhou-2015 geometric length-scale indicator/constraint functions.
All pure jnp, composable under jax.grad.

Literature the formulas come from:
  * O. Sigmund, "Morphology-based black and white filters", SMO 33 (2007)
  * J. Guest et al., "Achieving minimum length scale...", IJNME 61 (2004)
  * B. Lazarov et al., "Length scale and manufacturability", AAM 86 (2016)
  * M. Zhou et al., "Minimum length scale ... geometric constraints",
    CMAME 293 (2015)
  * A. Hammond et al., "Unifying and accelerating level-set ... subpixel
    smoothing" (the beta->inf smoothed projection), 2023.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _kernel_fft_filter(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Zero-phase convolution via FFT with edge padding (mirrors
    filters.py's convolve)."""
    pads = [(k // 2, k - k // 2 - 1) for k in kernel.shape]
    xp = jnp.pad(x, pads, mode="edge")
    k_full = np.zeros([x.shape[i] + pads[i][0] + pads[i][1]
                       for i in range(x.ndim)])
    sl = tuple(slice(0, k) for k in kernel.shape)
    k_full[sl] = kernel
    k_full = np.roll(k_full, [-(k // 2) for k in kernel.shape],
                     axis=tuple(range(x.ndim)))
    X = jnp.fft.fftn(xp)
    K = jnp.fft.fftn(jnp.asarray(k_full))
    y = jnp.real(jnp.fft.ifftn(X * K))
    out = y[tuple(slice(p[0], p[0] + n) for p, n in zip(pads, x.shape))]
    return out


def _radial_grid(radius_px: float, ndim: int):
    r = int(np.ceil(radius_px))
    axes = [np.arange(-r, r + 1)] * ndim
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.sqrt(sum(m.astype(np.float64) ** 2 for m in mesh))


def conic_filter(x: jnp.ndarray, radius: float, resolution: float
                 ) -> jnp.ndarray:
    """Linear cone kernel of given physical radius (filters.py conic_filter)."""
    rp = radius * resolution
    rr = _radial_grid(rp, x.ndim)
    k = np.maximum(0.0, 1.0 - rr / rp)
    k /= k.sum()
    return _kernel_fft_filter(x, k)


def gaussian_filter(x: jnp.ndarray, sigma: float, resolution: float
                    ) -> jnp.ndarray:
    sp = sigma * resolution
    rr = _radial_grid(3 * sp, x.ndim)
    k = np.exp(-0.5 * (rr / sp) ** 2)
    k /= k.sum()
    return _kernel_fft_filter(x, k)


def cylindrical_filter(x: jnp.ndarray, radius: float, resolution: float
                       ) -> jnp.ndarray:
    rp = radius * resolution
    rr = _radial_grid(rp, x.ndim)
    k = (rr <= rp).astype(np.float64)
    k /= k.sum()
    return _kernel_fft_filter(x, k)


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------


def tanh_projection(x, beta: float, eta: float = 0.5):
    """Smoothed Heaviside (filters.py tanh_projection)."""
    if beta == 0:
        return x
    if np.isinf(beta):
        return jnp.where(x > eta, 1.0, jnp.where(x < eta, 0.0, 0.5))
    num = jnp.tanh(beta * eta) + jnp.tanh(beta * (x - eta))
    den = jnp.tanh(beta * eta) + jnp.tanh(beta * (1 - eta))
    return num / den


def heaviside_projection(x, beta: float, eta: float = 0.5):
    """Exponential Heaviside threshold (Lazarov/Wang/Sigmund 2016; the
    reference's heaviside_projection, filters.py:840).  Unlike
    tanh_projection it is exactly 0/1 at x=0/1 for beta->inf while staying
    differentiable for finite beta."""
    below = eta * jnp.exp(-beta * (eta - x) / eta) - (eta - x) * np.exp(-beta)
    above = (1.0 - (1.0 - eta) * jnp.exp(-beta * (x - eta) / (1.0 - eta))
             - (eta - x) * np.exp(-beta))
    return jnp.where(x < eta, below, above)


def smoothed_projection(rho_filtered, beta: float, eta: float,
                        resolution: float):
    """Subpixel-smoothed projection usable at beta -> inf
    (filters.py:710; Hammond et al. 2023).

    Treats the filtered density as a level set: where an interface crosses a
    pixel (distance-to-interface |d| < R ~ half a pixel), replaces the raw
    projection by the convex combination of the projections of the local
    lower/upper density bounds weighted by the analytic circular-kernel fill
    factor F(d).  Away from interfaces it reduces to tanh_projection, so the
    gradient never vanishes even at beta = inf.

    Args:
        rho_filtered: the already-filtered density (any ndim >= 1; the
            gradient-norm uses all axes).
        beta, eta: projection steepness / threshold.
        resolution: design-grid resolution (pixels per unit length).
    """
    dx = 1.0 / resolution
    R = 0.55 * dx  # smoothing kernel radius: just over half a pixel

    rho_projected = tanh_projection(rho_filtered, beta=beta, eta=eta)
    if beta == 0:
        return rho_projected

    grads = jnp.gradient(rho_filtered)
    if rho_filtered.ndim == 1:
        grads = [grads] if not isinstance(grads, (list, tuple)) else grads
    norm2 = sum((g / dx) ** 2 for g in grads)

    # double-where to keep the backward trace NaN-free at zero gradient
    nonzero = norm2 > 0
    norm = jnp.sqrt(jnp.where(nonzero, norm2, 1.0))
    norm_eff = jnp.where(nonzero, norm, 1.0)

    # signed distance from pixel center to the eta level set
    d = (eta - rho_filtered) / norm_eff
    needs_smoothing = nonzero & (jnp.abs(d) < R)

    # analytic fill factor of a circular kernel cut by a straight interface
    # at signed distance d (quintic polynomial approximation)
    d_R = jnp.where(needs_smoothing, d / R, 0.0)
    poly = (15.0 / 16.0) * d_R - (5.0 / 8.0) * d_R ** 3 \
        + (3.0 / 16.0) * d_R ** 5
    F = jnp.where(needs_smoothing, 0.5 - poly, 1.0)
    F_minus = jnp.where(needs_smoothing, 0.5 + poly, 1.0)

    # local material bounds within the pixel, then project the bounds
    rho_minus = rho_filtered - R * norm_eff * F
    rho_plus = rho_filtered + R * norm_eff * F_minus
    proj_minus = tanh_projection(rho_minus, beta=beta, eta=eta)
    proj_plus = tanh_projection(rho_plus, beta=beta, eta=eta)

    smoothed = (1.0 - F) * proj_minus + F * proj_plus
    return jnp.where(needs_smoothing, smoothed, rho_projected)


# ---------------------------------------------------------------------------
# morphological operators (Sigmund 2007 / Guest 2004 families)
# ---------------------------------------------------------------------------


def exponential_erosion(x, radius: float, beta: float, resolution: float):
    """Erosion via the exponential (log-sum-exp style) operator:
    1 - log(filter(exp(beta (1-x)))) / beta  (Sigmund 2007)."""
    x_hat = jnp.exp(beta * (1.0 - x))
    return 1.0 - jnp.log(cylindrical_filter(x_hat, radius, resolution)) / beta


def exponential_dilation(x, radius: float, beta: float, resolution: float):
    """Dilation via the exponential operator:
    log(filter(exp(beta x))) / beta  (Sigmund 2007)."""
    x_hat = jnp.exp(beta * x)
    return jnp.log(cylindrical_filter(x_hat, radius, resolution)) / beta


def heaviside_erosion(x, radius: float, beta: float, resolution: float):
    """Filter then exponential-Heaviside toward 0 (Guest 2004)."""
    x_hat = cylindrical_filter(x, radius, resolution)
    return jnp.exp(-beta * (1.0 - x_hat)) + np.exp(-beta) * (1.0 - x_hat)


def heaviside_dilation(x, radius: float, beta: float, resolution: float):
    """Filter then exponential-Heaviside toward 1 (Guest 2004)."""
    x_hat = cylindrical_filter(x, radius, resolution)
    return 1.0 - jnp.exp(-beta * x_hat) + np.exp(-beta) * x_hat


def geometric_erosion(x, radius: float, alpha: float, resolution: float):
    """Geometric-mean erosion: exp(filter(log(x + alpha))) - alpha."""
    x_hat = jnp.log(x + alpha)
    return jnp.exp(cylindrical_filter(x_hat, radius, resolution)) - alpha


def geometric_dilation(x, radius: float, alpha: float, resolution: float):
    """Geometric-mean dilation (dual of geometric_erosion)."""
    x_hat = jnp.log(1.0 - x + alpha)
    return -jnp.exp(cylindrical_filter(x_hat, radius, resolution)) \
        + alpha + 1.0


def harmonic_erosion(x, radius: float, alpha: float, resolution: float):
    """Harmonic-mean erosion: 1/filter(1/(x+alpha)) - alpha."""
    x_hat = 1.0 / (x + alpha)
    return 1.0 / cylindrical_filter(x_hat, radius, resolution) - alpha


def harmonic_dilation(x, radius: float, alpha: float, resolution: float):
    """Harmonic-mean dilation (dual of harmonic_erosion)."""
    x_hat = 1.0 / (1.0 - x + alpha)
    return 1.0 - 1.0 / cylindrical_filter(x_hat, radius, resolution) + alpha


# ---------------------------------------------------------------------------
# length-scale helpers and constraints (Zhou 2015)
# ---------------------------------------------------------------------------


def get_threshold_wang(delta: float, sigma: float) -> float:
    """Threshold point for a gaussian filter of radius sigma and
    perturbation delta (Wang/Lazarov/Sigmund robust-TO recipe)."""
    return 0.5 - float(np.math.erf(delta / sigma)) / 2.0 \
        if hasattr(np.math, "erf") else 0.5 - float(
            __import__("math").erf(delta / sigma)) / 2.0


def get_eta_from_conic(b: float, R: float) -> float:
    """Eroded threshold eta_e for a conic filter of radius R achieving
    minimum length b (piecewise closed form)."""
    t = b / R
    if t < 0:
        return 0.0
    if t < 1:
        return 0.25 * t ** 2 + 0.5
    if t < 2:
        return -0.25 * t ** 2 + t
    return 1.0


def get_conic_radius_from_eta_e(b: float, eta_e: float) -> float:
    """Inverse of get_eta_from_conic: filter radius from length scale and
    eroded threshold."""
    if 0.5 <= eta_e < 0.75:
        return b / (2.0 * np.sqrt(eta_e - 0.5))
    if 0.75 <= eta_e <= 1.0:
        return b / (2.0 - 2.0 * np.sqrt(1.0 - eta_e))
    raise ValueError("eta_e must be in [0.5, 1]")


def length_indicator(x, filter_f, threshold_f, resolution: float):
    """(design_field, |grad|^2 of the filtered field) for the Zhou-2015
    geometric length-scale constraints."""
    filtered = jnp.squeeze(filter_f(x))
    design_field = threshold_f(filtered)
    grads = jnp.gradient(filtered)
    if filtered.ndim == 1:
        grads = [grads] if not isinstance(grads, (list, tuple)) else grads
    grad_mag = sum((g * resolution) ** 2 for g in grads)
    return design_field, grad_mag


def indicator_solid(x, c: float, filter_f, threshold_f, resolution: float):
    """Solid-phase indicator I_s = rho_bar * exp(-c |grad rho_tilde|^2)."""
    design_field, grad_mag = length_indicator(x, filter_f, threshold_f,
                                              resolution)
    return design_field * jnp.exp(-c * grad_mag)


def constraint_solid(x, c: float, eta_e: float, filter_f, threshold_f,
                     resolution: float):
    """Minimum-solid-length-scale constraint g_s (Zhou 2015 eq. 30);
    feasible designs drive it to ~0."""
    filtered = jnp.squeeze(filter_f(x))
    I_s = indicator_solid(x.reshape(filtered.shape), c, filter_f,
                          threshold_f, resolution)
    return jnp.mean(I_s * jnp.minimum(filtered - eta_e, 0.0) ** 2)


def indicator_void(x, c: float, filter_f, threshold_f, resolution: float):
    """Void-phase indicator I_v = (1-rho_bar) exp(-c |grad rho_tilde|^2)."""
    design_field, grad_mag = length_indicator(x, filter_f, threshold_f,
                                              resolution)
    return (1.0 - design_field) * jnp.exp(-c * grad_mag)


def constraint_void(x, c: float, eta_d: float, filter_f, threshold_f,
                    resolution: float):
    """Minimum-void-length-scale constraint g_v (Zhou 2015)."""
    filtered = jnp.squeeze(filter_f(x))
    I_v = indicator_void(x.reshape(filtered.shape), c, filter_f,
                         threshold_f, resolution)
    return jnp.mean(I_v * jnp.minimum(eta_d - filtered, 0.0) ** 2)


def gray_indicator(x):
    """Grayness measure: mean(4 x (1-x)) * 100 (%); < 2% is well binarized
    (Lazarov 2016)."""
    return jnp.mean(4.0 * x * (1.0 - x)) * 100.0


def mesh_grid(radius, Lx, Ly, resolution, periodic_axes=None):
    """Design-grid size and quarter-kernel coordinate grids
    (python/adjoint/filters.py:212 mesh_grid): returns (Nx, Ny, X, Y)
    with X/Y sparse meshgrids over the kernel's positive quadrant;
    periodic axes extend the kernel to ceil(2 r / L) periods."""
    res = np.atleast_1d(np.asarray(resolution, float))
    if res.size == 1:
        res = np.array([res[0], res[0]])
    Nx = int(round(Lx * res[0])) + 1
    Ny = int(round(Ly * res[1])) + 1
    if Nx <= 1 and Ny <= 1:
        raise AssertionError(
            "The grid size is improper. Check the size and resolution "
            "of the design region.")
    xv = np.arange(0, Lx / 2, 1 / res[0]) if res[0] > 0 else np.array([0.0])
    yv = np.arange(0, Ly / 2, 1 / res[1]) if res[1] > 0 else np.array([0.0])
    if periodic_axes is not None:
        pax = np.atleast_1d(np.asarray(periodic_axes))
        if 0 in pax and res[0] > 0:
            xv = np.arange(0, np.ceil(2 * radius / Lx) * Lx / 2, 1 / res[0])
        if 1 in pax and res[1] > 0:
            yv = np.arange(0, np.ceil(2 * radius / Ly) * Ly / 2, 1 / res[1])
    X, Y = np.meshgrid(xv, yv, sparse=True, indexing="ij")
    return Nx, Ny, X, Y


def convolve_design_weights_and_kernel(x, h, periodic_axes=None):
    """FFT convolution of design weights with a kernel of the same shape
    (python/adjoint/filters.py:120): edge-padded for aperiodic axes,
    wrapped for periodic ones; preserves the input shape."""
    x = jnp.asarray(x)
    h = np.asarray(h)
    if periodic_axes is None:
        # normalize and convolve with edge padding (the role of the
        # quarter-to-full unfold + zero pad of the reference)
        k = h / max(np.sum(h), 1e-300)
        return _kernel_fft_filter(x, k)
    # periodic: circular convolution along the periodic axes, edge pad
    # along the rest
    pax = set(int(a) for a in np.atleast_1d(np.asarray(periodic_axes)))
    k = h / max(np.sum(h), 1e-300)
    pads = [(0, 0) if i in pax else (k.shape[i] // 2,
                                     k.shape[i] - k.shape[i] // 2 - 1)
            for i in range(x.ndim)]
    xp = jnp.pad(x, pads, mode="edge") if any(p != (0, 0) for p in pads) \
        else x
    k_full = np.zeros(xp.shape)
    sl = tuple(slice(0, s) for s in k.shape)
    k_full[sl] = k
    k_full = np.roll(k_full, [-(s // 2) for s in k.shape],
                     axis=tuple(range(x.ndim)))
    y = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(xp)
                               * jnp.fft.fftn(jnp.asarray(k_full))))
    return y[tuple(slice(p[0], p[0] + n) for p, n in zip(pads, x.shape))]
