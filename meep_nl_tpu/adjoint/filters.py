"""Density filters and projections for topology optimization.

jnp re-implementations of the reference's autograd filter suite
(python/adjoint/filters.py: conic/gaussian/cylindrical filters via FFT
convolution, tanh/smoothed projections, morphological ops).  All pure jnp,
composable under jax.grad.
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


def tanh_projection(x, beta: float, eta: float = 0.5):
    """Smoothed Heaviside (filters.py tanh_projection)."""
    if beta == 0:
        return x
    num = jnp.tanh(beta * eta) + jnp.tanh(beta * (x - eta))
    den = jnp.tanh(beta * eta) + jnp.tanh(beta * (1 - eta))
    return num / den


def smoothed_projection(x, beta: float, eta: float = 0.5):
    return tanh_projection(x, beta, eta)


def heaviside_projection(x, beta: float, eta: float = 0.5):
    return tanh_projection(x, beta, eta)
