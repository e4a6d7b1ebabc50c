"""Pade-approximant spectrum estimation from short time series
(analog of python/simulation.py:873 PadeDFT).

Fits a rational function P(z)/Q(z) to the time series via the standard
Levi linear-least-squares formulation and evaluates it on a frequency grid:
sharper resonance estimates than the plain DTFT for short runs."""

from __future__ import annotations

import numpy as np


class PadeDFT:
    """Collect a field time series (via Simulation probes or manually) and
    evaluate its Pade-interpolated spectrum."""

    def __init__(self, m: int = 20, n: int = 20, sampling_interval: int = 1):
        self.m = m
        self.n = n
        self.sampling_interval = sampling_interval
        self.data = []
        self.dt = None

    def collect(self, series, dt: float):
        self.data = np.asarray(series)[:: self.sampling_interval]
        self.dt = dt * self.sampling_interval

    def spectrum(self, freqs) -> np.ndarray:
        """Evaluate the fitted rational model at `freqs` (units c/a)."""
        c = np.asarray(self.data, np.complex128)
        N = len(c)
        m = min(self.m, N // 2 - 1)
        n = min(self.n, N // 2 - 1)
        # Levi linear LS: find a (len m+1), b (len n, b0=1) minimizing
        #   sum_k |sum_i a_i z_k^-i - c_k (1 + sum_j b_j z_k^-j)|^2
        # in the time domain this is an ARMA fit: c_k + sum b_j c_{k-j} =
        # a_k (impulse response) -> classic Pade-via-Hankel solves:
        # denominator from Hankel system on the tail
        if N < m + n + 2:
            raise ValueError("series too short for requested Pade order")
        H = np.lib.stride_tricks.sliding_window_view(c, n)[m - n + 1: m + 1
                                                           if m >= n else None]
        # build standard Pade linear system around the series "center"
        # (use the classic Pade-on-Taylor-coefficients construction)
        A = np.zeros((n, n), np.complex128)
        rhs = np.zeros(n, np.complex128)
        for i in range(n):
            for j in range(n):
                A[i, j] = c[m - n + 1 + i + j] if 0 <= m - n + 1 + i + j < N else 0
            rhs[i] = -c[m + 1 + i] if m + 1 + i < N else 0
        b = np.linalg.lstsq(A, rhs, rcond=None)[0]
        b = np.concatenate([[1.0], b[::-1]])
        a = np.zeros(m + 1, np.complex128)
        for k in range(m + 1):
            s = c[k]
            for j in range(1, min(k, n) + 1):
                s += b[j] * c[k - j]
            a[k] = s
        out = []
        for f in np.atleast_1d(freqs):
            z = np.exp(-2j * np.pi * f * self.dt)
            num = np.polyval(a[::-1], z)
            den = np.polyval(b[::-1], z)
            out.append(num / den)
        return np.asarray(out)
