"""Shifted-slice stencil primitives.

The analog of the reference's strided pointer walks (`g1[i + s1]` in
step_generic.cpp:69) expressed as whole-array shifts that XLA fuses into the
surrounding elementwise update.  Out-of-range neighbors are zero (the PEC /
not-owned convention) unless the axis is Bloch-periodic, in which case the
wrapped plane is multiplied by the Bloch phase (the CONNECT_PHASE class of
boundaries.cpp:347).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def shift(arr: jnp.ndarray, axis: int, by: int,
          periodic: bool = False, phase=None) -> jnp.ndarray:
    """Return out with out[i] = arr[i + by] along `axis` (by in {-1, +1}).

    Non-periodic: vacated entries are zero.
    Periodic: the grid is cells 0..N-1 of an (N+1)-point array (index N is a
    dead ghost, masked upstream); wrapping applies `phase` (exp(+-i k L)).
    """
    if by == 0:
        return arr
    n1 = arr.shape[axis]  # N+1 storage points
    n = n1 - 1            # N cells

    def sl(a, b):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    if not periodic:
        pad = [(0, 0)] * arr.ndim
        if by > 0:
            pad[axis] = (0, by)
            return jnp.pad(arr[sl(by, None)], pad)
        else:
            pad[axis] = (-by, 0)
            return jnp.pad(arr[sl(None, by)], pad)

    # periodic: work on the live cells 0..n-1, roll, phase the wrapped plane,
    # keep the dead ghost plane at index n as zero.
    live = arr[sl(0, n)]
    ph = 1.0 if phase is None else phase
    if by > 0:
        rolled = jnp.roll(live, -by, axis=axis)
        # wrapped entries are the first `by` planes rolled to the end;
        # they came from low indices -> multiply by phase (k * +L)
        head = rolled[sl(n - by, n)] * ph
        rolled = jnp.concatenate([rolled[sl(0, n - by)], head], axis=axis)
    else:
        rolled = jnp.roll(live, -by, axis=axis)
        tail = rolled[sl(0, -by)] * (1.0 / ph if phase is not None else 1.0)
        rolled = jnp.concatenate([tail, rolled[sl(-by, n)]], axis=axis)
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, 1)
    return jnp.pad(rolled, pad)


def diff_fwd(g: jnp.ndarray, axis: int, periodic=False, phase=None) -> jnp.ndarray:
    """g[i+1] - g[i]  (the B/H-update derivative, step_generic.cpp:108)."""
    return shift(g, axis, +1, periodic, phase) - g


def diff_bwd(g: jnp.ndarray, axis: int, periodic=False, phase=None) -> jnp.ndarray:
    """g[i] - g[i-1]  (the D/E-update derivative; negated strides at
    step_db.cpp:81)."""
    return g - shift(g, axis, -1, periodic, phase)


def avg4_to(g: jnp.ndarray, own_axis: int, own_sign: int, off_axis: int,
            off_sign: int, periodic: Sequence[bool] = (),
            phases: Optional[Sequence] = None) -> jnp.ndarray:
    """Four-point Yee average of g from its own sites onto a site offset by
    half a cell in `own_axis` and `off_axis`.

    This is the OFFDIAG / gs_2 stencil of step_generic.cpp:597/740:
        0.25*(g[i] + g[i + s] + g[i - sx] + g[i + s - sx])
    with s = own-direction stride (sign own_sign) and sx = off-direction
    stride (sign off_sign).
    """
    def _per(ax):
        return (periodic[ax] if ax < len(periodic) else False,
                phases[ax] if phases is not None else None)

    po, pho = _per(own_axis)
    pf, phf = _per(off_axis)
    g_s = shift(g, own_axis, own_sign, po, pho)
    g_x = shift(g, off_axis, -off_sign, pf, phf)
    g_sx = shift(g_s, off_axis, -off_sign, pf, phf)
    return 0.25 * (g + g_s + g_x + g_sx)
