"""Shifted-slice stencil primitives.

The analog of the reference's strided pointer walks (`g1[i + s1]` in
step_generic.cpp:69) expressed as whole-array shifts that XLA fuses into the
surrounding elementwise update.  Out-of-range neighbors are zero (the PEC /
not-owned convention) unless the axis is Bloch-periodic, in which case the
wrapped plane is multiplied by the Bloch phase (the CONNECT_PHASE class of
boundaries.cpp:347).

Arrays may carry dead storage padding past the live region (for shard
divisibility / TPU tiling); `nlive` is the number of live cells along the
axis (the periodic wrap distance).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def shift(arr: jnp.ndarray, axis: int, by: int,
          periodic: bool = False, phase=None,
          nlive: Optional[int] = None) -> jnp.ndarray:
    """Return out with out[i] = arr[i + by] along `axis` (by in {-1, +1}).

    Non-periodic: vacated entries are zero.
    Periodic: live cells are 0..nlive-1 (indices >= nlive are dead ghosts,
    masked upstream); wrapping applies `phase` (exp(+-i k L)).
    """
    if by == 0:
        return arr
    sdim = arr.shape[axis]

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

    n = nlive if nlive is not None else sdim - 1
    # periodic: roll the live cells, phase the wrapped plane, keep dead
    # storage (indices >= n) zero.
    live = arr[sl(0, n)]
    ph = 1.0 if phase is None else phase
    rolled = jnp.roll(live, -by, axis=axis)
    if by > 0:
        head = rolled[sl(n - by, n)] * ph
        rolled = jnp.concatenate([rolled[sl(0, n - by)], head], axis=axis)
    else:
        tail = rolled[sl(0, -by)] * (1.0 / ph if phase is not None else 1.0)
        rolled = jnp.concatenate([tail, rolled[sl(-by, n)]], axis=axis)
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, sdim - n)
    return jnp.pad(rolled, pad)
