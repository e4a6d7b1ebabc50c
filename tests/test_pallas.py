"""Fused Pallas half-step kernels (ops/pallas/fused.py) vs the jnp path.

Runs the pallas_call in interpret mode (CPU backend); on TPU the same
kernel lowers to Mosaic.  The fused path must be bit-level-close to the
uniform jnp stepper for the supported plan shape (3D cartesian, real,
diagonal media, uPML, current sources)."""

import os

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, make_step, build_xs

os.environ["MNT_PALLAS_INTERPRET"] = "1"


def _plans(chi1inv, pad):
    res = 8.0
    gv = G.GridVolume.create("3d", [2.0, 2.0, 2.0], res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.1, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    kw = dict(pmls=[PMLSpec(d, 0.5) for d in "xyz"],
              sources=[SrcVolSpec("ez", idx, amps, src_t)],
              pad_to_multiple=pad)
    ref = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), **kw)
    pal = compile_plan(gv, MaterialSpec(chi1inv=chi1inv), **kw)
    pal.use_pallas = True
    return ref, pal


def _compare(ref, pal, nsteps=40):
    from meep_nl_tpu.ops.pallas.fused import pallas_supported
    assert pallas_supported(pal)
    step_ref = make_step(ref)
    step_pal = make_step(pal)
    xs = build_xs(ref, nsteps)
    s_ref, s_pal = init_state(ref), init_state(pal)
    for n in range(nsteps):
        x1 = {k: v[n] for k, v in xs.items()}
        s_ref = step_ref(s_ref, x1, ref.coefs)
        s_pal = step_pal(s_pal, x1, pal.coefs)
    assert np.abs(np.asarray(s_ref["f"]["ez"])).max() > 1e-6  # fields moved
    for grp in ("f", "f_u", "f_w"):
        # tolerance vs the field-type scale: individual components can be
        # at accumulated-roundoff level while others carry the wave
        sc_e = max((np.abs(np.asarray(s_ref[grp][c])).max()
                    for c in s_ref[grp] if c[0] in "ed"), default=0.0)
        sc_h = max((np.abs(np.asarray(s_ref[grp][c])).max()
                    for c in s_ref[grp] if c[0] in "hb"), default=0.0)
        for c in s_ref[grp]:
            a = np.asarray(s_ref[grp][c])
            b = np.asarray(s_pal[grp][c])
            sc = max(sc_e if c[0] in "ed" else sc_h, 1e-30)
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-4 * sc,
                                       err_msg=f"{grp}/{c}")


def test_fused_vacuum():
    _compare(*_plans({}, (1, 1, 1)))


def test_fused_vacuum_padded():
    _compare(*_plans({}, (8, 8, 128)))


def test_fused_dielectric():
    gv = G.GridVolume.create("3d", [2.0, 2.0, 2.0], 8.0)
    chi1inv = {}
    for c in ("ex", "ey", "ez"):
        ax = [gv.comp_coords(c, a) for a in range(3)]
        xx, yy, zz = np.meshgrid(*ax, indexing="ij")
        chi1inv[c] = {c[1]: np.where(xx * xx + yy * yy + zz * zz < 0.36,
                                     0.25, 1.0)}
    _compare(*_plans(chi1inv, (8, 8, 128)))


def test_unsupported_falls_back():
    """Plans outside the fused envelope run the jnp path (no error)."""
    from meep_nl_tpu.ops.pallas.fused import pallas_supported
    gv = G.GridVolume.create("2d", [2.0, 2.0], 8.0)
    plan = compile_plan(gv, MaterialSpec(chi1inv={}),
                        pmls=[PMLSpec(d, 0.5) for d in "xy"], sources=[])
    assert not pallas_supported(plan)
    plan.use_pallas = True
    make_step(plan)  # builds the jnp step without raising
