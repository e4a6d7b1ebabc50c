"""Dispersive (Lorentz/Drude ADE) and conductive media vs analytic
transfer-matrix transmission (analog of tests/aniso_disp.cpp and
bragg_transmission.cpp's analytic-answer strategy)."""

import numpy as np

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, PolSpec,
                                      SrcVolSpec, compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.stepper import monitors as M

from helpers import make_point_source

RES = 40.0
LIVE = ["ex", "hy"]


def slab_transmission(mat: MaterialSpec, freqs, fcen, fwidth, cell=16.0,
                      extra_time=80.0):
    gv = G.GridVolume.create("1d", [cell], RES)
    src_t = mnt.GaussianSource(frequency=fcen, fwidth=fwidth)
    s = make_point_source(gv, "ex", [-5.0], src_t)
    specs = M.flux_specs(gv, "T", "z", [5.0], [0.0], freqs, live=LIVE)
    plan = compile_plan(gv, mat, pmls=[PMLSpec("z", 2.0)], sources=[s],
                        dfts=specs)
    st = init_state(plan)
    st = run(plan, st, int((src_t.last_time() + extra_time) / plan.dt))
    return M.get_flux(plan, st, "T")


def slab_profile(gv_1d_coords, eps_in, lo=-0.5, hi=0.5, eps_out=1.0):
    """Sharp slab with arithmetic interface averaging (Ex tangential)."""
    z = gv_1d_coords
    eps = np.full(z.shape, eps_out)
    eps[(z > lo + 1e-9) & (z < hi - 1e-9)] = eps_in
    eps[np.isclose(z, lo)] = 0.5 * (eps_out + eps_in)
    eps[np.isclose(z, hi)] = 0.5 * (eps_out + eps_in)
    return eps


def analytic_slab_T(n_complex, d, freqs):
    """Transfer-matrix transmission |t|^2 * Re(1) for a slab in vacuum."""
    T = []
    for f, n in zip(freqs, n_complex):
        w = 2 * np.pi * f
        kd = n * w * d
        r = (1 - n) / (1 + n)
        t12 = 2 / (1 + n)
        t21 = 2 * n / (1 + n)
        t = (t12 * t21 * np.exp(1j * kd)) / (1 - r * r * np.exp(2j * kd))
        T.append(abs(t) ** 2)
    return np.array(T)


def test_lorentz_slab_transmission():
    gv = G.GridVolume.create("1d", [16.0], RES)
    z = gv.comp_coords("ex", 0)
    in_slab = slab_profile(z, 1.0) - 1.0  # 1 inside (with ramp), 0 outside
    in_slab = np.zeros_like(z)
    in_slab[(z > -0.5 + 1e-9) & (z < 0.5 - 1e-9)] = 1.0
    in_slab[np.isclose(z, -0.5)] = 0.5
    in_slab[np.isclose(z, 0.5)] = 0.5

    f0, gam, sig = 2.0, 0.1, 0.3
    pol = PolSpec(field_type="e", omega0=f0, gamma=gam,
                  sigma={("ex", "x"): sig * in_slab})
    mat = MaterialSpec(chi1inv={}, pols=[pol])

    freqs = np.linspace(0.45, 0.75, 7)
    t_fdtd = slab_transmission(mat, freqs, 0.6, 0.5)

    gv0 = G.GridVolume.create("1d", [16.0], RES)
    t_vac = slab_transmission(MaterialSpec(chi1inv={}), freqs, 0.6, 0.5)
    T = t_fdtd / t_vac

    # analytic: eps(f) = 1 + sig*f0^2/(f0^2 - f^2 - i*f*gam)
    eps = 1 + sig * f0 ** 2 / (f0 ** 2 - freqs ** 2 - 1j * freqs * gam)
    n = np.sqrt(eps)
    T_an = analytic_slab_T(n, 1.0, freqs)
    np.testing.assert_allclose(T, T_an, rtol=0.02)


def test_drude_metal_blocks():
    """A Drude slab with plasma frequency above the probe band reflects."""
    gv = G.GridVolume.create("1d", [16.0], RES)
    z = gv.comp_coords("ex", 0)
    in_slab = np.zeros_like(z)
    in_slab[(z > -1.0) & (z < 1.0)] = 1.0

    fp, gam = 2.0, 0.05
    pol = PolSpec(field_type="e", omega0=fp, gamma=gam,
                  sigma={("ex", "x"): in_slab}, drude=True)
    mat = MaterialSpec(chi1inv={}, pols=[pol])
    freqs = np.linspace(0.4, 0.6, 3)
    t = slab_transmission(mat, freqs, 0.5, 0.3)
    t_vac = slab_transmission(MaterialSpec(chi1inv={}), freqs, 0.5, 0.3)
    T = t / t_vac
    # Drude eps = 1 - fp^2/(f^2 + i f gam): strongly negative -> evanescent
    assert np.all(T < 1e-3), T


def test_conductive_slab_transmission():
    gv = G.GridVolume.create("1d", [16.0], RES)
    z = gv.comp_coords("dx", 0)
    sig_d = 0.5
    cond = np.zeros(gv.shape)
    cond[(z > -0.5 + 1e-9) & (z < 0.5 - 1e-9)] = sig_d
    cond[np.isclose(z, -0.5)] = sig_d / 2
    cond[np.isclose(z, 0.5)] = sig_d / 2
    mat = MaterialSpec(chi1inv={}, cond={"dx": cond})
    freqs = np.linspace(0.5, 0.9, 5)
    t = slab_transmission(mat, freqs, 0.7, 0.5)
    t_vac = slab_transmission(MaterialSpec(chi1inv={}), freqs, 0.7, 0.5)
    T = t / t_vac
    # meep convention: eps_c(f) = eps * (1 + i*sigma_D/(2 pi f))
    w = 2 * np.pi * freqs
    n = np.sqrt(1 * (1 + 1j * sig_d / w))
    T_an = analytic_slab_T(n, 1.0, freqs)
    np.testing.assert_allclose(T, T_an, rtol=0.03)
