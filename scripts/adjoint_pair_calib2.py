"""Calibration part 2 for the two-run adjoint pairing.

Validates, against jax.grad ground truth:
  A. eps != 1 design background  -> is g_u = Re[Z lam ghat]/u or not?
  B. multi-site weighted monitor -> adjoint amps = conj(cot) * w(x)?
  C. hy-monitor objective        -> magnetic-current pairing constant Z_h.

Z_e = i sqrt(8 pi) wt,  wt = (2/dt) sin(w dt / 2)  (from part 1).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (compile_plan, MaterialSpec, PMLSpec,
                                      SrcVolSpec, DftSpec)
from meep_nl_tpu.stepper import step as S
from meep_nl_tpu.adjoint.optimization import run_differentiable
from meep_nl_tpu.models.source import GaussianSource


def Z_e(f0, dt):
    w = 2 * np.pi * f0
    wt = (2 / dt) * np.sin(w * dt / 2)
    return 1j * np.sqrt(8 * np.pi) * wt


def _eps_grid(gv, eps_bg):
    if callable(eps_bg):
        return eps_bg(gv)
    return np.full(gv.shape, eps_bg, np.float64)


def setup(n=36, res=10, f0=0.8, eps_bg=1.0, mon_comp="ez",
          mon_sites=((27, 18),), mon_w=(1.0,)):
    gv = G.GridVolume.create("2d", (n / res, n / res), res)
    eps = _eps_grid(gv, eps_bg)
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    pmls = [PMLSpec(direction=d, thickness=0.8) for d in ("x", "y")]
    st = GaussianSource(frequency=f0, fwidth=0.3)
    svol = SrcVolSpec(component="ez",
                      indices=np.array([(n // 4, n // 2)], np.int32),
                      amps=np.array([1.0 + 0j]), src_time=st)
    ns = gv.shape[0]
    sites = np.array(mon_sites, np.int32)
    lo = sites.min(axis=0); hi = sites.max(axis=0) + 1
    wgt = np.zeros(tuple(hi - lo))
    for s, w in zip(mon_sites, mon_w):
        wgt[tuple(np.array(s) - lo)] = w
    dfts = [
        DftSpec(name="obj", component=mon_comp,
                region=((int(lo[0]), int(hi[0])), (int(lo[1]), int(hi[1]))),
                weights=wgt, freqs=np.array([f0]), centered=False),
        DftSpec(name="dr", component="ez", region=((0, ns), (0, ns)),
                weights=np.ones((ns, ns)), freqs=np.array([f0]),
                centered=False),
    ]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[svol], dfts=dfts,
                        dtype=np.float64)
    return gv, plan, st


def ground_truth(plan, nsteps):
    def J(u_row):
        coefs = dict(plan.coefs)
        coefs["ez:u"] = u_row
        stt = run_differentiable(plan, nsteps, coefs)
        acc = stt["dft"]["obj"]
        return jnp.sum(acc ** 2)
    u0 = plan.coefs["ez:u"]
    val, g = jax.value_and_grad(J)(u0)
    return float(val), np.asarray(g)


def run_pair(gv, plan, f0, nsteps, eps_bg, mon_comp, mon_sites, mon_w):
    state = S.init_state(plan)
    state = S.run(plan, state, nsteps, jit=True, t0=0)
    acc = np.asarray(state["dft"]["obj"])
    # per-site accumulators a_x (already include the monitor weights);
    # J = sum_x |a_x|^2, so cot_x = 2 a_x and the adjoint drive at x is
    # conj(cot_x) * w(x) (one weight factor from d acc_x / d E(x))
    a_grid = S.dft_view(acc)[..., 0]
    lo = np.array(mon_sites, np.int32).min(axis=0)
    Ehat = np.asarray(S.dft_view(np.asarray(state["dft"]["dr"])))[..., 0]

    st_adj = GaussianSource(frequency=f0, fwidth=0.3)
    amps = np.array(
        [np.conj(2.0 * a_grid[tuple(np.array(s) - lo)]) * w
         for s, w in zip(mon_sites, mon_w)], np.complex128)
    svol = SrcVolSpec(component=mon_comp,
                      indices=np.array(mon_sites, np.int32),
                      amps=amps, src_time=st_adj)
    ns = gv.shape[0]
    eps = _eps_grid(gv, eps_bg)
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    dfts = [DftSpec(name="dr", component="ez", region=((0, ns), (0, ns)),
                    weights=np.ones((ns, ns)), freqs=np.array([f0]),
                    centered=False)]
    plan_adj = compile_plan(gv, mat,
                            pmls=[PMLSpec(direction=d, thickness=0.8)
                                  for d in ("x", "y")],
                            sources=[svol], dfts=dfts, dtype=np.float64)
    st2 = S.init_state(plan_adj)
    st2 = S.run(plan_adj, st2, nsteps, jit=True, t0=0)
    Lam = np.asarray(S.dft_view(np.asarray(st2["dft"]["dr"])))[..., 0]
    dt = plan.dt
    ts = (np.arange(nsteps) + 0.5) * dt
    wfm = np.array([st_adj.current(t, dt) for t in ts])
    shat = np.sum(wfm * np.exp(1j * 2 * np.pi * f0 * ts)) * dt
    return Ehat, Lam / shat, dt


def fit_Z(g_true, prod, sl):
    gt = g_true[sl].ravel()
    pr = prod[sl].ravel()
    A = np.stack([pr.real, -pr.imag], axis=1)
    coef, *_ = np.linalg.lstsq(A, gt, rcond=None)
    Z = coef[0] + 1j * coef[1]
    resid = np.linalg.norm(A @ coef - gt) / max(np.linalg.norm(gt), 1e-300)
    return Z, resid


def case(tag, eps_bg=1.0, mon_comp="ez", mon_sites=((27, 18),),
         mon_w=(1.0,), f0=0.8, n=36, res=10, nsteps=900, eps2_local=True):
    gv, plan, st = setup(n, res, f0, eps_bg, mon_comp, mon_sites, mon_w)
    Jt, g = ground_truth(plan, nsteps)
    Ehat, Lam, dt = run_pair(gv, plan, f0, nsteps, eps_bg, mon_comp,
                             mon_sites, mon_w)
    u = np.asarray(plan.coefs["ez:u"])
    prod = Lam * Ehat
    if eps2_local:
        prod = prod / u ** 2       # times local eps(x)^2
    sl = (slice(10, n - 9), slice(10, n - 9))
    Z, resid = fit_Z(g, prod, sl)
    Zpred = Z_e(f0, dt)
    print(f"{tag}: Z={Z:.6e} resid={resid:.2e} "
          f"Z/Zpred={Z / Zpred:.6f}")


def eps_blob(gv):
    eps = np.ones(gv.shape, np.float64)
    nx, ny = gv.shape
    eps[nx // 2 - 6:nx // 2 + 2, ny // 2 - 8:ny // 2 + 4] = 4.0
    eps[nx // 2 + 3:nx // 2 + 8, ny // 2 - 2:ny // 2 + 6] = 2.25
    return eps


if __name__ == "__main__":
    case("A0 eps=1 (control)  ", eps_bg=1.0)
    case("A1 eps=4 local eps^2", eps_bg=4.0)
    case("D  eps blob  eps^2  ", eps_bg=eps_blob)
    case("B  3-site weights   ", mon_sites=((27, 17), (27, 18), (27, 19)),
         mon_w=(0.25, 0.5, 0.25))
    case("C  hy monitor       ", mon_comp="hy")
    case("E  two combos       ", mon_sites=((27, 16), (26, 20)),
         mon_w=(0.7, -0.4))
