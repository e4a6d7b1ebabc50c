"""Calibration experiment for the forward/adjoint-pair gradient.

Goal: find the exact pairing formula  g_u(x) = Re[ Z * lam_hat(x) * ghat(x) ]
relating the jax.grad ground truth dJ/du(x) (u = inverse-eps row) to the
product of the forward run's design-region DTFT and an adjoint run's DTFT,
with Z a site-independent complex constant whose frequency/dt structure we
identify empirically.  This mirrors the reference's two-run adjoint
(python/adjoint/optimization_problem.py) but is validated against native AD.

Run:  python scripts/adjoint_pair_calib.py
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
from meep_nl_tpu.models.source import GaussianSource


def make_gv(n=48, res=10):
    # 2D TM cell, (n+1) x (n+1) sites
    return G.GridVolume.create("2d", (n / res, n / res), res)


def base_setup(n=48, res=10, f0=0.8, eps_design=1.0, nsteps=800,
               mon=None, src=None):
    gv = make_gv(n, res)
    eps = np.ones(gv.shape, np.float64)
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    pmls = [PMLSpec(direction=d, thickness=0.8) for d in ("x", "y")]
    if src is None:
        src = (n // 4, n // 2)
    st = GaussianSource(frequency=f0, fwidth=0.3)
    svol = SrcVolSpec(component="ez",
                      indices=np.array([src], np.int32),
                      amps=np.array([1.0 + 0j]), src_time=st)
    if mon is None:
        mon = (3 * n // 4, n // 2)
    ns = gv.shape[0]
    dfts = [
        DftSpec(name="obj", component="ez",
                region=((mon[0], mon[0] + 1), (mon[1], mon[1] + 1)),
                weights=np.ones((1, 1)), freqs=np.array([f0]),
                centered=False),
        # full-interior design DFT (forward fields)
        DftSpec(name="dr", component="ez",
                region=((0, ns), (0, ns)),
                weights=np.ones((ns, ns)), freqs=np.array([f0]),
                centered=False),
    ]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[svol], dfts=dfts,
                        dtype=np.float64)
    return gv, plan, st, mon, f0, nsteps


def ground_truth(plan, nsteps):
    """dJ/du(x) with J = |obj acc|^2, via jax.grad through the stepper."""
    from meep_nl_tpu.adjoint.optimization import run_differentiable

    def J(u_row):
        coefs = dict(plan.coefs)
        coefs["ez:u"] = u_row
        st = run_differentiable(plan, nsteps, coefs)
        acc = st["dft"]["obj"]          # (1,1,nfreq,2)
        return jnp.sum(acc ** 2)

    u0 = plan.coefs["ez:u"]
    val, g = jax.value_and_grad(J)(u0)
    return float(val), np.asarray(g)


def pair_fields(plan, nsteps, f0, mon, gv):
    """Forward + adjoint runs; return (J, Ghat_fwd(x), Lam_hat(x), shat)."""
    state = S.init_state(plan)
    state = S.run(plan, state, nsteps, jit=True, t0=0)
    acc = np.asarray(state["dft"]["obj"])     # (1,1,1,2)
    J = float(np.sum(acc ** 2))
    a = acc[0, 0, 0, 0] + 1j * acc[0, 0, 0, 1]
    Gcot = 2.0 * a                             # dJ/dacc as complex cotangent
    Ehat_fwd = np.asarray(S.dft_view(np.asarray(state["dft"]["dr"])))[..., 0]

    # ---- adjoint run: source at the monitor site, same bandwidth pulse
    st_adj = GaussianSource(frequency=f0, fwidth=0.3)
    svol = SrcVolSpec(component="ez",
                      indices=np.array([mon], np.int32),
                      amps=np.array([np.conj(Gcot)]), src_time=st_adj)
    ns = gv.shape[0]
    dfts = [DftSpec(name="dr", component="ez", region=((0, ns), (0, ns)),
                    weights=np.ones((ns, ns)), freqs=np.array([f0]),
                    centered=False)]
    mat = MaterialSpec(chi1inv={"ez": {"z": np.asarray(1.0 / np.ones(gv.shape))}})
    plan_adj = compile_plan(gv, mat,
                            pmls=[PMLSpec(direction=d, thickness=0.8)
                                  for d in ("x", "y")],
                            sources=[svol], dfts=dfts, dtype=np.float64)
    st2 = S.init_state(plan_adj)
    st2 = S.run(plan_adj, st2, nsteps, jit=True, t0=0)
    Lam = np.asarray(S.dft_view(np.asarray(st2["dft"]["dr"])))[..., 0]

    # injected-current spectrum of the adjoint pulse at f0 (E currents are
    # sampled at (t+0.5) dt and enter f with a dt factor; DTFT with the
    # same e^{+i w t} kernel used by the monitors)
    dt = plan.dt
    ts = (np.arange(nsteps) + 0.5) * dt
    w = np.array([st_adj.current(t, dt) for t in ts])
    shat = np.sum(w * np.exp(1j * 2 * np.pi * f0 * ts)) * dt
    return J, Ehat_fwd, Lam, shat, dt


def fit_Z(g_true, prod, sl):
    """Least-squares complex Z with g_true ~ Re[Z * prod] over slice sl."""
    gt = g_true[sl].ravel()
    pr = prod[sl].ravel()
    # Re[Z p] = Zr Re p - Zi Im p
    A = np.stack([pr.real, -pr.imag], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, gt, rcond=None)
    Z = coef[0] + 1j * coef[1]
    resid = np.linalg.norm(A @ coef - gt) / max(np.linalg.norm(gt), 1e-300)
    return Z, resid


def main():
    n, res = 36, 10
    for f0 in (0.8,):
        gv, plan, st, mon, _, nsteps = base_setup(n=n, res=res, f0=f0)
        import time; t0=time.time()
        Jt, g_true = ground_truth(plan, nsteps)
        print(f"  ground truth took {time.time()-t0:.1f}s", flush=True)
        Jp, Ehat, Lam, shat, dt = pair_fields(plan, nsteps, f0, mon, gv)
        print(f"f0={f0}: J true={Jt:.6e} pair={Jp:.6e}", flush=True)
        prod = (Lam / shat) * Ehat
        # interior fit region (away from PML: 8 sites in)
        sl = (slice(10, n - 9), slice(10, n - 9))
        Z, resid = fit_Z(g_true, prod, sl)
        print(f"  Z = {Z:.6e}  |Z| = {abs(Z):.6e} arg = {np.angle(Z):.6f}")
        print(f"  relative residual over interior: {resid:.3e}")
        print(f"  dt = {dt}, w0*dt = {2*np.pi*f0*dt:.6f}")
        # candidate normalizations
        s_dft = dt / np.sqrt(2 * np.pi)
        print(f"  |Z|*s_dft^2/dt = {abs(Z)*s_dft**2/dt:.6e}")
        print(f"  |Z|*s_dft^2 = {abs(Z)*s_dft**2:.6e}")
        print(f"  arg/(w0*dt) = {np.angle(Z)/(2*np.pi*f0*dt):.4f}")


if __name__ == "__main__":
    main()
