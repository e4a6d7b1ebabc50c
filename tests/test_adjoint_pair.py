"""Two-run (forward/adjoint pair) gradients vs native AD ground truth.

The pairing identity (adjoint/tworun.py) was calibrated against jax.grad
in scripts/adjoint_pair_calib*.py; these tests gate the full production
chain: Simulation-built plans, centered flux monitors with dV weights and
negative pair scales, magnetic-current cotangents, the density->eps VJP,
and multi-frequency objectives.  The analog of the reference's adjoint
solver tests (python/tests/test_adjoint_solver.py) with the roles
swapped: there FD validates the two-run machinery, here native AD does.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.adjoint import (DesignRegion, DesignVariables,
                                 OptimizationProblem)


def _problem(gradient_method, nfreq=1, run_time=120.0):
    fcen, df = 0.8, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 6), resolution=10,
        geometry=[
            mp.Block(size=mp.Vector3(2, 2, mp.inf), center=mp.Vector3(0, 0),
                     material=mp.Medium(epsilon=6.0)),
        ],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3(-2.5, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    flux = sim.add_flux(fcen, 0.2 if nfreq > 1 else 0.0, nfreq,
                        mp.FluxRegion(center=mp.Vector3(2.5, 0),
                                      size=mp.Vector3(0, 2)))

    def objective(dfts):
        total = 0.0
        for i in range(2):
            ekey, hkey = f"{flux.name}:0:e{i}", f"{flux.name}:0:h{i}"
            if ekey not in dfts:
                continue
            total = total + jnp.sum(
                jnp.real(dfts[ekey] * jnp.conj(dfts[hkey])))
        return total

    # eps_max 4: random higher-contrast patterns (eps ~ 9) can trap
    # quasi-bound states with Q >> any reasonable run length, where the
    # pairing identity's decayed-run requirement fails (the engine warns)
    dr = DesignRegion(DesignVariables(shape=(6, 6), eps_min=1.0,
                                      eps_max=4.0),
                      center=[0.0, 0.0], size=[2.0, 2.0])
    return OptimizationProblem(simulation=sim, objective=objective,
                               design_regions=[dr], run_time=run_time,
                               gradient_method=gradient_method)


def test_pair_gradient_matches_ad():
    """Pair vs native-AD gradients on the transmission objective: the two
    must agree pointwise once both runs are decayed (truncation is the
    only approximation in the pairing identity)."""
    rng = np.random.RandomState(0)
    rho = 0.4 + 0.2 * rng.rand(6, 6)
    opt_ad = _problem("ad")
    f_ad, (g_ad,) = opt_ad(jnp.asarray(rho, jnp.float32))
    opt_pair = _problem("pair")
    f_pair, (g_pair,) = opt_pair(jnp.asarray(rho, jnp.float32))
    assert np.isfinite(f_pair) and f_pair > 0
    np.testing.assert_allclose(f_pair, f_ad, rtol=1e-4)
    scale = np.max(np.abs(g_ad))
    np.testing.assert_allclose(g_pair, g_ad, atol=5e-3 * scale, rtol=0.02)


def test_pair_gradient_multifreq():
    """Three objective frequencies through ONE broadband adjoint run (the
    tone-basis analog of the reference's FilteredSource): the combined
    drive has exact per-frequency amplitudes, so the summed gradient
    still matches native AD."""
    rng = np.random.RandomState(1)
    rho = 0.45 + 0.1 * rng.rand(6, 6)
    opt_ad = _problem("ad", nfreq=3)
    f_ad, (g_ad,) = opt_ad(jnp.asarray(rho, jnp.float32))
    opt_pair = _problem("pair", nfreq=3)
    f_pair, (g_pair,) = opt_pair(jnp.asarray(rho, jnp.float32))
    # the single broadband adjoint plan must have been used (well-
    # conditioned tone basis), not the one-run-per-frequency fallback
    assert "broadband" in opt_pair._engine._adj_cache
    np.testing.assert_allclose(f_pair, f_ad, rtol=1e-4)
    scale = np.max(np.abs(g_ad))
    np.testing.assert_allclose(g_pair, g_ad, atol=5e-3 * scale, rtol=0.02)


def test_pair_second_call_reuses_runners():
    """A second gradient at a different density must not rebuild the
    adjoint plans (fixed source structure) and stays accurate."""
    rng = np.random.RandomState(2)
    opt = _problem("pair")
    rho1 = 0.4 + 0.2 * rng.rand(6, 6)
    rho2 = 0.4 + 0.2 * rng.rand(6, 6)
    opt(jnp.asarray(rho1, jnp.float32))
    cache_after_first = dict(opt._engine._adj_cache)
    f2, (g2,) = opt(jnp.asarray(rho2, jnp.float32))
    for k, v in opt._engine._adj_cache.items():
        assert cache_after_first[k] is v      # same plan objects reused
    # spot-check against FD through the pair objective
    idx = (3, 2)
    fd = opt.calculate_fd_gradient(rho2, idx, drho=3e-3)
    assert abs(g2[idx] - fd) <= 0.02 * max(abs(fd), 1e-6), (g2[idx], fd)


def test_pair_warns_when_undecayed():
    """The engine must warn when a run is truncated before decay (the
    regime where the pairing identity carries an error)."""
    rng = np.random.RandomState(0)
    rho = 0.4 + 0.2 * rng.rand(6, 6)
    opt = _problem("pair", run_time=24.0)
    with pytest.warns(UserWarning, match="not decayed"):
        opt(jnp.asarray(rho, jnp.float32))


@pytest.mark.slow
def test_pair_gradient_3d():
    """3D pair vs AD: validates the pairing constants and the
    multi-component (ex/ey/ez) design rows in 3D — the BASELINE config-5
    geometry class at miniature scale."""
    fcen = 0.8

    def mk(method):
        sim = mp.Simulation(
            cell_size=mp.Vector3(5, 4, 4), resolution=8,
            geometry=[mp.Block(size=mp.Vector3(1.5, 1.5, 1.5),
                               center=mp.Vector3(0, 0, 0),
                               material=mp.Medium(epsilon=4.0))],
            sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.3),
                               component=mp.Ez, center=mp.Vector3(-1.5, 0, 0),
                               size=mp.Vector3(0, 2, 2))],
            boundary_layers=[mp.PML(0.8)])
        flux = sim.add_flux(fcen, 0.0, 1,
                            mp.FluxRegion(center=mp.Vector3(1.6, 0, 0),
                                          size=mp.Vector3(0, 2, 2)))

        def objective(dfts):
            tot = 0.0
            for i in range(2):
                ek, hk = f"{flux.name}:0:e{i}", f"{flux.name}:0:h{i}"
                if ek in dfts:
                    tot = tot + jnp.sum(
                        jnp.real(dfts[ek] * jnp.conj(dfts[hk])))
            return tot

        dr = DesignRegion(DesignVariables(shape=(4, 4, 4), eps_min=1.0,
                                          eps_max=4.0),
                          center=[0.0, 0.0, 0.0], size=[1.5, 1.5, 1.5])
        return OptimizationProblem(simulation=sim, objective=objective,
                                   design_regions=[dr], run_time=120.0,
                                   gradient_method=method)

    rng = np.random.RandomState(0)
    rho = jnp.asarray(0.4 + 0.2 * rng.rand(4, 4, 4), jnp.float32)
    f_ad, (g_ad,) = mk("ad")(rho)
    f_pair, (g_pair,) = mk("pair")(rho)
    np.testing.assert_allclose(f_pair, f_ad, rtol=1e-4)
    scale = np.max(np.abs(g_ad))
    np.testing.assert_allclose(g_pair, g_ad, atol=0.02 * scale, rtol=0.05)


def test_pair_mixed_monitor_freqs_and_dict_objective():
    """Two review regressions in one config: (a) monitors carrying
    DIFFERENT frequency subsets must still get exact per-frequency
    broadband amplitudes (each monitor needs the full tone basis so its
    leakage at uncarried frequencies is cancelled); (b) an objective
    that ITERATES the dft dict must see only the user monitors, not the
    engine's internal adjdr:* design accumulators."""
    fcen = 0.8

    def mk(method):
        sim = mp.Simulation(
            cell_size=mp.Vector3(8, 6), resolution=10,
            geometry=[mp.Block(size=mp.Vector3(2, 2, mp.inf),
                               center=mp.Vector3(0, 0),
                               material=mp.Medium(epsilon=4.0))],
            sources=[mp.Source(mp.GaussianSource(frequency=fcen,
                                                 fwidth=0.3),
                               component=mp.Ez, center=mp.Vector3(-2.5, 0),
                               size=mp.Vector3(0, 2))],
            boundary_layers=[mp.PML(1.0)])
        fl_a = sim.add_flux(0.75, 0.0, 1, mp.FluxRegion(
            center=mp.Vector3(2.5, 0), size=mp.Vector3(0, 2)))
        fl_b = sim.add_flux(0.85, 0.0, 1, mp.FluxRegion(
            center=mp.Vector3(2.5, 1.0), size=mp.Vector3(0, 1.5)))

        def objective(dfts):
            # dict-iterating objective: must see ONLY user monitors
            tot = 0.0
            for k in sorted(dfts):
                assert not k.startswith("adjdr:"), k
                if k.endswith(":e1"):
                    hk = k.replace(":e1", ":h1")
                    tot = tot + jnp.sum(jnp.real(dfts[k]
                                                 * jnp.conj(dfts[hk])))
            return tot

        dr = DesignRegion(DesignVariables(shape=(5, 5), eps_min=1.0,
                                          eps_max=4.0),
                          center=[0.0, 0.0], size=[2.0, 2.0])
        return OptimizationProblem(simulation=sim, objective=objective,
                                   design_regions=[dr], run_time=120.0,
                                   gradient_method=method)

    rng = np.random.RandomState(3)
    rho = jnp.asarray(0.4 + 0.2 * rng.rand(5, 5), jnp.float32)
    f_ad, (g_ad,) = mk("ad")(rho)
    opt = mk("pair")
    f_pair, (g_pair,) = opt(rho)
    assert "broadband" in opt._engine._adj_cache   # 2 distinct freqs
    np.testing.assert_allclose(f_pair, f_ad, rtol=1e-4)
    scale = np.max(np.abs(g_ad))
    np.testing.assert_allclose(g_pair, g_ad, atol=7e-3 * scale, rtol=0.02)
