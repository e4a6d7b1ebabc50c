"""Hybrid production run path (ops/pallas/hybrid.py): fused-kernel
stretches between DFT sample steps must reproduce the pure-jnp path —
fields to fp32 roundoff and DTFT flux to the same tolerance."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import meep_nl_tpu as mp


@pytest.fixture(autouse=True)
def _hybrid_cpu_env(monkeypatch):
    # explicit CPU opt-in for the hybrid, scoped to THESE tests only (a
    # module-level env set would leak into every test of the session)
    monkeypatch.setenv("MNT_HYBRID_CPU", "1")


def _sim(use_fused):
    fcen = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(4.0, 2.0, 2.0), resolution=8,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3(-1.2, 0, 0))],
        boundary_layers=[mp.PML(0.5)],
        use_fused=use_fused)
    flux = sim.add_flux(fcen, 0.2, 3,
                        mp.FluxRegion(center=mp.Vector3(1.2, 0, 0),
                                      size=mp.Vector3(0, 1.0, 1.0)))
    return sim, flux


def test_hybrid_matches_jnp_path():
    sim_j, flux_j = _sim(False)
    sim_j.run(until=6.0)
    sim_h, flux_h = _sim(True)
    sim_h.run(until=6.0)

    ez_j = sim_j.get_array(mp.Ez)
    ez_h = sim_h.get_array(mp.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)

    fj = np.asarray(sim_j.get_fluxes(flux_j))
    fh = np.asarray(sim_h.get_fluxes(flux_h))
    np.testing.assert_allclose(fh, fj, rtol=1e-4,
                               atol=1e-6 * np.abs(fj).max())


def test_hybrid_no_monitors_fully_fused():
    sim_j, _ = _sim(False)
    sim_h, _ = _sim(True)
    # drop the monitors: the whole stretch runs through the fused kernel
    sim_j._handles.clear(); sim_j._dft_specs.clear()
    sim_h._handles.clear(); sim_h._dft_specs.clear()
    sim_j.run(until=4.0)
    sim_h.run(until=4.0)
    ez_j = sim_j.get_array(mp.Ez)
    ez_h = sim_h.get_array(mp.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)


def test_hybrid_dispersive_depth3():
    """Monitored Lorentz-ball run through the hybrid: the cycle driver
    mixes 3/2-step fused calls (pure-ADE windows are depth-3 eligible)
    and must reproduce the jnp path's fields and flux."""
    from meep_nl_tpu.ops.pallas import hybrid as H

    def mk(use_fused):
        fcen = 1.0
        med = mp.Medium(epsilon=4.0, E_susceptibilities=[
            mp.LorentzianSusceptibility(frequency=2.0, gamma=0.05,
                                        sigma=0.3)])
        sim = mp.Simulation(
            cell_size=mp.Vector3(4.0, 2.0, 2.0), resolution=8,
            geometry=[mp.Sphere(radius=0.4, center=mp.Vector3(0.3, 0, 0),
                                material=med)],
            sources=[mp.Source(mp.GaussianSource(frequency=fcen,
                                                 fwidth=0.4),
                               component=mp.Ez,
                               center=mp.Vector3(-1.2, 0, 0))],
            boundary_layers=[mp.PML(0.5)],
            use_fused=use_fused, eps_averaging=False)
        flux = sim.add_flux(fcen, 0.2, 3,
                            mp.FluxRegion(center=mp.Vector3(1.2, 0, 0),
                                          size=mp.Vector3(0, 1.0, 1.0)))
        return sim, flux

    sim_j, flux_j = mk(False)
    sim_j.run(until=6.0)
    sim_h, flux_h = mk(True)
    sim_h.run(until=6.0)
    # the depth-3 companion must actually have engaged
    ker = getattr(sim_h._plan, "_t2_kernel", None)
    assert ker is not None and getattr(ker, "k3", None) is not None
    ez_j = sim_j.get_array(mp.Ez)
    ez_h = sim_h.get_array(mp.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)
    fj = np.asarray(sim_j.get_fluxes(flux_j))
    fh = np.asarray(sim_h.get_fluxes(flux_h))
    np.testing.assert_allclose(fh, fj, rtol=1e-4,
                               atol=1e-6 * np.abs(fj).max())


def _sim_cond(use_fused):
    """Lossy dielectric block in the interior (D conductivity): rides the
    fused path via the conductivity fold (ops/pallas/condfold)."""
    fcen = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(4.0, 2.0, 2.0), resolution=8,
        geometry=[mp.Block(center=mp.Vector3(0.4, 0, 0),
                           size=mp.Vector3(0.8, 0.8, 0.8),
                           material=mp.Medium(epsilon=2.0,
                                              D_conductivity=1.5))],
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3(-1.2, 0, 0))],
        boundary_layers=[mp.PML(0.5)],
        use_fused=use_fused)
    flux = sim.add_flux(fcen, 0.2, 3,
                        mp.FluxRegion(center=mp.Vector3(1.2, 0, 0),
                                      size=mp.Vector3(0, 1.0, 1.0)))
    return sim, flux


def test_hybrid_conductivity_fold():
    sim_j, flux_j = _sim_cond(False)
    sim_j.run(until=6.0)
    sim_h, flux_h = _sim_cond(True)
    sim_h.run(until=6.0)
    # the fold must actually have engaged (not a silent jnp fallback)
    assert getattr(sim_h._plan, "_cond_fold", None) not in (None, False)
    assert not getattr(sim_h._plan, "_hybrid_broken", False)

    ez_j = sim_j.get_array(mp.Ez)
    ez_h = sim_h.get_array(mp.Ez)
    scale = np.abs(ez_j).max()
    assert scale > 0
    np.testing.assert_allclose(ez_h, ez_j, atol=5e-6 * scale)

    fj = np.asarray(sim_j.get_fluxes(flux_j))
    fh = np.asarray(sim_h.get_fluxes(flux_h))
    np.testing.assert_allclose(fh, fj, rtol=1e-4,
                               atol=1e-6 * np.abs(fj).max())


def test_fused_probed_run():
    """Harminv/FieldProbe time series through the fused probed path must
    match the jnp per-step probes exactly enough for mode analysis."""
    from meep_nl_tpu.models.run_control import FieldProbe

    def mk(use_fused):
        return mp.Simulation(
            cell_size=mp.Vector3(4.0, 2.0, 2.0), resolution=8,
            geometry=[mp.Block(center=mp.Vector3(0.3, 0, 0),
                               size=mp.Vector3(0.7, 0.7, 0.7),
                               material=mp.Medium(epsilon=4.0))],
            sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.4),
                               component=mp.Ez,
                               center=mp.Vector3(-1.2, 0, 0))],
            boundary_layers=[mp.PML(0.5)],
            use_fused=use_fused)

    pt = mp.Vector3(0.3, 0.1, 0.0)
    sim_h = mk(True)
    pr_h = FieldProbe(mp.Ez, pt)
    sim_h.run(pr_h, until=5.0)
    assert not getattr(sim_h._plan, "_hybrid_broken", False)
    assert getattr(sim_h._plan, "_fused_probe_cache", None), \
        "fused probed path must have engaged"
    sim_j = mk(False)
    pr_j = FieldProbe(mp.Ez, pt)
    sim_j.run(pr_j, until=5.0)
    a = np.real(np.asarray(pr_h.data, np.complex128))
    b = np.real(np.asarray(pr_j.data, np.complex128))
    assert len(a) == len(b) and len(a) > 10
    scale = np.abs(b).max()
    assert scale > 0
    np.testing.assert_allclose(a, b, atol=5e-6 * scale)


def test_hybrid_plane_dft_engages():
    """The plane-sampled DFT cycle (no full-grid to_full per sample)
    must ENGAGE for a plain x-normal flux monitor — guards against a
    silent fallback to the reconstruction path."""
    from meep_nl_tpu.ops.pallas import hybrid as H

    sim_h, flux_h = _sim(True)
    sim_h.run(until=2.0)
    ker = H._get_kernel(sim_h._plan)
    meta = H._dft_plane_meta(sim_h._plan, ker._k1.L)
    assert meta is not None
    # all four tangential flux components gathered, small x-extents
    assert len(meta) == len(sim_h._plan.dfts)
    for (c, x0, x1e, avg, _) in meta:
        # a plane monitor: <= 2 component planes + 1 x-averaging plane
        assert x1e - x0 <= 3


def test_hybrid_d1_nonlinear_monitored():
    """Nonlinear media disable decimation (dft.cpp:195) so every step
    samples (d=1); the hybrid still runs fused — one 1-step kernel call
    + plane-DFT read per cycle — instead of falling back to jnp
    (measured 0.87 -> 3.79 GCells/s on chip at 127^3)."""
    import meep_nl_tpu as mp

    def build(fused):
        med = mp.Medium(epsilon=4.0, chi2=0.3)
        sim = mp.Simulation(
            cell_size=mp.Vector3(3, 1, 1), resolution=8,
            geometry=[mp.Block(size=mp.Vector3(0.5, 0.4, 0.4),
                               center=mp.Vector3(0.3, 0, 0),
                               material=med)],
            sources=[mp.Source(mp.GaussianSource(frequency=1.0,
                                                 fwidth=0.5),
                               component=mp.Ez,
                               center=mp.Vector3(-1.0, 0, 0))],
            boundary_layers=[mp.PML(0.25, direction="x")],
            use_fused=fused, eps_averaging=False)
        fl = sim.add_flux(1.0, 0.2, 2,
                          mp.FluxRegion(center=mp.Vector3(1.0, 0, 0),
                                        size=mp.Vector3(0, 0.5, 0.5)))
        sim.run(until=6.0)
        return np.asarray(sim.get_fluxes(fl)), sim

    (a, sa), (b, _sb) = build(True), build(False)
    assert all(m.decimation == 1 for m in sa.plan.dfts)
    np.testing.assert_allclose(a, b, rtol=3e-4)
    # the d=1 stretch must run the CAPTURE kernel (in-kernel DFT plane
    # emission keeps the deep temporal fusion; round-5), not one-step
    # cycles
    assert getattr(sa.plan, "_cap_kernel", None) is not None
