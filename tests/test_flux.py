"""DTFT flux monitors: power conservation (analog of tests/flux.cpp and the
bend-flux tutorial normalization runs)."""

import numpy as np

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import PMLSpec, compile_plan
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.stepper import monitors as M

from helpers import make_point_source, vacuum_mat


def test_1d_flux_two_planes_agree():
    """Transmitted spectrum through vacuum is plane-position independent."""
    gv = G.GridVolume.create("1d", [16.0], 20.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.4)
    s = make_point_source(gv, "ex", [-4.0], src)
    freqs = np.linspace(0.8, 1.2, 5)
    specs = (M.flux_specs(gv, "f1", "z", [1.0], [0.0], freqs, live=["ex", "hy"])
             + M.flux_specs(gv, "f2", "z", [4.0], [0.0], freqs, live=["ex", "hy"]))
    plan = compile_plan(gv, vacuum_mat(), pmls=[PMLSpec("z", 2.0)],
                        sources=[s], dfts=specs)
    state = init_state(plan)
    nsteps = int((src.last_time() + 30.0) / plan.dt)
    state = run(plan, state, nsteps)
    f1 = M.get_flux(plan, state, "f1")
    f2 = M.get_flux(plan, state, "f2")
    assert np.all(f1 > 0)
    np.testing.assert_allclose(f1, f2, rtol=1e-3)


def test_2d_box_flux_independent_of_size():
    """Net outward flux through a closed box around the source is the same
    for two box sizes (Poynting theorem in vacuum)."""
    gv = G.GridVolume.create("2d", [10.0, 10.0], 16.0)
    src = mnt.GaussianSource(frequency=1.0, fwidth=0.4)
    s = make_point_source(gv, "ez", [0.0, 0.0], src)
    freqs = np.linspace(0.9, 1.1, 3)
    live = ["ez", "hx", "hy"]

    def box(name, half):
        specs = []
        L = 2 * half
        specs += M.flux_specs(gv, f"{name}xp", "x", [half, 0.0], [0.0, L],
                              freqs, live=live)
        specs += M.flux_specs(gv, f"{name}xm", "x", [-half, 0.0], [0.0, L],
                              freqs, weight=-1.0, live=live)
        specs += M.flux_specs(gv, f"{name}yp", "y", [0.0, half], [L, 0.0],
                              freqs, live=live)
        specs += M.flux_specs(gv, f"{name}ym", "y", [0.0, -half], [L, 0.0],
                              freqs, weight=-1.0, live=live)
        return specs

    specs = box("a", 1.0) + box("b", 2.5)
    plan = compile_plan(gv, vacuum_mat(),
                        pmls=[PMLSpec("x", 1.5), PMLSpec("y", 1.5)],
                        sources=[s], dfts=specs)
    state = init_state(plan)
    nsteps = int((src.last_time() + 25.0) / plan.dt)
    state = run(plan, state, nsteps)

    def net(name):
        return sum(M.get_flux(plan, state, f"{name}{side}")
                   for side in ["xp", "xm", "yp", "ym"])

    fa, fb = net("a"), net("b")
    assert np.all(fa > 0)
    np.testing.assert_allclose(fa, fb, rtol=2e-3)


def test_volume_weights_sum_to_length():
    """Integration weights must sum to the volume extent / dx."""
    gv = G.GridVolume.create("2d", [8.0, 8.0], 10.0)
    region, w, dv = M.volume_region_weights(gv, [0.0, 0.3], [3.1, 0.0])
    assert dv == gv.dx
    # weights along x sum to 3.1/dx, and the y interpolation sums to 1
    assert abs(w.sum() - 3.1 / gv.dx) < 1e-6


def test_auto_decimation_matches_full_rate():
    """decimation_factor=0 (default) picks the Nyquist-safe subsampling
    (dft.cpp:195) and must reproduce the full-rate DTFT."""
    import meep_nl_tpu as mp

    def run(dec):
        sim = mp.Simulation(cell_size=mp.Vector3(6, 4), resolution=12,
                            sources=[mp.Source(
                                mp.GaussianSource(frequency=0.8, fwidth=0.3),
                                component=mp.Ez, center=mp.Vector3(-1.5, 0),
                                size=mp.Vector3(0, 2))],
                            boundary_layers=[mp.PML(1.0)])
        fl = sim.add_flux(0.8, 0.3, 5,
                          mp.FluxRegion(center=mp.Vector3(1.5, 0),
                                        size=mp.Vector3(0, 2)),
                          decimation_factor=dec)
        sim.init_sim()
        d = next(s.decimation for s in sim._plan.dfts
                 if s.name.startswith("fl"))
        sim.run(until=40)
        return d, np.array(sim.get_fluxes(fl))

    d1, f1 = run(1)
    da, fa = run(0)
    assert d1 == 1 and da > 1
    assert np.abs(fa - f1).max() < 1e-4 * np.abs(f1).max()
