"""Gyrotropic (Faraday rotation) and noisy susceptibilities
(test_faraday_rotation.py pattern; susceptibility.cpp:317,445)."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def test_noisy_susceptibility_emits_fields():
    """A noisy medium with no sources generates thermal-like fields
    (the reference's noise-driven Langevin source)."""
    med = mp.Medium(epsilon=2.0, E_susceptibilities=[
        mp.models.geom.NoisyLorentzianSusceptibility(
            frequency=0.8, gamma=0.3, sigma=0.5, noise_amp=0.1)])
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=10,
                        geometry=[mp.Block(size=mp.Vector3(2, 2, mp.inf),
                                           center=mp.Vector3(),
                                           material=med)],
                        # a silent source pins the live TM component set
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.8, fwidth=0.3),
                            component=mp.Ez, center=mp.Vector3(),
                            amplitude=0.0)],
                        boundary_layers=[mp.PML(1.0)])
    sim.run(until=30)
    ez = np.asarray(sim.fields_state["f"]["ez"])
    assert np.all(np.isfinite(ez))
    assert np.abs(ez).max() > 1e-8  # noise-driven fields appeared


def test_faraday_rotation():
    """1D propagation through a gyrotropic medium rotates polarization
    (test_faraday_rotation.py).  Uses a 3D thin rod with periodic x/y."""
    # gyrotropic medium biased along z, wave propagating along z
    f0, gam, sn, b0 = 1.5, 20e-6, 1.5, 0.64
    med = mp.Medium(epsilon=1.0, E_susceptibilities=[
        mp.models.geom.GyrotropicLorentzianSusceptibility(
            frequency=f0, gamma=gam, sigma=sn,
            bias=mp.Vector3(0, 0, b0))])
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 20), resolution=24,
                        dimensions=3,  # need all E components for precession
                        default_material=med,
                        sources=[mp.Source(
                            mp.ContinuousSource(frequency=0.8, width=2.0),
                            component=mp.Ex, center=mp.Vector3(0, 0, -8.0))],
                        boundary_layers=[mp.PML(2.0)])
    # 1d cell but force 3d component set? -> use a real 1d run instead:
    sim = mp.Simulation(cell_size=mp.Vector3(1.0/24*8, 1.0/24*8, 20),
                        resolution=24,
                        default_material=med,
                        k_point=mp.Vector3(0, 0, 0),
                        sources=[mp.Source(
                            mp.ContinuousSource(frequency=0.8, width=2.0),
                            component=mp.Ex, center=mp.Vector3(0, 0, -8.0),
                            size=mp.Vector3(1.0/24*8, 1.0/24*8, 0))],
                        boundary_layers=[mp.PML(2.0, direction=mp.Z)])
    sim.run(until=30)
    # after propagating, Ey amplitude appears (rotation); without bias none
    ex = np.asarray(sim.get_array(component=mp.Ex))
    ey = np.asarray(sim.get_array(component=mp.Ey))
    assert np.all(np.isfinite(ex)) and np.all(np.isfinite(ey))
    mid = tuple(s // 2 for s in ex.shape[:2])
    zprobe = int(ex.shape[2] * 0.65)
    ex_amp = abs(ex[mid[0], mid[1], zprobe])
    ey_amp = abs(ey[mid[0], mid[1], zprobe])
    assert ex_amp > 1e-6
    # Faraday rotation: orthogonal polarization generated
    assert ey_amp > 0.02 * ex_amp, (ex_amp, ey_amp)


def test_bfast_stable_and_off_by_default():
    """BFAST (step_generic.cpp:339): exactly inert when k=0, and a HARD
    error for single-partner component sets (2D TM) where the flip-flop
    recurrence is outside the stable envelope.  (Quantitative 3D
    oblique-incidence validation: tests/test_bfast.py.)"""
    def run(bk):
        cour = 0.5 if bk is None or not any(tuple(bk)) else \
            (1 - max(abs(v) for v in tuple(bk))) / np.sqrt(2)
        sim = mp.Simulation(cell_size=mp.Vector3(6, 6), resolution=10,
                            Courant=cour,
                            sources=[mp.Source(
                                mp.GaussianSource(frequency=1.0, fwidth=0.4),
                                component=mp.Ez, center=mp.Vector3(-2, 0),
                                size=mp.Vector3(0, 3))],
                            boundary_layers=[mp.PML(1.0)],
                            bfast_scaled_k=bk)
        sim.run(until=25)
        return np.asarray(sim.fields_state["f"]["ez"])

    e0 = run(None)
    ez0 = run(mp.Vector3(0, 0, 0))
    np.testing.assert_array_equal(np.asarray(ez0), e0)  # k=0 inert
    # 2D TM has single-partner curls along x: BFAST must refuse, not
    # silently drop the s*dH/dt term (the round-1 silent narrowing)
    with pytest.raises(ValueError, match="single partner"):
        run(mp.Vector3(0.5, 0, 0))
