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


def _kgyro(freq, epsn, f0, gamma, sigma, b0=None, alpha=None,
           drude=False):
    """Analytic Faraday rotation rate (circular birefringence of a
    z-biased gyrotropic medium; standard magneto-optics dispersion)."""
    if alpha is not None:                       # linearized LLG
        df1 = f0 - 1j * freq * alpha
        df2 = freq + 1j * gamma
        eperp = epsn + sigma * df1 / (df1 ** 2 - df2 ** 2)
        eta = sigma * df2 / (df1 ** 2 - df2 ** 2)
    else:
        dfsq = (0.0 if drude else f0 ** 2) - 1j * freq * gamma - freq ** 2
        eperp = epsn + sigma * f0 ** 2 * dfsq / (dfsq ** 2
                                                 - (freq * b0) ** 2)
        eta = sigma * f0 ** 2 * freq * b0 / (dfsq ** 2 - (freq * b0) ** 2)
    return 2 * np.pi * freq * np.sqrt(
        0.5 * (eperp - np.sqrt(eperp ** 2 - eta ** 2)))


def _rotation_angle(susc, epsn, freq=0.8, L=12.0, zsrc=-4.5, zout=4.0,
                    res=24, tmax=100.0):
    """Linearly-polarized CW wave along the bias axis; rotation angle
    from the Ex/Ey steady-state amplitudes (test_faraday_rotation.py
    check_rotation)."""
    med = mp.Medium(epsilon=epsn, E_susceptibilities=[susc])
    w = 8.0 / res
    sim = mp.Simulation(cell_size=mp.Vector3(w, w, L), resolution=res,
                        default_material=med, k_point=mp.Vector3(0, 0, 0),
                        sources=[mp.Source(
                            mp.ContinuousSource(frequency=freq),
                            component=mp.Ex,
                            center=mp.Vector3(0, 0, zsrc),
                            size=mp.Vector3(w, w, 0))],
                        boundary_layers=[mp.PML(1.0, direction="z")])
    pex = mp.FieldProbe("ex", mp.Vector3(0, 0, zout))
    pey = mp.FieldProbe("ey", mp.Vector3(0, 0, zout))
    sim.run(pex, pey, until=tmax)
    half = len(pex.data) // 2
    ex_rel = np.max(np.abs(np.fft.fft(np.asarray(pex.data[half:], float))))
    ey_rel = np.max(np.abs(np.fft.fft(np.asarray(pey.data[half:], float))))
    return np.arctan2(ey_rel, ex_rel) * 180 / np.pi


def _expected_angle(k, zsrc=-4.5, zout=4.0):
    return np.arctan2(abs(np.sin(k * (zout - zsrc)).real),
                      abs(np.cos(k * (zout - zsrc)).real)) * 180 / np.pi


@pytest.mark.slow
def test_faraday_rotation_quantitative():
    """Rotation angle vs the analytic dispersion for all three
    gyrotropy models (test_faraday_rotation.py; 1.5-degree gate)."""
    epsn, f0, gamma, sn, b0 = 1.5, 1.0, 1e-3, 0.1, 0.15
    # gyrotropic Lorentzian
    ang = _rotation_angle(mp.GyrotropicLorentzianSusceptibility(
        frequency=f0, gamma=gamma, sigma=sn, bias=mp.Vector3(0, 0, b0)),
        epsn)
    exp = _expected_angle(_kgyro(0.8, epsn, f0, gamma, sn, b0=b0))
    assert abs(ang - exp) < 1.5, ("lorentzian", ang, exp)
    # gyrotropic Drude
    ang = _rotation_angle(mp.GyrotropicDrudeSusceptibility(
        frequency=f0, gamma=gamma, sigma=sn, bias=mp.Vector3(0, 0, b0)),
        epsn)
    exp = _expected_angle(_kgyro(0.8, epsn, f0, gamma, sn, b0=b0,
                                 drude=True))
    assert abs(ang - exp) < 1.5, ("drude", ang, exp)
    # saturated (linearized Landau-Lifshitz-Gilbert)
    alpha = 1e-5
    ang = _rotation_angle(mp.models.geom.GyrotropicSaturatedSusceptibility(
        frequency=f0, gamma=gamma, sigma=sn, alpha=alpha,
        bias=mp.Vector3(0, 0, 1.0)), epsn)
    exp = _expected_angle(_kgyro(0.8, epsn, f0, gamma, sn, alpha=alpha))
    assert abs(ang - exp) < 1.5, ("saturated", ang, exp)
