"""C2 rotational symmetry (Rotate2, vec.hpp:1189-1232 rotate2): the cell
is halved along the fold axis and the stepper's backward differences
across the rotation-axis plane read the parity * double-flip ghost
(step._rot2_ghost).  Gates: half-cell runs must reproduce the full-cell
C2-symmetric run exactly (the fold exchange is exact on the Yee mesh,
so tolerances are fp32 accumulation roundoff, not physics error).

Note on geometry in these tests: shape radii are chosen so no grid site
lies on a shape boundary — the half- and full-cell grids compute site
coordinates with different float roundoff (origin 0 vs -L/2), and a
site exactly on a boundary can flip its material inclusion between the
two rasterizations (a model difference, not a fold error)."""

import numpy as np
import pytest

import meep_nl_tpu as mnt


def _pair_sources(phase, sym, amp2=None):
    srcs = [mnt.Source(mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                       component=mnt.Ez, center=mnt.Vector3(1.23, 0.71))]
    if not sym:
        srcs.append(mnt.Source(
            mnt.GaussianSource(frequency=1.0, fwidth=0.5),
            component=mnt.Ez, center=mnt.Vector3(-1.23, -0.71),
            amplitude=phase if amp2 is None else amp2))
    return srcs


def _run2d(sym, phase, geom=(), pml=1.0, until=6.0):
    sim = mnt.Simulation(
        cell_size=mnt.Vector3(8, 8, 0), resolution=10,
        boundary_layers=[mnt.PML(pml)] if pml else [],
        geometry=list(geom),
        sources=_pair_sources(phase, sym),
        symmetries=[mnt.Rotate2("z", phase=phase)] if sym else [],
        eps_averaging=False)
    sim.run(until=until)
    return sim


def _geom2d():
    med = mnt.Medium(epsilon=4)
    return [mnt.Cylinder(radius=0.47, center=mnt.Vector3(0.9, -0.9),
                         material=med),
            mnt.Cylinder(radius=0.47, center=mnt.Vector3(-0.9, 0.9),
                         material=med)]


@pytest.mark.parametrize("phase", [1, -1])
def test_rot2_2d_vacuum_pml(phase):
    """Half cell == full cell for a C2 source pair (both irreps)."""
    full = _run2d(False, phase)
    half = _run2d(True, phase)
    a = np.asarray(full.get_array(component=mnt.Ez))
    b = np.asarray(half.get_array(component=mnt.Ez))
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    assert scale > 1e-6
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot2_2d_geometry():
    """C2-symmetric dielectric pair: scattering through the fold."""
    full = _run2d(False, 1, geom=_geom2d())
    half = _run2d(True, 1, geom=_geom2d())
    a = np.asarray(full.get_array(component=mnt.Ez))
    b = np.asarray(half.get_array(component=mnt.Ez))
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot2_2d_hz_family():
    """TE polarization: hz is even under C2z, ex/ey odd — exercises the
    ghost parities of the in-plane E components."""
    def run(sym):
        srcs = [mnt.Source(mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mnt.Hz, center=mnt.Vector3(1.23, 0.71))]
        if not sym:
            srcs.append(mnt.Source(
                mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                component=mnt.Hz, center=mnt.Vector3(-1.23, -0.71)))
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=srcs,
            symmetries=[mnt.Rotate2("z")] if sym else [],
            eps_averaging=False)
        sim.run(until=6.0)
        return np.asarray(sim.get_array(component=mnt.Hz))
    a, b = run(False), run(True)
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot2_flux_monitors():
    """Flux lines in the retained half match the full-cell values; a
    flux line crossing the fold asymmetrically is rejected (it cannot be
    represented on the half grid — its image is a different surface)."""
    def run(sym):
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=_pair_sources(1, sym),
            symmetries=[mnt.Rotate2("z")] if sym else [],
            eps_averaging=False)
        # regions clear of the fold plane (a region edge exactly ON the
        # plane loses the sub-pixel boundary weight of its first dropped
        # column — an O(dx) sliver documented in Rotate2)
        fr_hi = sim.add_flux(1.0, 0, 1, mnt.FluxRegion(
            center=mnt.Vector3(1.75, 2.2), size=mnt.Vector3(2.5, 0),
            direction="y"))
        fr_lo = sim.add_flux(1.0, 0, 1, mnt.FluxRegion(
            center=mnt.Vector3(1.75, -2.2), size=mnt.Vector3(2.5, 0),
            direction="y"))
        sim.run(until=10.0)
        return (np.asarray(sim.get_fluxes(fr_hi)),
                np.asarray(sim.get_fluxes(fr_lo)), sim)
    (a_hi, a_lo, _) = run(False)
    (b_hi, b_lo, _) = run(True)
    np.testing.assert_allclose(b_hi, a_hi, rtol=2e-4)
    np.testing.assert_allclose(b_lo, a_lo, rtol=2e-4)
    sim2 = mnt.Simulation(
        cell_size=mnt.Vector3(8, 8, 0), resolution=10,
        boundary_layers=[mnt.PML(1.0)],
        sources=_pair_sources(1, True),
        symmetries=[mnt.Rotate2("z")], eps_averaging=False)
    with pytest.raises(ValueError):
        sim2.add_flux(1.0, 0, 1, mnt.FluxRegion(
            center=mnt.Vector3(0, 2.2), size=mnt.Vector3(6.0, 0),
            direction="y"))


def test_rot2_energy_fold():
    """A C2-centered energy box folds with factor (1 + parity) = 2 (the
    energy density is C2-even): half-cell total matches the full cell."""
    def run(sym):
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=_pair_sources(1, sym),
            symmetries=[mnt.Rotate2("z")] if sym else [],
            eps_averaging=False)
        er = sim.add_energy(1.0, 0, 1, mnt.FluxRegion(
            center=mnt.Vector3(0, 0), size=mnt.Vector3(4.0, 4.0)))
        sim.run(until=10.0)
        return np.asarray(sim.get_electric_energy(er))
    a, b = run(False), run(True)
    np.testing.assert_allclose(b, a, rtol=2e-4)


def test_rot2_3d_small():
    """3D: rotation about z, fold x, flip y, with z-propagation."""
    def run(sym):
        srcs = [mnt.Source(mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mnt.Ez, center=mnt.Vector3(0.81, 0.42, 0))]
        if not sym:
            srcs.append(mnt.Source(
                mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                component=mnt.Ez, center=mnt.Vector3(-0.81, -0.42, 0)))
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(4, 4, 4), resolution=8,
            boundary_layers=[mnt.PML(0.75)],
            sources=srcs,
            symmetries=[mnt.Rotate2("z")] if sym else [],
            eps_averaging=False)
        sim.run(until=3.0)
        return np.asarray(sim.get_array(component=mnt.Ez))
    a, b = run(False), run(True)
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    assert scale > 1e-8
    np.testing.assert_allclose(b, a, atol=5e-6 * scale)


def test_rot2_lorentz():
    """Dispersive (Lorentz ADE) media work through the fold (the pol
    update is pointwise; only the curls cross the plane)."""
    med = mnt.Medium(epsilon=2.25, E_susceptibilities=[
        mnt.LorentzianSusceptibility(frequency=1.8, gamma=0.04,
                                     sigma=0.25)])
    geom = [mnt.Cylinder(radius=0.47, center=mnt.Vector3(0.9, -0.9),
                         material=med),
            mnt.Cylinder(radius=0.47, center=mnt.Vector3(-0.9, 0.9),
                         material=med)]
    full = _run2d(False, 1, geom=geom, until=5.0)
    half = _run2d(True, 1, geom=geom, until=5.0)
    a = np.asarray(full.get_array(component=mnt.Ez))
    b = np.asarray(half.get_array(component=mnt.Ez))
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot2_rejects():
    with pytest.raises(ValueError):
        mnt.Simulation(cell_size=mnt.Vector3(8.1, 8, 0), resolution=10,
                       symmetries=[mnt.Rotate2("z")])  # odd fold count
    with pytest.raises(NotImplementedError):
        mnt.Simulation(cell_size=mnt.Vector3(8, 8, 0), resolution=10,
                       symmetries=[mnt.Rotate2("z"), mnt.Mirror("y")])
    med = mnt.Medium(epsilon=4, chi2=0.1, chi2_full_tensor=True)
    sim = mnt.Simulation(
        cell_size=mnt.Vector3(8, 8, 0), resolution=10,
        geometry=[mnt.Cylinder(radius=0.47, center=mnt.Vector3(0.9, -0.9),
                               material=med),
                  mnt.Cylinder(radius=0.47, center=mnt.Vector3(-0.9, 0.9),
                               material=med)],
        sources=_pair_sources(1, True),
        symmetries=[mnt.Rotate2("z")])
    with pytest.raises(NotImplementedError):
        sim.init_sim()


def test_rot2_point_queries_dropped_half():
    """get_field_point at points in the DROPPED half of a C2-folded cell
    maps through the rotation image (simulation._fold_point): double
    coordinate flip with the product of both mirror parities."""
    full = _run2d(False, 1)
    half = _run2d(True, 1)
    for comp in (mnt.Ez, mnt.Hx, mnt.Hy):
        for pt in (mnt.Vector3(-1.3, 0.7), mnt.Vector3(-0.9, -1.7)):
            va = full.get_field_point(comp, pt)
            vb = half.get_field_point(comp, pt)
            assert abs(va - vb) < 5e-6 * max(abs(va), 1e-2), \
                (comp, pt, va, vb)
