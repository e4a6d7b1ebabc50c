"""C4 rotational symmetry (Rotate4, vec.hpp:1189-1232 rotate4): the cell
is QUARTERED (both axes perpendicular to the rotation axis halved) and
backward differences across either fold plane read the 90-degree-rotated
ghost — a direct transposed read of the x<->y-swapped component at the
reflected row (step._rot4_ghost).  Gates: quarter-cell runs must
reproduce the full-cell C4-symmetric run to fp32 accumulation roundoff
(the fold exchange is exact on the Yee mesh).

Shape radii avoid grid-site boundaries (half- vs full-cell coordinate
roundoff can flip a boundary site's rasterization; see test_rot2.py)."""

import numpy as np
import pytest

import meep_nl_tpu as mnt


def _orbit_sources(phase, sym, comp=None):
    """One wedge source, or its full C4 orbit: member k at R^k (a, b)
    with amplitude phase^k (R = +90 deg about z)."""
    comp = comp if comp is not None else mnt.Ez
    a, b = 1.23, 0.71
    pts = [(a, b), (-b, a), (-a, -b), (b, -a)]
    amps = [1.0, phase, phase * phase, phase ** 3]
    n = 1 if sym else 4
    return [mnt.Source(mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                       component=comp, center=mnt.Vector3(*pts[k]),
                       amplitude=amps[k])
            for k in range(n)]


def _run2d(sym, phase, geom=(), until=6.0):
    sim = mnt.Simulation(
        cell_size=mnt.Vector3(8, 8, 0), resolution=10,
        boundary_layers=[mnt.PML(1.0)],
        geometry=list(geom),
        sources=_orbit_sources(phase, sym),
        symmetries=[mnt.Rotate4("z", phase=phase)] if sym else [],
        eps_averaging=False)
    sim.run(until=until)
    return sim


def _geom_c4():
    med = mnt.Medium(epsilon=4)
    a, b = 0.9, 1.6
    pts = [(a, b), (-b, a), (-a, -b), (b, -a)]
    return [mnt.Cylinder(radius=0.47, center=mnt.Vector3(*p), material=med)
            for p in pts]


@pytest.mark.parametrize("phase", [1, -1])
def test_rot4_2d_vacuum_pml(phase):
    """Quarter cell == full cell for a C4 source orbit (both real
    irreps)."""
    full = _run2d(False, phase)
    quarter = _run2d(True, phase)
    a = np.asarray(full.get_array(component=mnt.Ez))
    b = np.asarray(quarter.get_array(component=mnt.Ez))
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    assert scale > 1e-6
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot4_2d_geometry():
    """C4-symmetric dielectric orbit: scattering through both folds."""
    full = _run2d(False, 1, geom=_geom_c4())
    quarter = _run2d(True, 1, geom=_geom_c4())
    a = np.asarray(full.get_array(component=mnt.Ez))
    b = np.asarray(quarter.get_array(component=mnt.Ez))
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot4_2d_hz_family():
    """TE polarization (hz + in-plane ex/ey): exercises the
    component-SWAPPING ghosts (ex ghost reads ey and vice versa)."""
    def run(sym):
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=_orbit_sources(1, sym, comp=mnt.Hz),
            symmetries=[mnt.Rotate4("z")] if sym else [],
            eps_averaging=False)
        sim.run(until=6.0)
        return np.asarray(sim.get_array(component=mnt.Hz))
    a, b = run(False), run(True)
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)


def test_rot4_3d():
    """3D quarter cell about the z axis (full component set: every ghost
    pair hx<->hy, hz<->hz, and both folds exercised)."""
    def run(sym):
        srcs = _orbit_sources(1, sym)
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(5, 5, 3), resolution=8,
            boundary_layers=[mnt.PML(0.75)],
            sources=srcs,
            symmetries=[mnt.Rotate4("z")] if sym else [],
            eps_averaging=False)
        sim.run(until=4.0)
        return sim
    fa, fb = run(False), run(True)
    # the rotation-axis component plus one in-plane pair member (the
    # latter exercises the swapped-component raw-lattice unfold in 3D)
    for comp in (mnt.Ez, mnt.Hx):
        a = np.asarray(fa.get_array(component=comp))
        b = np.asarray(fb.get_array(component=comp))
        assert a.shape == b.shape, comp
        scale = np.max(np.abs(a))
        assert scale > 1e-8
        np.testing.assert_allclose(b, a, atol=5e-6 * scale, err_msg=comp)


def test_rot4_source_fold_and_guards():
    """A wedge-exterior Ez source folds with phase^k; in-plane-component
    sources outside the wedge and straddling DFT regions are rejected."""
    def mk(center, comp=mnt.Ez, sym_phase=-1):
        return mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=[mnt.Source(mnt.GaussianSource(frequency=1.0,
                                                   fwidth=0.5),
                                component=comp, center=center)],
            symmetries=[mnt.Rotate4("z", phase=sym_phase)],
            eps_averaging=False)
    # quadrant-2 source == wedge source with amp phase^2 == +1 ... check
    # physical equivalence through the field (quadrant 2 is the C2 image)
    s1 = mk(mnt.Vector3(1.23, 0.71))
    s2 = mk(mnt.Vector3(-1.23, -0.71))
    s1.run(until=5.0)
    s2.run(until=5.0)
    a = np.asarray(s1.get_array(component=mnt.Ez))
    b = np.asarray(s2.get_array(component=mnt.Ez))
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=3e-6 * scale)
    with pytest.raises(ValueError, match="in-plane"):
        mk(mnt.Vector3(-1.2, 0.7), comp=mnt.Ex).init_sim()
    sim = mk(mnt.Vector3(1.23, 0.71))
    with pytest.raises(ValueError, match="quadrant"):
        sim.add_flux(1.0, 0, 1, mnt.FluxRegion(
            center=mnt.Vector3(0.0, 2.0), size=mnt.Vector3(3.0, 0)))


@pytest.mark.parametrize("phase", [1, -1])
def test_rot4_inplane_get_array(phase):
    """get_array of the in-plane ex/ey on a quartered TE cell: the
    rotated quadrants are swapped-component reads with the rotation-
    matrix signs (simulation._unfold_rot4_inplane), on both the raw
    (snap=True) and the centered-collapsed lattices."""
    def run(sym):
        sim = mnt.Simulation(
            cell_size=mnt.Vector3(8, 8, 0), resolution=10,
            boundary_layers=[mnt.PML(1.0)],
            sources=_orbit_sources(phase, sym, comp=mnt.Hz),
            symmetries=[mnt.Rotate4("z", phase=phase)] if sym else [],
            eps_averaging=False)
        sim.run(until=6.0)
        return sim
    full, quarter = run(False), run(True)
    for comp in (mnt.Ex, mnt.Ey):
        for snap in (False, True):
            a = np.asarray(full.get_array(component=comp, snap=snap))
            b = np.asarray(quarter.get_array(component=comp, snap=snap))
            assert a.shape == b.shape, (comp, snap, a.shape, b.shape)
            scale = np.max(np.abs(a))
            assert scale > 1e-6
            np.testing.assert_allclose(b, a, atol=3e-6 * scale,
                                       err_msg=f"{comp} snap={snap}")
    # point queries in the DROPPED quadrants map through the quarter
    # turns (simulation._fold_point): component swap + rotation signs
    for comp in (mnt.Ex, mnt.Ey, mnt.Hz):
        for pt in (mnt.Vector3(-1.3, 0.7), mnt.Vector3(-0.9, -1.7),
                   mnt.Vector3(1.1, -0.4)):
            va = full.get_field_point(comp, pt)
            vb = quarter.get_field_point(comp, pt)
            assert abs(va - vb) < 5e-6 * max(abs(va), 1e-2), \
                (comp, pt, va, vb)
