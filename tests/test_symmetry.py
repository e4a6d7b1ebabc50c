"""Mirror-symmetry cell reduction (models/simulation.py Mirror;
reference src/symmetry.cpp + structure.cpp:157-184 chunk halving).

A mirror plane through the cell center is exactly a PEC wall (phase -1)
or PMC wall (phase +1) on the Yee mesh, so the half-cell run must equal
the full-cell run restricted to the retained half -- and get_array must
unfold it back to the full cell."""

import numpy as np
import pytest

import meep_nl_tpu as mp


def _run(sym, phase, until=8):
    sy = 8.0 if phase == -1 else 8.1   # even / odd cell-count alignment
    y0 = 0.8
    if sym:
        # only the dropped-half member: exercises the source fold
        srcs = [mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, -y0),
                          amplitude=phase)]
    else:
        srcs = [mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, y0)),
                mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, -y0),
                          amplitude=phase)]
    geom = [mp.Block(center=mp.Vector3(1.0, 0),
                     size=mp.Vector3(1.0, 2.0, mp.inf),
                     material=mp.Medium(epsilon=4))]
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, sy), resolution=10, geometry=geom,
        sources=srcs, boundary_layers=[mp.PML(1.0)],
        symmetries=[mp.Mirror(mp.Y, phase=phase)] if sym else [])
    sim.run(until=until)
    return sim


@pytest.mark.parametrize("phase", [-1, +1])
def test_mirror_matches_full_cell(phase):
    a = np.asarray(_run(False, phase).get_array(component=mp.Ez))
    sim = _run(True, phase)
    b = np.asarray(sim.get_array(component=mp.Ez))
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 2e-6 * np.abs(a).max()
    # the half grid really is half-sized
    full_cells = np.prod([int(8 * 10) + 1, int(80 if phase == -1 else 81) + 1])
    half_cells = np.prod([n + 1 for n in sim.gv.num])
    assert half_cells < 0.60 * full_cells


@pytest.mark.parametrize("phase", [-1, +1])
def test_mirror_odd_even_components(phase):
    """Unfolded H components carry the right parity: hx (tangential H)
    flips with phase*(-1), hy with phase*(+1)."""
    sim = _run(True, phase)
    hx = np.asarray(sim.get_array(component=mp.Hx))
    ny = hx.shape[1]
    # compare a row above the plane with its mirror row below
    lo, hi = hx[:, ny // 2 - 4], hx[:, ny // 2 + 3 + (ny % 2)]
    s = phase * -1.0
    sel = np.abs(hi) > 1e-3 * np.abs(hi).max()
    assert np.allclose(lo[sel], s * hi[sel], rtol=1e-3, atol=1e-9)


def test_mirror_alignment_errors():
    with pytest.raises(ValueError, match="even cell count"):
        mp.Simulation(cell_size=mp.Vector3(8, 8.1), resolution=10,
                      symmetries=[mp.Mirror(mp.Y, phase=-1)])
    # phase=+1 accepts BOTH parities now: odd -> half-offset wall,
    # even -> node-aligned ghost fold (plan.mirror_node)
    sim = mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=10,
                        symmetries=[mp.Mirror(mp.Y, phase=+1)])
    assert sim._mirror_node
    with pytest.raises(ValueError, match="k\\.y == 0"):
        mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=10,
                      k_point=mp.Vector3(0, 0.1),
                      symmetries=[mp.Mirror(mp.Y, phase=-1)])


def test_mirror_straddling_source_rejected():
    with pytest.raises(ValueError, match="straddles"):
        sim = mp.Simulation(
            cell_size=mp.Vector3(8, 8), resolution=10,
            sources=[mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                               component=mp.Ez, center=mp.Vector3(0, -0.5),
                               size=mp.Vector3(0, 4))],
            symmetries=[mp.Mirror(mp.Y, phase=-1)])
        sim.init_sim()


def test_mirror_straddling_source_rejected_retained_side():
    """Straddle check must fire for a source centered in the RETAINED half
    whose extent crosses the plane (would be silently clipped otherwise)."""
    with pytest.raises(ValueError, match="straddles"):
        sim = mp.Simulation(
            cell_size=mp.Vector3(8, 8), resolution=10,
            sources=[mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                               component=mp.Ez, center=mp.Vector3(0, +0.5),
                               size=mp.Vector3(0, 4))],
            symmetries=[mp.Mirror(mp.Y, phase=-1)])
        sim.init_sim()


def _flux_sim(sym, phase, flux_center, flux_size, normal=None, until=12):
    # with a declared mirror, only ONE member of each source pair is given
    # (the image is implied by the symmetry, as in the reference)
    if sym:
        srcs = [mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, 0.8))]
    else:
        srcs = [mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, 0.8)),
                mp.Source(mp.GaussianSource(frequency=0.5, fwidth=0.2),
                          component=mp.Ez, center=mp.Vector3(-1.0, -0.8),
                          amplitude=phase)]
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8), resolution=10,
        sources=srcs, boundary_layers=[mp.PML(1.0)],
        symmetries=[mp.Mirror(mp.Y, phase=phase)] if sym else [])
    fr = mp.FluxRegion(center=flux_center, size=flux_size, direction=normal)
    h = sim.add_flux(0.5, 0.2, 3, fr)
    sim.run(until=until)
    return np.asarray(sim.get_fluxes(h))


def test_mirror_flux_full_region_matches_full_cell():
    """A full-height flux plane crossing the mirror must return the FULL
    integral (clip + double), matching the unmirrored run (the reference's
    symmetry-aware loop_in_chunks; ADVICE r2 medium)."""
    full = _flux_sim(False, -1, mp.Vector3(2.0, 0), mp.Vector3(0, 6))
    half = _flux_sim(True, -1, mp.Vector3(2.0, 0), mp.Vector3(0, 6))
    assert np.allclose(full, half, rtol=1e-4, atol=1e-12 + 1e-6 * np.abs(full).max())


def test_mirror_flux_dropped_half_region():
    """A flux region entirely in the dropped half maps to its image with
    the flux-parity sign (+1 for normal != mirror axis)."""
    full = _flux_sim(False, -1, mp.Vector3(2.0, -1.5), mp.Vector3(0, 2))
    half = _flux_sim(True, -1, mp.Vector3(2.0, -1.5), mp.Vector3(0, 2))
    assert np.allclose(full, half, rtol=1e-4, atol=1e-12 + 1e-6 * np.abs(full).max())


def test_mirror_flux_asymmetric_straddle_rejected():
    with pytest.raises(ValueError, match="straddles"):
        _flux_sim(True, -1, mp.Vector3(2.0, -0.5), mp.Vector3(0, 3))


def _bloch_mirror_sim(sym):
    """Waveguide strip along x with Bloch kx and a y-mirror: the mirror
    normal is orthogonal to k and y is PML-covered, so the fold composes
    with the Bloch wrap (reference symmetry.cpp transforms commute with
    the x phase)."""
    return mp.Simulation(
        cell_size=mp.Vector3(1, 6.1, 0), resolution=10,
        geometry=[mp.Block(center=mp.Vector3(0, 0),
                           size=mp.Vector3(1e20, 1.2, 1e20),
                           material=mp.Medium(epsilon=13))],
        sources=[mp.Source(mp.GaussianSource(0.25, fwidth=0.2), mp.Ez,
                           center=mp.Vector3(0.1, 0))],
        boundary_layers=[mp.PML(1.0, direction='y')],
        k_point=mp.Vector3(0.4, 0, 0),
        symmetries=[mp.Mirror('y', phase=1)] if sym else [])


def test_mirror_with_orthogonal_k_point_matches_full_cell():
    s_full = _bloch_mirror_sim(False)
    s_half = _bloch_mirror_sim(True)
    s_full.run(until=20)
    s_half.run(until=20)
    ez_f = np.asarray(s_full.get_array(component='ez'))
    ez_h = np.asarray(s_half.get_array(component='ez'))
    m = np.abs(ez_f).max()
    assert m > 1e-6
    assert np.abs(ez_f - ez_h).max() <= 1e-5 * m


def test_mirror_with_parallel_k_point_rejected():
    with pytest.raises(ValueError, match="k\\.y == 0"):
        mp.Simulation(
            cell_size=mp.Vector3(1, 6.1, 0), resolution=10,
            boundary_layers=[mp.PML(1.0, direction='y')],
            k_point=mp.Vector3(0, 0.3, 0),
            symmetries=[mp.Mirror('y', phase=1)])


def test_mirror_with_k_needs_absorbing_cover():
    with pytest.raises(ValueError, match="absorbing"):
        mp.Simulation(
            cell_size=mp.Vector3(1, 6.1, 0), resolution=10,
            boundary_layers=[],
            k_point=mp.Vector3(0.4, 0, 0),
            symmetries=[mp.Mirror('y', phase=1)])


def test_pml_side_string_normalized():
    """mp.Low/'low' side spellings map onto the numeric convention every
    consumer uses (plan.py:346, Simulation._periodic)."""
    assert mp.PML(1.0, side=mp.Low).side == -1
    assert mp.PML(1.0, side=mp.High).side == +1
    assert mp.PML(1.0).side == 0


# ---------------------------------------------------------------------------
# node-aligned phase=+1 mirrors (plane ON a whole grid site, even counts)
# and the half-offset monitor/source corrections


def _node_mirror_sim(sym, comp_src):
    return mp.Simulation(
        cell_size=mp.Vector3(8, 8, 0), resolution=10,   # even count in y
        geometry=[mp.Cylinder(center=mp.Vector3(1.0, 0), radius=0.83,
                              material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(0.5, fwidth=0.3), comp_src,
                           center=mp.Vector3(-2, 0))],
        boundary_layers=[mp.PML(1.0)],
        symmetries=[mp.Mirror('y', phase=1)] if sym else [])


@pytest.mark.parametrize("comp,src", [("ez", mp.Ez), ("hx", mp.Ez),
                                      ("hy", mp.Ez), ("ex", mp.Ex),
                                      ("ey", mp.Ex), ("hz", mp.Ex)])
def test_node_mirror_matches_full_cell(comp, src):
    """phase=+1 on an EVEN cell count: the plane lands on a node and the
    stepper reads the mirror ghost (plan.mirror_node) instead of a wall;
    every component of the folded run must reproduce the full cell."""
    f = _node_mirror_sim(False, src)
    h = _node_mirror_sim(True, src)
    f.run(until=12)
    h.run(until=12)
    af = np.asarray(f.get_array(component=comp))
    ah = np.asarray(h.get_array(component=comp))
    assert af.shape == ah.shape
    m = np.abs(af).max()
    assert m > 1e-4
    assert np.abs(af - ah).max() <= 2e-5 * m


@pytest.mark.parametrize("sy", [8.0, 8.1])   # node / half-offset alignment
def test_mirror_symmetric_flux_region_exact(sy):
    """A symmetric flux plane on a mirrored cell integrates to the full
    cell's value exactly for BOTH plane alignments (the half-offset
    centered row-0 parity restoration, _mirror_fix_dft_specs)."""
    def flux(sym):
        sim = mp.Simulation(
            cell_size=mp.Vector3(8, sy, 0), resolution=10,
            sources=[mp.Source(mp.GaussianSource(0.5, fwidth=0.3), mp.Ez,
                               center=mp.Vector3(-2, 0))],
            boundary_layers=[mp.PML(1.0)],
            symmetries=[mp.Mirror('y', phase=1)] if sym else [])
        h = sim.add_flux(0.5, 0.2, 3, mp.FluxRegion(
            center=mp.Vector3(2, 0), size=mp.Vector3(0, 6)))
        sim.run(until=15)
        return np.asarray(sim.get_fluxes(h))
    ff, fh = flux(False), flux(True)
    assert np.abs(ff - fh).max() <= 5e-5 * np.abs(ff).max()


@pytest.mark.parametrize("sy", [11.0, 11.2])   # half-offset / node
def test_mirror_eigenmode_source_and_coefficients(sy):
    """Eigenmode source + mode decomposition on a mirrored waveguide:
    the cross-section eigenproblem is solved on the FULL unfolded line
    (_mirror_full_line / _mode_monitor_ctx unfold) so launch amplitude,
    flux, and S-parameter coefficients match the full cell."""
    def em(sym):
        sx = 12.0
        fcen = 1 / 6.67
        sim = mp.Simulation(
            cell_size=mp.Vector3(sx, sy, 0), resolution=15,
            geometry=[mp.Block(center=mp.Vector3(0, 0),
                               size=mp.Vector3(1e20, 1.0, 1e20),
                               material=mp.Medium(epsilon=12))],
            sources=[mp.EigenModeSource(
                mp.GaussianSource(fcen, fwidth=0.2 * fcen),
                center=mp.Vector3(-0.5 * sx + 2.6, 0),
                size=mp.Vector3(0, sy - 4), eig_band=1, eig_parity='TM')],
            boundary_layers=[mp.PML(2.0, direction='x'),
                             mp.PML(2.0, direction='y')],
            symmetries=[mp.Mirror('y', phase=1)] if sym else [])
        fl = sim.add_flux(fcen, 0, 1, mp.FluxRegion(
            center=mp.Vector3(-0.5 * sx + 4.1, 0),
            size=mp.Vector3(0, sy - 4)))
        sim.run(until_after_sources=60)
        return (np.asarray(sim.get_fluxes(fl)),
                np.asarray(sim.get_eigenmode_coefficients(fl, [1])))
    (flf, af), (flh, ah) = em(False), em(True)
    assert np.abs(flf - flh).max() <= 1e-4 * np.abs(flf).max()
    assert np.abs(np.abs(af) - np.abs(ah)).max() <= 1e-3 * np.abs(af).max()


@pytest.mark.parametrize("phase", [-1, +1])
def test_mirror_point_queries_dropped_half(phase):
    """get_field_point at points in the DROPPED half of a mirrored cell
    reflects through the plane with phase * component parity
    (simulation._fold_point)."""
    full = _run(False, phase)
    half = _run(True, phase)
    for comp in (mp.Ez, mp.Hx, mp.Hy):
        for pt in (mp.Vector3(-1.0, -0.8), mp.Vector3(1.6, -1.3)):
            va = full.get_field_point(comp, pt)
            vb = half.get_field_point(comp, pt)
            assert abs(va - vb) < 5e-6 * max(abs(va), 1e-2), \
                (comp, pt, va, vb)
