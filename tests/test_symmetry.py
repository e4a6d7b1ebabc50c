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
    with pytest.raises(ValueError, match="odd cell count"):
        mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=10,
                      symmetries=[mp.Mirror(mp.Y, phase=+1)])
    with pytest.raises(ValueError, match="k_point"):
        mp.Simulation(cell_size=mp.Vector3(8, 8), resolution=10,
                      k_point=mp.Vector3(0.1, 0),
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
