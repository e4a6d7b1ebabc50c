"""Near-to-far transformation vs directly-propagated fields (analog of
tests/near2far.cpp: fields from equivalence must match the actual fields)."""

import numpy as np

import meep_nl_tpu as mp


def test_n2f_matches_direct_field_2d():
    """Ez point source; far field predicted from a near box must match the
    directly measured DTFT at the same (in-cell) far point."""
    fcen, df = 1.0, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(16, 16), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    half = 1.5
    n2f = sim.add_near2far(
        fcen, df, 3,
        mp.Near2FarRegion(center=mp.Vector3(half, 0), size=mp.Vector3(0, 2 * half)),
        mp.Near2FarRegion(center=mp.Vector3(-half, 0), size=mp.Vector3(0, 2 * half),
                          weight=-1.0),
        mp.Near2FarRegion(center=mp.Vector3(0, half), size=mp.Vector3(2 * half, 0)),
        mp.Near2FarRegion(center=mp.Vector3(0, -half), size=mp.Vector3(2 * half, 0),
                          weight=-1.0))
    far_pt = mp.Vector3(4.2, 2.3)
    direct = sim.add_dft_fields([mp.Ez], fcen, df, 3, center=far_pt,
                                size=mp.Vector3())
    sim.run(until_after_sources=30)

    eh = sim.get_farfield(n2f, far_pt)          # (6, nfreq)
    ez_pred = eh[2]
    ez_meas = sim.get_dft_array(direct, mp.Ez).reshape(-1, 3).sum(axis=0)
    # complex match (amplitude and phase): a few percent at the center
    # frequency; the band edges carry ~200x less source power so their
    # relative error is discretization-noise dominated
    err = np.abs(ez_pred - ez_meas) / np.abs(ez_meas)
    assert err[1] < 0.05, (ez_pred, ez_meas, err)
    assert np.all(err < 0.2), err


def test_n2f_azimuthal_symmetry():
    """A point Ez source's far field must be azimuthally symmetric."""
    fcen, df = 1.0, 0.3
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=df),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    half = 1.5
    n2f = sim.add_near2far(
        fcen, df, 1,
        mp.Near2FarRegion(center=mp.Vector3(half, 0), size=mp.Vector3(0, 2 * half)),
        mp.Near2FarRegion(center=mp.Vector3(-half, 0), size=mp.Vector3(0, 2 * half),
                          weight=-1.0),
        mp.Near2FarRegion(center=mp.Vector3(0, half), size=mp.Vector3(2 * half, 0)),
        mp.Near2FarRegion(center=mp.Vector3(0, -half), size=mp.Vector3(2 * half, 0),
                          weight=-1.0))
    sim.run(until_after_sources=30)
    R = 100.0
    vals = []
    for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eh = sim.get_farfield(n2f, mp.Vector3(R * np.cos(th), R * np.sin(th)))
        vals.append(abs(eh[2, 0]))
    vals = np.array(vals)
    assert vals.min() > 0
    np.testing.assert_allclose(vals, vals.mean(), rtol=0.02)


def test_n2f_cylindrical_equivalence_analytic():
    """greencyl + the cylindrical equivalence surface (near2far.cpp:279 +
    :584-637): with ANALYTIC z-dipole near fields painted on a closed
    cylindrical box (r-surface + z caps), the far-field transform must
    reproduce the direct dipole field to <1% at all angles.  This gates
    the full cyl near2far path (equivalence terms, 2*pi*r weights, phi
    quadrature) independently of the FDTD."""
    from meep_nl_tpu.analysis.near2far import (green3d_w, farfield,
                                               Near2FarSurface,
                                               equivalence_terms)
    freq, half, res = 1.0, 1.0, 40
    dl = 1.0 / res
    surfaces, state = [], {"dft": {}}

    def fields_at(pts_rz):
        out = []
        for (r, z) in pts_rz:
            x3 = np.array([r, 0.0, z])
            out.append(green3d_w(x3, freq, 1.0, 1.0, np.zeros((1, 3)),
                                 "ez")[:, 0])
        return np.array(out)                       # (npts, 6) at phi=0

    zs = (np.arange(int(2 * half * res)) + 0.5) * dl - half
    rs = (np.arange(int(half * res)) + 0.5) * dl
    pts_r = np.stack([np.full_like(zs, half), zs], -1)
    pts_top = np.stack([rs, np.full_like(rs, half)], -1)
    pts_bot = np.stack([rs, -np.full_like(rs, half)], -1)
    cmap = {"er": 0, "ep": 1, "ez": 2, "hr": 3, "hp": 4, "hz": 5}
    ki = 0
    for normal, pts, w in (("r", pts_r, 1.0), ("z", pts_top, 1.0),
                           ("z", pts_bot, -1.0)):
        F = fields_at(pts)
        for c, c0, s in equivalence_terms(normal, "cyl"):
            wfull = s * w * dl * 2 * np.pi * np.abs(pts[:, 0])
            key = f"s{ki}"
            ki += 1
            state["dft"][key] = (F[:, cmap[c]] * wfull)[:, None]
            surfaces.append(Near2FarSurface(c0=c0, coords=pts,
                                            dft_name=key))
    R = 1000.0
    for th in (0.3, 0.8, 1.3, 1.57):
        x = [R * np.sin(th), R * np.cos(th)]
        pred = farfield(surfaces, state, [freq], x, "cyl")[:, 0]
        true = green3d_w(np.array([x[0], 0.0, x[1]]), freq, 1.0, 1.0,
                         np.zeros((1, 3)), "ez")[:, 0]
        err = np.linalg.norm(pred - true) / np.linalg.norm(true)
        assert err < 0.01, (th, err)


def test_n2f_periodic_images_identity():
    """nperiods=N far field == brute-force sum of 2N+1 phased, shifted
    single-period evaluations (near2far.cpp:33-41 periodic_n)."""
    fcen = 0.7
    kx = 0.13
    L = 4.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(L, 8), resolution=12,
        k_point=mp.Vector3(kx, 0),
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.2),
                           component=mp.Ez, center=mp.Vector3(0.3, -1.0))],
        boundary_layers=[mp.PML(1.0, direction="y")])
    reg = mp.Near2FarRegion(center=mp.Vector3(0, 1.5), size=mp.Vector3(L, 0))
    nper = 2
    hN = sim.add_near2far(fcen, 0.0, 1, reg, nperiods=nper)
    h1 = sim.add_near2far(fcen, 0.0, 1, reg)
    sim.run(until_after_sources=25)
    far = mp.Vector3(1.7, 60.0)
    ehN = sim.get_farfield(hN, far)
    acc = np.zeros_like(ehN)
    for n in range(-nper, nper + 1):
        ph = np.exp(1j * n * 2 * np.pi * kx * L)
        acc += ph * sim.get_farfield(
            h1, mp.Vector3(far.x - n * L, far.y))
    np.testing.assert_allclose(ehN, acc, rtol=1e-8, atol=1e-12)


def test_n2f_far_surface_flux():
    """dft_near2far::flux (near2far.cpp:506): total far flux through a
    closed far box equals the radiated power measured by a near flux
    box."""
    fcen = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 8), resolution=16,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.3),
                           component=mp.Ez, center=mp.Vector3())],
        boundary_layers=[mp.PML(1.0)])
    half = 1.5
    n2f = sim.add_near2far(
        fcen, 0.0, 1,
        mp.Near2FarRegion(center=mp.Vector3(half, 0), size=mp.Vector3(0, 2 * half)),
        mp.Near2FarRegion(center=mp.Vector3(-half, 0), size=mp.Vector3(0, 2 * half),
                          weight=-1.0),
        mp.Near2FarRegion(center=mp.Vector3(0, half), size=mp.Vector3(2 * half, 0)),
        mp.Near2FarRegion(center=mp.Vector3(0, -half), size=mp.Vector3(2 * half, 0),
                          weight=-1.0))
    pw = sim.add_flux(fcen, 0.0, 1,
                      mp.FluxRegion(center=mp.Vector3(1.0, 0), size=mp.Vector3(0, 2)),
                      mp.FluxRegion(center=mp.Vector3(-1.0, 0), size=mp.Vector3(0, 2),
                                    weight=-1.0),
                      mp.FluxRegion(center=mp.Vector3(0, 1.0), size=mp.Vector3(2, 0),
                                    direction="y"),
                      mp.FluxRegion(center=mp.Vector3(0, -1.0), size=mp.Vector3(2, 0),
                                    direction="y", weight=-1.0))
    sim.run(until_after_sources=40)
    p_near = float(sim.get_fluxes(pw)[0])
    R, S = 40.0, 80.0          # closed square: sides span exactly 2R
    res_far = 4.0
    F = 0.0
    F += sim.near2far_flux(n2f, "x", center=mp.Vector3(R, 0),
                           size=mp.Vector3(0, S), resolution=res_far)[0]
    F -= sim.near2far_flux(n2f, "x", center=mp.Vector3(-R, 0),
                           size=mp.Vector3(0, S), resolution=res_far)[0]
    F += sim.near2far_flux(n2f, "y", center=mp.Vector3(0, R),
                           size=mp.Vector3(S, 0), resolution=res_far)[0]
    F -= sim.near2far_flux(n2f, "y", center=mp.Vector3(0, -R),
                           size=mp.Vector3(S, 0), resolution=res_far)[0]
    assert p_near > 0
    np.testing.assert_allclose(F, p_near, rtol=0.05)


def test_near2far_mirror_images_match_full_cell():
    """A symmetric near-surface box on a node-mirrored cell: far fields
    must equal the full cell's (the Green's sum adds the mirror-image
    surfaces with current parities — the role of the reference's
    symmetry transforms feeding loop_in_chunks)."""
    def run(sym):
        sim = mp.Simulation(
            cell_size=mp.Vector3(8, 8, 0), resolution=10,
            sources=[mp.Source(mp.GaussianSource(0.6, fwidth=0.3), mp.Ez,
                               center=mp.Vector3(0, 0))],
            boundary_layers=[mp.PML(1.0)],
            symmetries=[mp.Mirror('y', phase=1)] if sym else [])
        s = 1.5
        h = sim.add_near2far(
            0.6, 0, 1,
            mp.Near2FarRegion(center=mp.Vector3(s, 0),
                              size=mp.Vector3(0, 2 * s)),
            mp.Near2FarRegion(center=mp.Vector3(-s, 0),
                              size=mp.Vector3(0, 2 * s), weight=-1),
            mp.Near2FarRegion(center=mp.Vector3(0, s),
                              size=mp.Vector3(2 * s, 0), direction='y'),
            mp.Near2FarRegion(center=mp.Vector3(0, -s),
                              size=mp.Vector3(2 * s, 0), direction='y',
                              weight=-1))
        sim.run(until_after_sources=30)
        pts = [mp.Vector3(40 * np.cos(t), 40 * np.sin(t))
               for t in np.linspace(0.1, np.pi / 2, 5)]
        return np.array([sim.get_farfield(h, p) for p in pts])
    ff, fh = run(False), run(True)
    assert np.abs(ff - fh).max() <= 2e-3 * np.abs(ff).max()
