"""Anisotropic (full-tensor) epsilon and Gaussian-beam sources."""

import numpy as np
import jax.numpy as jnp

import meep_nl_tpu as mp
from meep_nl_tpu.stepper.step import build_xs, init_state, make_step


def test_full_tensor_epsilon_inversion():
    """Uniform anisotropic medium: one step with planted D must give
    E = eps^-1 D including the off-diagonal rows (OFFDIAG path,
    step_generic.cpp:597)."""
    eps_t = np.array([[5.0, 3.0, 0.0],
                      [3.0, 5.0, 0.0],
                      [0.0, 0.0, 2.0]])
    med = mp.Medium(epsilon_diag=mp.Vector3(5, 5, 2),
                    epsilon_offdiag=mp.Vector3(3, 0, 0))
    sim = mp.Simulation(cell_size=mp.Vector3(2, 2, 2), resolution=8,
                        default_material=med,
                        geometry=[mp.Block(size=mp.Vector3(9, 9, 9),
                                           center=mp.Vector3(),
                                           material=med)],
                        force_all_components=True)
    sim.init_sim()
    st = sim.fields_state
    D = np.array([0.4, -0.3, 0.2])
    f = dict(st["f"])
    for i, c in enumerate(["dx", "dy", "dz"]):
        f[c] = jnp.full_like(f[c], D[i])
    st = {**st, "f": f}
    step = make_step(sim.plan)
    xs = build_xs(sim.plan, 1)
    st = step(st, {k: v[0] for k, v in xs.items()})
    E_expected = np.linalg.inv(eps_t) @ D
    pt = (8, 8, 8)
    for i, c in enumerate(["ex", "ey", "ez"]):
        got = float(st["f"][c][pt])
        assert abs(got - E_expected[i]) < 1e-5, (c, got, E_expected[i])
    # the off-diagonal coupling is nonzero (sanity that it was exercised)
    assert abs(E_expected[0] - D[0] / 5.0) > 1e-3


def test_gaussian_beam_focuses():
    """A beam launched from a plane converges to its focus."""
    fcen = 1.0
    w0 = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(12, 8), resolution=12,
        sources=[mp.GaussianBeamSource(
            mp.ContinuousSource(frequency=fcen, width=2.0),
            component=mp.Ez, center=mp.Vector3(-4.5, 0),
            size=mp.Vector3(0, 6),
            # beam_x0 is RELATIVE to the source center (meep convention,
            # python/source.py): focus at the cell origin
            beam_x0=(4.5, 0.0, 0.0), beam_kdir=(1, 0, 0), beam_w0=w0,
            frequency=fcen)],
        boundary_layers=[mp.PML(1.0)])
    sim.run(until=30)
    ez = np.abs(np.asarray(sim.get_array(component=mp.Ez)))
    x = sim.gv.comp_coords("ez", 0)
    y = sim.gv.comp_coords("ez", 1)
    # transverse width at the focus plane vs at the source-side plane
    ix_f = int(np.argmin(np.abs(x - 0.0)))
    ix_s = int(np.argmin(np.abs(x + 3.5)))

    def width(ix):
        prof = ez[ix]
        peak = prof.max()
        on = np.where(prof > peak * np.exp(-1))[0]
        return (y[on.max()] - y[on.min()])

    w_focus = width(ix_f)
    w_source = width(ix_s)
    assert w_focus < w_source * 0.8, (w_focus, w_source)
    # focal width of order 2*w0
    assert w_focus < 3.0 * w0
