"""Reference adjoint-package API (python/adjoint/*): class-style
ObjectiveQuantity + reference-signature OptimizationProblem drive the
same gradients as the native functional API; FilteredSource hits its
prescribed spectrum; filters/connectivity/basis helpers resolve."""

import os

import numpy as np
import pytest

import meep_nl_tpu as mp
import meep_nl_tpu.adjoint as mpa


def test_adjoint_name_parity():
    import ast
    ref = "/root/reference/python/adjoint"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    missing = {}
    for f in os.listdir(ref):
        if not f.endswith(".py") or f == "__init__.py":
            continue
        tree = ast.parse(open(os.path.join(ref, f)).read())
        m = [n.name for n in tree.body
             if isinstance(n, (ast.FunctionDef, ast.ClassDef))
             and not n.name.startswith("_") and not hasattr(mpa, n.name)]
        if m:
            missing[f] = m
    assert not missing, missing


def _design_sim():
    """2D waveguide with a design block in the middle."""
    wg = mp.Block(center=mp.Vector3(), size=mp.Vector3(mp.inf, 1, mp.inf),
                  material=mp.Medium(epsilon=6.0))
    design = mp.Block(center=mp.Vector3(), size=mp.Vector3(2, 2),
                      material=mp.Medium(epsilon=6.0))
    sim = mp.Simulation(
        cell_size=mp.Vector3(10, 6), resolution=10,
        geometry=[wg, design],
        sources=[mp.Source(mp.GaussianSource(frequency=0.25, fwidth=0.1),
                           component=mp.Ez, center=mp.Vector3(-3.5, 0),
                           size=mp.Vector3(0, 2))],
        boundary_layers=[mp.PML(1.0)])
    return sim


def test_reference_style_optimization_problem():
    """OptimizationProblem(objective_functions=..., objective_arguments=
    [FourierFields], frequencies=...) matches the native objective path
    value AND its gradient matches central finite differences."""
    mg = mpa.MaterialGrid((8, 8), mp.Medium(epsilon=1.0),
                          mp.Medium(epsilon=6.0), beta=2.0)
    dr = mpa.DesignRegion(mg, volume=mp.Volume(center=mp.Vector3(),
                                               size=mp.Vector3(2, 2)))
    sim = _design_sim()
    ff = mpa.FourierFields(sim, mp.Volume(center=mp.Vector3(3.5, 0),
                                          size=mp.Vector3(0, 2)), "ez")
    import jax.numpy as jnp
    opt = mpa.OptimizationProblem(
        simulation=sim,
        objective_functions=[lambda e: jnp.sum(jnp.abs(e) ** 2)],
        objective_arguments=[ff],
        design_regions=[dr],
        frequencies=[0.25],
        maximum_run_time=40.0)
    rho = 0.5 * np.ones((8, 8))
    f0, grads = opt(rho)
    assert f0 > 0 and np.any(grads[0] != 0)
    idx = np.unravel_index(int(np.argmax(np.abs(grads[0]))),
                           grads[0].shape)
    fd = opt.calculate_fd_gradient(rho, idx, drho=1e-3)
    assert fd == pytest.approx(float(grads[0][idx]), rel=2e-2)


def test_objective_quantity_eval_and_mg_weights():
    """opt() with no arguments evaluates at the MaterialGrid weights;
    ObjectiveQuantity.get_evaluation returns the monitor value."""
    mg = mpa.MaterialGrid((6, 6), mp.Medium(epsilon=1.0),
                          mp.Medium(epsilon=6.0))
    mg.update_weights(0.3 * np.ones(36))
    assert mg.weights.shape == (6, 6)
    dr = mpa.DesignRegion(mg, volume=mp.Volume(center=mp.Vector3(),
                                               size=mp.Vector3(2, 2)))
    sim = _design_sim()
    ec = mpa.EigenmodeCoefficient(
        sim, mp.Volume(center=mp.Vector3(3.5, 0), size=mp.Vector3(0, 3)),
        mode=1)
    import jax.numpy as jnp
    opt = mpa.OptimizationProblem(
        simulation=sim,
        objective_functions=[lambda a: jnp.sum(jnp.abs(a) ** 2)],
        objective_arguments=[ec],
        design_regions=[dr],
        frequencies=[0.25],
        maximum_run_time=30.0)
    f0, _ = opt(need_gradient=False)
    assert f0 > 0
    val = ec.get_evaluation()
    assert np.sum(np.abs(val) ** 2) == pytest.approx(float(f0), rel=1e-5)


def test_meep_jax_wrapper_grad():
    """MeepJaxWrapper: jax.grad flows through the wrapped simulation."""
    import jax
    import jax.numpy as jnp
    mg = mpa.MaterialGrid((6, 6), mp.Medium(epsilon=1.0),
                          mp.Medium(epsilon=6.0))
    dr = mpa.DesignRegion(mg, volume=mp.Volume(center=mp.Vector3(),
                                               size=mp.Vector3(2, 2)))
    sim = _design_sim()
    ff = mpa.FourierFields(sim, mp.Volume(center=mp.Vector3(3.5, 0),
                                          size=mp.Vector3(0, 2)), "ez")
    wrapped = mpa.MeepJaxWrapper(sim, sim.sources, [ff], [dr],
                                 frequencies=[0.25],
                                 until_after_sources=25.0)

    def loss(rho):
        (e,) = wrapped(rho)
        return jnp.sum(jnp.abs(e) ** 2)

    rho = jnp.full((6, 6), 0.5)
    val, g = jax.value_and_grad(loss)(rho)
    assert float(val) > 0 and np.any(np.asarray(g) != 0)


def test_filtered_source_spectrum():
    """FilteredSource's dipole DTFT matches the prescribed response at
    the sample frequencies (filter_source.py contract)."""
    dt = 0.05
    freqs = np.array([0.22, 0.25, 0.28])
    H = np.array([1.0 + 0.0j, 0.5 - 0.5j, 0.25j])
    src = mpa.FilteredSource(0.25, freqs, H, dt)
    assert src.err < 1e-6 * np.linalg.norm(H) + 1e-9
    t = np.arange(int(src.T / (dt / 2))) * (dt / 2)
    y = np.array([src.dipole(ti) for ti in t])
    got = np.array([np.sum(y * np.exp(1j * 2 * np.pi * f * t))
                    * (dt / 2) / np.sqrt(2 * np.pi) for f in freqs])
    assert np.allclose(got, H, rtol=1e-3, atol=1e-4 * abs(H).max())


def test_connectivity_constraint_discriminates():
    nz, ny, nx = 12, 8, 1
    conn = np.zeros((nz, ny, nx))
    conn[:, 3:5, :] = 1.0
    disc = np.zeros((nz, ny, nx))
    disc[6:, 3:5, :] = 1.0
    f1 = mpa.constraint_connectivity(conn.ravel(), nx, ny, nz,
                                     thresh=1.0, need_grad=False)
    f2, g2 = mpa.constraint_connectivity(disc.ravel(), nx, ny, nz,
                                         thresh=1.0)
    assert f2 > f1
    assert g2.shape == (nz * ny * nx,)
    idx, fd = mpa.cc_fd(disc.ravel(), nx, ny, nz, thresh=1.0,
                        num_grad=2, db=1e-3)
    assert fd.shape == (2,)


def test_filters_and_helpers():
    Nx, Ny, X, Y = mpa.mesh_grid(0.5, 2.0, 2.0, 10)
    assert Nx == 21 and Ny == 21
    x = np.zeros((21, 21))
    x[10, 10] = 1.0
    rr = np.sqrt(X ** 2 + Y ** 2)
    h = np.where(rr <= 0.5, 1.0, 0.0)
    hk = np.zeros_like(x)
    hk[: h.shape[0], : h.shape[1]] = h
    y = np.asarray(mpa.convolve_design_weights_and_kernel(x, hk))
    assert y.shape == x.shape and y.sum() == pytest.approx(1.0, rel=1e-6)
    a = mpa.atleast_3d(np.zeros(5))
    assert a.shape == (5, 1, 1)


def test_geom_tensor_transforms():
    m = mp.Medium(epsilon_diag=mp.Vector3(2, 4, 2))
    m.rotate(mp.Vector3(0, 0, 1), np.pi / 4)
    # 45-degree rotation mixes xx/yy: diag -> 3, offdiag xy -> +-1
    assert m.epsilon_diag.x == pytest.approx(3.0)
    assert abs(m.epsilon_offdiag.x) == pytest.approx(1.0)
    v = mp.Vector3(1, 0, 0).rotate(mp.Vector3(0, 0, 1), np.pi / 2)
    assert v.close(mp.Vector3(0, 1, 0), tol=1e-12)
    assert mp.Vector3(1, 2, 3).cdot(mp.Vector3(1, 2, 3)) == \
        pytest.approx(14.0)
    M = mp.Matrix(diag=mp.Vector3(1, 2, 3))
    assert M.conj().determinant() == pytest.approx(6.0)


def test_source_add_source_hook():
    sim = mp.Simulation(cell_size=mp.Vector3(4, 4), resolution=8,
                        boundary_layers=[mp.PML(1.0)])
    s = mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                  component=mp.Ez, center=mp.Vector3())
    s.add_source(sim)
    assert s in sim.sources or any(q is s for q in sim.sources)
    sim.run(until=2.0)
    assert np.abs(np.asarray(sim.get_array(component="ez"))).max() > 0
    es = mp.EigenModeSource(mp.GaussianSource(frequency=0.25, fwidth=0.1),
                            center=mp.Vector3())
    assert es.eig_power(0.25) > 0
