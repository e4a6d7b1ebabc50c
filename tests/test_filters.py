"""Projection / morphology / length-scale filter gates
(python/adjoint/filters.py parity; formulas from Sigmund 2007, Guest 2004,
Zhou 2015, Lazarov 2016, Hammond 2023)."""

import numpy as np
import jax
import jax.numpy as jnp

from meep_nl_tpu.adjoint import filters as F


def _disk(n=80, r=18):
    x = np.arange(n) - n / 2 + 0.5
    X, Y = np.meshgrid(x, x, indexing="ij")
    return (X ** 2 + Y ** 2 < r ** 2).astype(np.float64)


def test_tanh_projection_limits():
    x = jnp.linspace(0, 1, 11)
    p = F.tanh_projection(x, beta=64.0, eta=0.5)
    assert float(p[1]) < 1e-3 and float(p[-2]) > 1 - 1e-3
    assert np.allclose(F.tanh_projection(x, 0.0), x)


def test_heaviside_projection_distinct_and_correct():
    """heaviside_projection is the exponential form — NOT an alias of tanh:
    exactly 0 at x=0 and 1 at x=1 as beta->inf, and different at mid-slope."""
    x = jnp.linspace(0, 1, 21)
    h = F.heaviside_projection(x, beta=20.0, eta=0.5)
    t = F.tanh_projection(x, beta=20.0, eta=0.5)
    assert abs(float(h[0])) < 1e-6 and abs(float(h[-1]) - 1) < 1e-6
    assert float(jnp.max(jnp.abs(h - t))) > 1e-3
    assert bool(jnp.all(jnp.diff(h) >= -1e-12))  # monotone


def test_smoothed_projection_beta_inf_differentiable():
    """At beta=inf the plain projection has zero gradient a.e.; the
    subpixel-smoothed projection keeps a usable interface gradient."""
    rho = F.conic_filter(jnp.asarray(_disk()), radius=0.2, resolution=40.0)

    def obj(r):
        return jnp.sum(F.smoothed_projection(r, beta=np.inf, eta=0.5,
                                             resolution=40.0))

    g = jax.grad(obj)(rho)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 1e-3  # interface pixels carry grad
    # away from interfaces (level-set distance |d| > R) it matches the
    # hard threshold
    p = F.smoothed_projection(rho, beta=np.inf, eta=0.5, resolution=40.0)
    rho_np = np.asarray(rho)
    hard = (rho_np > 0.5).astype(float)
    dx = 1.0 / 40.0
    gx, gy = np.gradient(rho_np)
    norm = np.sqrt((gx / dx) ** 2 + (gy / dx) ** 2)
    d = np.where(norm > 0, (0.5 - rho_np) / np.where(norm > 0, norm, 1), 1e9)
    away = np.abs(d) > 1.2 * (0.55 * dx)
    np.testing.assert_allclose(np.asarray(p)[away], hard[away], atol=1e-6)
    assert np.all(np.asarray(p) >= -1e-9) and np.all(np.asarray(p) <= 1 + 1e-9)


def test_smoothed_projection_finite_beta_matches_tanh_away():
    rho = F.conic_filter(jnp.asarray(_disk()), radius=0.2, resolution=40.0)
    p = F.smoothed_projection(rho, beta=8.0, eta=0.5, resolution=40.0)
    t = F.tanh_projection(rho, beta=8.0, eta=0.5)
    away = np.abs(np.asarray(rho) - 0.5) > 0.1
    np.testing.assert_allclose(np.asarray(p)[away], np.asarray(t)[away],
                               atol=1e-6)


def test_erosion_dilation_orderings():
    """For any morphological pair: dilate(x) >= filter(x) >= erode(x)
    pointwise (up to numerical slack), and they bracket the original disk
    area."""
    x = jnp.asarray(_disk())
    res, rad = 40.0, 0.15
    area = float(x.sum())
    for erode, dilate, extra in [
        (F.exponential_erosion, F.exponential_dilation, dict(beta=10.0)),
        (F.heaviside_erosion, F.heaviside_dilation, dict(beta=10.0)),
        (F.geometric_erosion, F.geometric_dilation, dict(alpha=1e-4)),
        (F.harmonic_erosion, F.harmonic_dilation, dict(alpha=1e-4)),
    ]:
        er = erode(x, rad, resolution=res, **extra)
        di = dilate(x, rad, resolution=res, **extra)
        a_er = float(jnp.sum(jnp.clip(er, 0, 1) > 0.5))
        a_di = float(jnp.sum(jnp.clip(di, 0, 1) > 0.5))
        assert a_er < area < a_di, (erode.__name__, a_er, area, a_di)
        assert np.all(np.isfinite(np.asarray(er)))
        assert np.all(np.isfinite(np.asarray(di)))


def test_morphology_differentiable():
    x = jnp.asarray(_disk(40, 9))
    g = jax.grad(lambda v: jnp.sum(
        F.exponential_dilation(v, 0.1, beta=8.0, resolution=40.0)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_length_scale_constraints():
    """A design with feature size >> lengthscale satisfies the solid/void
    constraints (g ~ 0); a single-pixel-checkerboard violates them."""
    res = 40.0
    radius = 0.25
    filt = lambda v: F.conic_filter(v, radius, res)
    thresh = lambda v: F.tanh_projection(v, beta=16.0, eta=0.5)
    big = jnp.asarray(_disk(80, 25))
    checker = jnp.asarray(np.indices((80, 80)).sum(0) % 2).astype(float)
    g_big = float(F.constraint_solid(big, 1e4, 0.75, filt, thresh, res))
    g_chk = float(F.constraint_solid(checker, 1e4, 0.75, filt, thresh, res))
    assert g_big < g_chk
    gv_big = float(F.constraint_void(big, 1e4, 0.25, filt, thresh, res))
    assert np.isfinite(gv_big)
    # gray indicator: binary design ~0, uniform 0.5 design = 100
    assert float(F.gray_indicator(jnp.round(big))) < 1e-9
    assert abs(float(F.gray_indicator(0.5 * jnp.ones((4, 4)))) - 100) < 1e-9


def test_conic_radius_eta_roundtrip():
    for b in (0.05, 0.1, 0.2):
        for eta_e in (0.55, 0.7, 0.8, 0.95):
            R = F.get_conic_radius_from_eta_e(b, eta_e)
            assert abs(F.get_eta_from_conic(b, R) - eta_e) < 1e-9


def test_bilinear_basis():
    """BilinearInterpolationBasis: exact on bilinear functions, symmetric
    folding, and VJP == jax-grad of a scalar functional (basis.py:45)."""
    import jax.numpy as jnp
    from meep_nl_tpu.adjoint.basis import BilinearInterpolationBasis

    b = BilinearInterpolationBasis(resolution=4, size=(2.0, 2.0))
    xs = jnp.linspace(-0.9, 0.9, 7)
    ys = jnp.linspace(-0.9, 0.9, 7)
    # a bilinear target a + bx + cy + dxy is reproduced exactly
    gx, gy = np.meshgrid(b.rho_x, b.rho_y, indexing="ij")
    rho = 0.3 + 0.2 * gx - 0.1 * gy + 0.15 * gx * gy
    got = b.interpolate(rho.ravel(), xs, ys)
    want = 0.3 + 0.2 * np.array(xs) - 0.1 * np.array(ys) \
        + 0.15 * np.array(xs) * np.array(ys)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # mirror symmetry folds negative coordinates
    bs = BilinearInterpolationBasis(resolution=4, size=(2.0, 2.0),
                                    symmetry=["x"])
    v1 = bs.interpolate(bs.rho_vector, jnp.array([0.4]), jnp.array([0.2]))
    v2 = bs.interpolate(bs.rho_vector, jnp.array([-0.4]), jnp.array([0.2]))
    np.testing.assert_allclose(v1, v2)
    # VJP matches finite differences
    import jax
    f = lambda r: jnp.sum(b.interpolate(r, xs, ys) ** 2)
    r0 = jnp.asarray(np.random.RandomState(0).rand(b.num_design_params))
    u = b.interpolate(r0, xs, ys)
    vjp = b.get_basis_vjp(2 * u, xs, ys)
    np.testing.assert_allclose(vjp, jax.grad(f)(r0), atol=1e-5,
                               rtol=1e-5)


def test_unfilter_design_roundtrip():
    """unfilter_design recovers pre-filter variables whose processed
    output matches the target (unfilter_design.py:6)."""
    import jax.numpy as jnp
    from meep_nl_tpu.adjoint.basis import unfilter_design
    from meep_nl_tpu.adjoint.filters import conic_filter, tanh_projection

    rng = np.random.RandomState(1)
    n = 16
    x_true = (rng.rand(n, n) > 0.5).astype(np.float64)

    def processing(x):
        f = conic_filter(x.reshape(n, n), 0.15, 10.0)
        return tanh_projection(f, beta=8.0, eta=0.5).ravel()

    target = processing(jnp.asarray(x_true))
    x = unfilter_design(np.asarray(target), processing, maxiter=300)
    err = np.abs(processing(jnp.asarray(x)) - np.asarray(target)).max()
    assert err < 0.08, err
