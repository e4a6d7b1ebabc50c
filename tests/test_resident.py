"""VMEM-resident whole-grid kernel (ops/pallas/resident).

Correctness: the resident runner (interpret mode on CPU) must match the
jnp stepper at fp32 roundoff for every envelope family — the kernel body
IS the jnp stepper traced into a Mosaic program, so disagreement means a
scatter_free substitution (dense sources, where-based ring writes,
frequency-major DFT layout) broke equivalence.

Lowering: jax.export runs the full Pallas->Mosaic lowering pipeline
without TPU hardware; test_lowering_* prove each family actually
compiles for the TPU backend (the interpret-mode runs alone would not
catch an unsupported primitive).
"""

import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.ops.pallas.resident import (resident_run,
                                             resident_supported,
                                             validate_lowering)


@pytest.fixture
def resident_cpu(monkeypatch):
    monkeypatch.setenv("MNT_RESIDENT_CPU", "1")


def _mk_2d():
    return mp.Simulation(
        cell_size=mp.Vector3(6, 5), resolution=12,
        geometry=[mp.Cylinder(radius=1.0,
                              material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(0.5, fwidth=0.2), mp.Ez,
                           center=mp.Vector3(-2, 0))],
        boundary_layers=[mp.PML(1.0)])


def _mk_bloch():
    return mp.Simulation(
        cell_size=mp.Vector3(4, 3), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(0.8, 0.8),
                           material=mp.Medium(epsilon=6))],
        sources=[mp.Source(mp.GaussianSource(0.6, fwidth=0.3), mp.Ez,
                           center=mp.Vector3(0.3, 0.2))],
        k_point=mp.Vector3(0.23, 0.11))


def _mk_cyl():
    return mp.Simulation(
        cell_size=mp.Vector3(4, 0, 5), resolution=10,
        dimensions=mp.CYLINDRICAL, m=1,
        geometry=[mp.Block(center=mp.Vector3(0, 0, 0),
                           size=mp.Vector3(2, 0, 1),
                           material=mp.Medium(epsilon=4))],
        sources=[mp.Source(mp.GaussianSource(0.5, fwidth=0.2), mp.Er,
                           center=mp.Vector3(0.5, 0, -1))],
        boundary_layers=[mp.PML(1.0)])


def _mk_disp():
    return mp.Simulation(
        cell_size=mp.Vector3(5, 4), resolution=12,
        geometry=[mp.Block(size=mp.Vector3(2, 2), material=mp.Medium(
            epsilon=3,
            E_susceptibilities=[mp.LorentzianSusceptibility(
                frequency=1.1, gamma=0.1, sigma=0.4)],
            chi2=0.2))],
        sources=[mp.Source(mp.GaussianSource(0.4, fwidth=0.15), mp.Ez,
                           center=mp.Vector3(-1.6, 0))],
        boundary_layers=[mp.PML(0.8)])


def _mk_bfast():
    return mp.Simulation(
        cell_size=mp.Vector3(0.1, 0.1, 8), resolution=12, Courant=0.35,
        geometry=[mp.Block(center=mp.Vector3(0, 0, 2),
                           size=mp.Vector3(mp.inf, mp.inf, 4),
                           material=mp.Medium(epsilon=4))],
        sources=[mp.Source(mp.GaussianSource(0.7, fwidth=0.3), mp.Ex,
                           center=mp.Vector3(0, 0, -3),
                           size=mp.Vector3(0.1, 0.1, 0))],
        boundary_layers=[mp.PML(1.5, direction=mp.Z)],
        k_point=mp.Vector3(0, 0, 0),
        bfast_scaled_k=mp.Vector3(0.3, 0, 0))


def _mk_rot2():
    med = mp.Medium(epsilon=4)
    return mp.Simulation(
        cell_size=mp.Vector3(8, 8, 0), resolution=10,
        boundary_layers=[mp.PML(1.0)],
        geometry=[mp.Cylinder(radius=0.47, center=mp.Vector3(0.9, -0.9),
                              material=med),
                  mp.Cylinder(radius=0.47, center=mp.Vector3(-0.9, 0.9),
                              material=med)],
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez,
                           center=mp.Vector3(1.23, 0.71))],
        symmetries=[mp.Rotate2("z", phase=1)],
        eps_averaging=False)


def _mk_rot4():
    return mp.Simulation(
        cell_size=mp.Vector3(8, 8, 0), resolution=10,
        boundary_layers=[mp.PML(1.0)],
        geometry=[mp.Cylinder(radius=0.47, center=mp.Vector3(0.9, 1.6),
                              material=mp.Medium(epsilon=4))],
        sources=[mp.Source(mp.GaussianSource(frequency=1.0, fwidth=0.5),
                           component=mp.Ez,
                           center=mp.Vector3(1.23, 0.71))],
        symmetries=[mp.Rotate4("z", phase=1)],
        eps_averaging=False)


def _mk_multilevel():
    f0 = 0.7
    atom = mp.MultilevelAtom(
        initial_populations=[0.0, 1.0],
        transitions=[mp.Transition(from_level=1, to_level=0,
                                   frequency=f0, gamma=0.05,
                                   transition_rate=0.005)],
        sigma=0.3)
    return mp.Simulation(
        cell_size=mp.Vector3(6, 4), resolution=10,
        geometry=[mp.Block(size=mp.Vector3(2.5, 2.0),
                           material=mp.Medium(
                               epsilon=1.0, E_susceptibilities=[atom]))],
        sources=[mp.Source(mp.GaussianSource(f0, fwidth=0.1), mp.Ez,
                           center=mp.Vector3(-2.2, 0))],
        boundary_layers=[mp.PML(0.8)])


def _mk_3d():
    return mp.Simulation(
        cell_size=mp.Vector3(3, 3, 3), resolution=8,
        geometry=[mp.Sphere(radius=0.7,
                            material=mp.Medium(epsilon=8))],
        sources=[mp.Source(mp.GaussianSource(0.8, fwidth=0.3), mp.Ez,
                           center=mp.Vector3(-1, 0, 0))],
        boundary_layers=[mp.PML(0.8)])


def _compare(mk, until=12.0, tol=2e-5):
    """jnp-stepper run vs direct resident_run on identical plans."""
    s1 = mk()
    s1.use_fused = False
    s1.init_sim()
    s1.run(until=until)
    comp = "ez" if "ez" in s1._state["f"] else sorted(s1._state["f"])[0]
    a1 = np.asarray(s1._state["f"][comp])

    s2 = mk()
    s2.init_sim()
    plan = s2._plan
    assert resident_supported(plan)
    out = resident_run(plan, s2._state, s1._t, 0)
    assert out is not None
    a2 = np.asarray(out["f"][comp])
    scale = max(np.abs(a1).max(), 1e-30)
    assert np.abs(a1 - a2).max() / scale < tol
    return s1, out


def test_2d_tm_pml(resident_cpu):
    _compare(_mk_2d)


def test_bloch_pair(resident_cpu, monkeypatch):
    monkeypatch.setenv("MNT_REAL_PAIR", "1")
    _compare(_mk_bloch)


def test_cylindrical_m1(resident_cpu, monkeypatch):
    monkeypatch.setenv("MNT_REAL_PAIR", "1")
    _compare(_mk_cyl)


def test_lorentz_chi2(resident_cpu):
    _compare(_mk_disp)


def test_multilevel_gain(resident_cpu):
    """Multilevel-atom (lasing) medium through the resident kernel:
    the population einsum + transition oscillators trace into the
    Mosaic program and match the jnp stepper (VERDICT r4 missing #5;
    ref multilevel-atom.cpp:240-384)."""
    _compare(_mk_multilevel, until=10.0)


def test_bfast(resident_cpu, monkeypatch):
    monkeypatch.setenv("MNT_REAL_PAIR", "1")   # BFAST forces complex
    _compare(_mk_bfast)


def test_small_3d(resident_cpu):
    _compare(_mk_3d)


def test_rot2(resident_cpu):
    """C2 fold-plane ghosts (where-based plane-0 writes under
    scatter_free) match the jnp stepper's scatter form."""
    _compare(_mk_rot2)


def test_rot4(resident_cpu):
    """C4 transposed component-swapped ghosts through the resident
    kernel match the jnp stepper."""
    _compare(_mk_rot4)


def test_dft_accumulators_match(resident_cpu):
    """Flux spectra through the in-kernel frequency-major DFT match the
    jnp path (dft.cpp:265 in-loop accumulation semantics)."""
    def mk():
        s = _mk_2d()
        s._fl = s.add_flux(0.5, 0.2, 5, mp.FluxRegion(
            center=mp.Vector3(2, 0), size=mp.Vector3(0, 3)))
        return s

    s1 = mk()
    s1.use_fused = False
    s1.init_sim()
    s1.run(until=15)
    f1 = np.array(mp.get_fluxes(s1._fl))

    s2 = mk()
    s2.init_sim()
    out = resident_run(s2._plan, s2._state, s1._t, 0)
    assert out is not None
    s2._state = out
    s2._t = s1._t
    f2 = np.array(mp.get_fluxes(s2._fl))
    assert np.abs(f1 - f2).max() <= 1e-5 * max(np.abs(f1).max(), 1e-30)


def test_simulation_routing(resident_cpu):
    """Simulation.run engages the resident path (use_fused default) and
    produces the jnp-path fields."""
    s1 = _mk_2d()
    s1.use_fused = False
    s1.init_sim()
    s1.run(until=10)
    a1 = s1.get_array(mp.Ez)

    s2 = _mk_2d()
    s2.init_sim()
    s2.run(until=10)
    assert getattr(s2._plan, "_resident_kernel", None) is not None, \
        "resident path did not engage"
    a2 = s2.get_array(mp.Ez)
    assert np.abs(a1 - a2).max() < 2e-5 * max(np.abs(a1).max(), 1e-30)


def test_chunked_run_matches_single(resident_cpu, monkeypatch):
    """MAX_CHUNK splitting is seam-free (xs tables re-based per chunk)."""
    from meep_nl_tpu.ops.pallas import resident as R
    s1 = _mk_2d()
    s1.init_sim()
    out1 = resident_run(s1._plan, s1._state, 96, 0)
    s2 = _mk_2d()
    s2.init_sim()
    monkeypatch.setattr(R, "MAX_CHUNK", 40)
    out2 = resident_run(s2._plan, s2._state, 96, 0)
    a1 = np.asarray(out1["f"]["ez"])
    a2 = np.asarray(out2["f"]["ez"])
    assert np.abs(a1 - a2).max() < 1e-6 * max(np.abs(a1).max(), 1e-30)


def test_probed_series_match(resident_cpu):
    """Per-step probe series from the in-kernel SMEM emitters match the
    jnp scan's probe outputs (monitor.cpp get_field series analog)."""
    from meep_nl_tpu.stepper import step as S
    from meep_nl_tpu.stepper.step import ProbeSpec
    from meep_nl_tpu.ops.pallas.resident import ResidentKernel

    s = _mk_2d()
    s.init_sim()
    pr = ProbeSpec(name="p0", component="ez",
                   indices=np.array([[30, 28], [30, 29]]),
                   weights=np.array([0.6, 0.4]))
    st1, ys1 = S.run(s._plan, s._state, 100, t0=0, probes=[pr])
    ker = ResidentKernel(s._plan)
    st2, ys2 = ker.run_probed(s._state, 100, 0, [pr])
    a1 = np.asarray(ys1["p0"])
    a2 = np.asarray(ys2["p0"])
    scale = max(np.abs(a1).max(), 1e-30)
    assert np.abs(a1 - a2).max() / scale < 1e-5
    f1 = np.asarray(st1["f"]["ez"])
    f2 = np.asarray(st2["f"]["ez"])
    assert np.abs(f1 - f2).max() / max(np.abs(f1).max(), 1e-30) < 1e-5


def test_probed_pair_series(resident_cpu, monkeypatch):
    """Pair-channel probe series (complex fields) through the resident
    emitters match the jnp scan."""
    monkeypatch.setenv("MNT_REAL_PAIR", "1")
    from meep_nl_tpu.stepper import step as S
    from meep_nl_tpu.stepper.step import ProbeSpec
    from meep_nl_tpu.ops.pallas.resident import ResidentKernel

    s = _mk_bloch()
    s.init_sim()
    pr = ProbeSpec(name="p0", component="ez",
                   indices=np.array([[20, 14]]),
                   weights=np.array([1.0 + 0.5j]))
    st1, ys1 = S.run(s._plan, s._state, 80, t0=0, probes=[pr])
    ker = ResidentKernel(s._plan)
    st2, ys2 = ker.run_probed(s._state, 80, 0, [pr])
    a1 = np.asarray(ys1["p0"])
    a2 = np.asarray(ys2["p0"])
    assert a1.shape == a2.shape == (80, 2)
    scale = max(np.abs(a1).max(), 1e-30)
    assert np.abs(a1 - a2).max() / scale < 1e-5


def test_probed_routing_harminv(resident_cpu):
    """A Harminv collector run engages the resident probed path."""
    s = _mk_2d()
    h = mp.Harminv(mp.Ez, mp.Vector3(1.0, 0.3), 0.5, 0.4)
    s.run(h, until_after_sources=20)
    assert getattr(s._plan, "_resident_kernel", None) is not None
    assert len(h.data) > 0


def test_lowering_2d_flux():
    """The 2D+PML+DFT program lowers through the full Pallas->Mosaic
    pipeline for the TPU backend."""
    s = _mk_2d()
    s.add_flux(0.5, 0.2, 5, mp.FluxRegion(center=mp.Vector3(2, 0),
                                          size=mp.Vector3(0, 3)))
    s.init_sim()
    assert validate_lowering(s._plan, nsteps=8) > 0


@pytest.mark.slow
def test_lowering_probed():
    """The probed runner (SMEM series stores at the loop index) lowers
    for the TPU backend."""
    import jax
    import jax.numpy as jnp
    from jax import export
    from meep_nl_tpu.ops.pallas.resident import ResidentKernel
    from meep_nl_tpu.stepper.step import build_xs, init_state

    s = _mk_2d()
    s.init_sim()
    ker = ResidentKernel(s._plan)
    st = dict(init_state(ker.rplan, _slab_ok=False))
    st["dft"] = {k: jnp.moveaxis(v, (-2, -1), (0, 1))
                 for k, v in st["dft"].items()}
    _, leaves, treedef = ker._split_state(st)
    xs = build_xs(ker.rplan, 8, 0)
    xs_keys = sorted(xs)
    xs_list = [xs[k] for k in xs_keys]
    pdefs = (("hm0", "ez", ((10, 10), (10, 11)), (0.5, 0.5),
              (0.0, 0.0)),)
    runner = ker._runner_probed(8, treedef, xs_keys, ker.coef_keys,
                                pdefs)

    def sds(lst):
        return [jax.ShapeDtypeStruct(np.asarray(v).shape,
                                     np.asarray(v).dtype) for v in lst]

    exp = export.export(runner, platforms=["tpu"])(
        sds(leaves), sds(ker._C_list), sds(xs_list))
    assert len(exp.mlir_module()) > 0


@pytest.mark.slow
@pytest.mark.parametrize("mk,pair", [
    (_mk_bloch, True), (_mk_cyl, True), (_mk_disp, False),
    (_mk_bfast, True), (_mk_3d, False), (_mk_rot2, False),
    (_mk_rot4, False), (_mk_multilevel, False)])
def test_lowering_families(mk, pair, monkeypatch):
    if pair:
        monkeypatch.setenv("MNT_REAL_PAIR", "1")
    s = mk()
    s.init_sim()
    assert validate_lowering(s._plan, nsteps=4) > 0
