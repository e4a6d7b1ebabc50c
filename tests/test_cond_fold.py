"""Conductivity folding (ops/pallas/condfold): a plan with interior D/B
conductivity rewritten as an equivalent cond-free plan whose chain1
coefficients carry the lossy update — jnp(original) == jnp(folded) ==
fused-kernel(folded), so lossy media ride the fast path.

Reference semantics matched: step_generic.cpp:58-62 (fcnd bookkeeping),
sources scaled by 1/(1+sigma*dt/2) at conductive sites (sources.cpp).

Runs in pallas interpret mode on the CPU test mesh."""

import os

os.environ["MNT_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                      compile_plan)
from meep_nl_tpu.stepper.step import init_state, run
from meep_nl_tpu.ops.pallas import fdtd3d
from meep_nl_tpu.ops.pallas.condfold import fold_conductivity, \
    resync_cond_state


def _cond_block(gv, comp, sigma, frac=0.25, center=0.0):
    """Conductivity array at `comp` sites: sigma inside a cube of
    half-width frac*size, offset by `center` (scalar: along x only;
    tuple: per axis), 0 outside."""
    arr = np.zeros(gv.shape)
    off = (center, 0.0, 0.0) if np.isscalar(center) else tuple(center)
    mask = np.ones(gv.shape, bool)
    for ax in range(gv.ndim):
        x = gv.comp_coords(comp, ax)
        cx = 0.5 * (x[0] + x[-1]) + off[ax]
        half = frac * (x[-1] - x[0]) / 2
        m = np.abs(x - cx) < half
        shape = [1] * gv.ndim
        shape[ax] = len(x)
        mask &= m.reshape(shape)
    arr[mask] = sigma
    return arr


def _plan_cond(pml_axes="xyz", cond_comps=("dx", "dy", "dz"), sigma=0.8,
               frac=0.25, src_pt=(0.55, 0.0, 0.0), res=8.0,
               cells=(24, 16, 16), block_center=0.0):
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    cond = {c: _cond_block(gv, c, sigma, frac, block_center)
            for c in cond_comps}
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", list(src_pt))
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv={}, cond=cond), pmls=pmls,
                        sources=[src], pad_to_multiple=(8, 1, 1))
    return plan


def _run_pair(plan, nsteps=30, slab_opt=True):
    fold = fold_conductivity(plan)
    assert fold is not None, "fold must apply"
    plan.slab_opt = slab_opt
    fold.slab_opt = slab_opt
    st_o = run(plan, init_state(plan), nsteps)
    st_f = run(fold, init_state(fold), nsteps)
    return st_o, st_f, fold


def _assert_fields_close(st_ref, st_got, atol=2e-6):
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_ref["f"].values())
    assert scale > 0
    for c in st_ref["f"]:
        np.testing.assert_allclose(np.asarray(st_got["f"][c]),
                                   np.asarray(st_ref["f"][c]),
                                   atol=atol * scale, err_msg=f"f[{c}]")


def test_fold_jnp_equivalence():
    """jnp(original) == jnp(folded) with interior D conductivity + uPML,
    both slab-local and full-chain modes."""
    for slab_opt in (False, True):
        st_o, st_f, _ = _run_pair(_plan_cond(), slab_opt=slab_opt)
        _assert_fields_close(st_o, st_f)
        # the lossy block must actually be doing something: compare
        # against the cond-free run
        plan0 = _plan_cond(sigma=0.0)
        plan0.slab_opt = slab_opt
        st_0 = run(plan0, init_state(plan0), 30)
        assert not np.allclose(np.asarray(st_0["f"]["ez"]),
                               np.asarray(st_o["f"]["ez"]),
                               atol=1e-4 * float(
                                   np.max(np.abs(np.asarray(st_0["f"]["ez"])))))


def test_fold_kernel_matches_jnp():
    """Fused depth-1 kernel on the folded plan == jnp on the original."""
    plan = _plan_cond()
    fold = fold_conductivity(plan)
    assert fold is not None
    bx = 8
    assert fdtd3d.supported(fold, bx), "folded plan inside the envelope"
    plan.slab_opt = True
    ker = fdtd3d.Fdtd3dKernel(fold, bx)
    full_k = ker.to_full(ker.run(ker.init_state(), 30))
    st_j = run(plan, init_state(plan), 30)
    _assert_fields_close(st_j, full_k)


def test_fold_b_conductivity():
    """B-conductivity comps fold the same way (magnetic loss)."""
    plan = _plan_cond(cond_comps=("bx", "by", "bz"), sigma=0.5)
    st_o, st_f, fold = _run_pair(plan)
    _assert_fields_close(st_o, st_f)
    assert fdtd3d.supported(fold, 8)
    ker = fdtd3d.Fdtd3dKernel(fold, 8)
    full_k = ker.to_full(ker.run(ker.init_state(), 30))
    _assert_fields_close(st_o, full_k)


def test_fold_source_inside_cond():
    """A source at a conductive site: the cndinv amp scaling is baked
    into the folded amps, and f_u mirroring keeps fu == f there."""
    plan = _plan_cond(src_pt=(0.0, 0.0, 0.0), sigma=1.2, frac=0.35)
    # the source must actually sit on conductive sites
    cnd = np.asarray(plan.coefs["dz:cnd"])
    idx = np.asarray(plan.sources[0].indices)
    assert np.all(cnd[tuple(idx.T)] > 0)
    assert "src0:cndinv" in plan.coefs
    st_o, st_f, fold = _run_pair(plan)
    assert "src0:cndinv" not in fold.coefs
    _assert_fields_close(st_o, st_f)
    assert fdtd3d.supported(fold, 8)
    ker = fdtd3d.Fdtd3dKernel(fold, 8)
    full_k = ker.to_full(ker.run(ker.init_state(), 30))
    _assert_fields_close(st_o, full_k)


def test_fold_rejects_pml_overlap():
    """Conductivity reaching into the PML slabs cannot fold (the fcnd
    auxiliary is genuinely needed there)."""
    plan = _plan_cond(frac=0.98)
    assert fold_conductivity(plan) is None
    # global conductivity with PML: same rejection
    gv = plan.gv
    plan2 = _plan_cond(frac=10.0)
    assert fold_conductivity(plan2) is None


def test_fold_no_pml_synthesized_chain():
    """Conductivity in a PEC-walled cell (no PML): the fold synthesizes
    a chain1 where none existed."""
    plan = _plan_cond(pml_axes="", sigma=0.6)
    for s in plan.curl_specs_d:
        if s.c == "dz":
            assert s.dsig_axis is None    # nothing to fold into
    st_o, st_f, fold = _run_pair(plan, slab_opt=False)
    _assert_fields_close(st_o, st_f)


def test_resync_cond_state():
    """After a folded stretch, f_cond == f at the conductive sites (the
    invariant the fold rests on), restored by resync_cond_state."""
    plan = _plan_cond()
    plan.slab_opt = True
    st = run(plan, init_state(plan), 30)
    cnd = np.asarray(plan.coefs["dz:cnd"])
    live = cnd != 0
    np.testing.assert_allclose(np.asarray(st["f_cond"]["dz"])[live],
                               np.asarray(st["f"]["dz"])[live],
                               rtol=0, atol=1e-7 * float(
                                   np.max(np.abs(np.asarray(st["f"]["dz"])))))
    fold = fold_conductivity(plan)
    st_f = run(fold, init_state(plan), 30)   # folded run, orig state shape
    st_r = resync_cond_state(plan, st_f)
    np.testing.assert_allclose(np.asarray(st_r["f_cond"]["dz"])[live],
                               np.asarray(st_r["f"]["dz"])[live])


def test_fold_t2_kernel():
    """Temporally-fused depth-2 and depth-3 kernels on the folded plan ==
    jnp on the original (full-grid chain1 coefs at every stage)."""
    from meep_nl_tpu.ops.pallas import fdtd3d_t2
    plan = _plan_cond()
    fold = fold_conductivity(plan)
    assert fold is not None
    plan.slab_opt = True
    st_j = run(plan, init_state(plan), 24)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    for depth, bx in ((2, 8), (3, 4)):
        assert fdtd3d_t2.supported(fold, bx, depth=depth), f"depth {depth}"
        ker = fdtd3d_t2.Fdtd3dT2Kernel(fold, bx, depth=depth)
        full_k = ker.to_full(ker.run(ker.init_state(), 24))
        for c in st_j["f"]:
            np.testing.assert_allclose(
                np.asarray(full_k["f"][c]), np.asarray(st_j["f"][c]),
                atol=2e-6 * scale, err_msg=f"f[{c}] depth={depth}")


def _plan_lorentz_cond(cond_offset=1.2, sigma=0.8, with_nr=False,
                       res=8.0, cells=(32, 24, 24)):
    """Lorentz ball at the cell center + a lossy block offset along x
    (the reference's OLED-benchmark class: dispersive medium + absorbing
    conductivity, doc/docs/Parallel_Meep.md:138)."""
    from meep_nl_tpu.stepper.plan import PolSpec
    size = [n / res for n in cells]
    gv = G.GridVolume.create("3d", size, res)
    shape = gv.shape
    x, y, z = [gv.comp_coords("ez", ax) for ax in range(3)]
    cx, cy, cz = [0.5 * (c[0] + c[-1]) for c in (x, y, z)]
    XX, YY, ZZ = np.meshgrid(x - cx, y - cy, z - cz, indexing="ij")
    ball = XX ** 2 + YY ** 2 + ZZ ** 2 < (min(size) / 6) ** 2
    eps = np.ones(shape)
    eps[ball] = 4.0
    chi1inv = {c: {c[1]: 1.0 / eps} for c in ("ex", "ey", "ez")}
    pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                    sigma={(c, c[1]): 0.3 * ball.astype(np.float64)
                           for c in ("ex", "ey", "ez")})]
    nr = {}
    if with_nr:
        c2 = np.zeros(shape)
        c2[ball] = 0.08
        nr = {c: c2 for c in ("ex", "ey", "ez")}
    cond = {c: _cond_block(gv, c, sigma, frac=0.12, center=cond_offset)
            for c in ("dx", "dy", "dz")}
    mat = MaterialSpec(chi1inv=chi1inv, pols=pols, nr_chi2=nr, cond=cond)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [size[0] * 0.3, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 0.5) for d in "xyz"]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[src],
                        pad_to_multiple=(8, 1, 1))
    plan.slab_opt = True
    return plan


def test_fold_lorentz_plus_cond():
    """Dispersive (Lorentz ADE) + offset conductivity through the fused
    kernels — depth-1 and the temporally-fused depth-2."""
    from meep_nl_tpu.ops.pallas import fdtd3d_t2
    plan = _plan_lorentz_cond()
    fold = fold_conductivity(plan)
    assert fold is not None
    st_j = run(plan, init_state(plan), 24)
    scale = max(float(np.max(np.abs(np.asarray(v))))
                for v in st_j["f"].values())
    assert fdtd3d.supported(fold)
    k1 = fdtd3d.Fdtd3dKernel(fold)
    full_1 = k1.to_full(k1.run(k1.init_state(), 24))
    for c in st_j["f"]:
        np.testing.assert_allclose(np.asarray(full_1["f"][c]),
                                   np.asarray(st_j["f"][c]),
                                   atol=2e-6 * scale, err_msg=f"k1 f[{c}]")
    if fdtd3d_t2.supported(fold, depth=2):
        k2 = fdtd3d_t2.Fdtd3dT2Kernel(fold, depth=2)
        full_2 = k2.to_full(k2.run(k2.init_state(), 24))
        for c in st_j["f"]:
            np.testing.assert_allclose(np.asarray(full_2["f"][c]),
                                       np.asarray(st_j["f"][c]),
                                       atol=2e-6 * scale,
                                       err_msg=f"t2 f[{c}]")
    else:
        pytest.fail("t2 must accept offset cond + Lorentz window")


def test_fold_nl_overlap_rejected():
    """Conductivity inside the chi2-NR stencil reach must fall off the
    fused path (the NL next-plane rebuild assumes identity chains)."""
    plan = _plan_lorentz_cond(cond_offset=0.0, with_nr=True)
    fold = fold_conductivity(plan)
    assert fold is not None          # fold itself is fine (PML-clear)
    assert not fdtd3d.supported(fold)


def test_fold_sharded_run():
    """parallel/mesh.sharded_run routes cond plans through the per-shard
    fused kernel on the folded equivalent and matches jnp SPMD."""
    from meep_nl_tpu.parallel import mesh as PM
    from meep_nl_tpu.parallel.fused_mesh import sharded_supported
    plan = _plan_cond(cells=(64, 16, 16), frac=0.12)
    fold = fold_conductivity(plan)
    assert fold is not None and sharded_supported(fold, 4)
    plan.slab_opt = True
    mesh = PM.make_mesh(4, shape=(4,))
    st_f = PM.sharded_run(plan, mesh, init_state(plan), 12)
    st_j = PM.sharded_run(plan, mesh, init_state(plan), 12,
                          prefer_fused=False)
    _assert_fields_close(st_j, st_f, atol=3e-6)
    # fused engagement, not a silent jnp fall-through: the folded plan
    # must be cached on the original
    assert getattr(plan, "_cond_fold", None) not in (None, False)
