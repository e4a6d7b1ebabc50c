"""Benchmark: Yee-cell updates/sec on a 3D uPML-bounded grid at fp32.

The reference's own throughput metric is grid-point updates/sec
(tests/bench.cpp:28-54 `b.gridsteps/b.time`); BASELINE.json's north star is
>=10 GCells/s per TPU chip on a 3D PML-bounded grid at fp32.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

The axon TPU tunnel in this environment wedges on some larger grids
(execution never completes; see memory axon-tpu-tunnel-quirks), so the
driver-facing entry tries a descending ladder of grid sizes in subprocesses
with timeouts and reports the largest size that completes.
"""

import json
import os
import subprocess
import sys
import time

_T_PROC = time.perf_counter()   # process start, for the re-measure budget
# max extra re-measure iterations per probe (min-of-k): keeps any single
# probe from filling the whole suite budget (round-4 failure mode:
# periodic/pair/resident probes recorded "skipped: budget exhausted")
_REMEASURE = int(os.environ.get("BENCH_REMEASURE", "3"))


def run_resident():
    """2D measurement through the VMEM-resident whole-grid kernel
    (ops/pallas/resident): the entire time loop runs as one Mosaic
    program with zero per-step HBM traffic — the production path for the
    reference's 2D configs (tests/bench.cpp:33-90 measures 2D cases)."""
    import numpy as np
    import jax
    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("MNT_RESIDENT_CPU", "1")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mnt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    size_env = os.environ.get("BENCH_GRID", "768,768")
    nx, ny = (int(s) for s in size_env.split(",")[:2])
    steps = int(os.environ.get("BENCH_STEPS", "1000"))

    import meep_nl_tpu as mnt
    from meep_nl_tpu.core import grid as G
    from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec,
                                          SrcVolSpec, compile_plan)
    from meep_nl_tpu.stepper.step import init_state
    from meep_nl_tpu.ops.pallas.resident import ResidentKernel

    res = 16.0
    cx, cy = nx - 1, ny - 1
    gv = G.GridVolume.create("2d", [cx / res, cy / res], res)
    # eps disk (the ring-resonator class structure)
    shape = gv.shape
    xs_c, ys_c = [gv.comp_coords("ez", ax) for ax in range(2)]
    ctr = [0.5 * (c[0] + c[-1]) for c in (xs_c, ys_c)]
    XX, YY = np.meshgrid(xs_c - ctr[0], ys_c - ctr[1], indexing="ij")
    eps = np.ones(shape)
    eps[XX ** 2 + YY ** 2 < (cx / res / 6) ** 2] = 12.0
    mat = MaterialSpec(chi1inv={"ez": {"z": 1.0 / eps}})
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [ctr[0] - cx / res / 3, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 1.0) for d in ("x", "y")]
    plan = compile_plan(gv, mat, pmls=pmls, sources=[src],
                        pad_to_multiple=(8, 128))
    ker = ResidentKernel(plan)
    state = init_state(ker.rplan, _slab_ok=False)

    def fence(st):
        return float(st["f"]["ez"][1, 1])

    out = ker.run(state, steps, 0)          # compile + warmup
    _ = fence(out)
    t0 = time.perf_counter()
    out = ker.run(state, steps, 0)
    _ = fence(out)
    dt_wall = time.perf_counter() - t0
    deadline = _T_PROC + float(os.environ.get("BENCH_TIMEOUT", "540")) - 30.0
    it = 0
    while it < _REMEASURE and time.perf_counter() + dt_wall * 1.3 < deadline:
        t0 = time.perf_counter()
        out = ker.run(state, steps, 0)
        _ = fence(out)
        dt_wall = min(dt_wall, time.perf_counter() - t0)
        it += 1
    cells = cx * cy
    gcells = cells * steps / dt_wall / 1e9
    print(json.dumps({
        "metric": "yee_cell_updates_2d_resident_fp32",
        "value": round(gcells, 3),
        "unit": "GCells/s",
        # same >=10 GCells/s per-chip north star (BASELINE.json)
        "vs_baseline": round(gcells / 10.0, 3),
        "grid": [cx, cy],
        "steps": steps,
        "kernel": "resident",
    }))


def run_monitored():
    """Monitored (DFT flux) production run through the PUBLIC Simulation
    API: the hybrid fused driver with plane-sampled DFT cycles — the
    number a user's flux-monitored run actually sees (dft.cpp:265
    in-step DTFT semantics)."""
    import numpy as np
    import jax
    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mnt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    size_env = os.environ.get("BENCH_GRID", "128,128,128")
    nx, ny, nz = (int(s) for s in size_env.split(","))
    steps = int(os.environ.get("BENCH_STEPS", "600"))
    import meep_nl_tpu as mp
    res = 16.0
    cells = (nx - 1, ny - 1, nz - 1)
    size = [n / res for n in cells]
    fcen = 1.0
    # "nl" variant: the flagship material ball (eps=4 + Lorentz pole +
    # chi2-NR) under a flux monitor — NL media disable DFT decimation
    # (dft.cpp:195), so every step samples (d=1) and the run exercises
    # the capture kernel's in-kernel DFT plane emission
    mat_nl = os.environ.get("BENCH_MONITORED") == "nl"
    geometry = []
    if mat_nl:
        med = mp.Medium(epsilon=4.0, chi2=0.05, E_susceptibilities=[
            mp.LorentzianSusceptibility(frequency=2.0, gamma=0.05,
                                        sigma=0.2)])
        geometry = [mp.Sphere(radius=min(size) / 4.0, material=med)]
    sim = mp.Simulation(
        cell_size=mp.Vector3(*size), resolution=res,
        geometry=geometry, eps_averaging=False,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.4),
                           component=mp.Ez,
                           center=mp.Vector3(-size[0] * 0.35 if mat_nl
                                             else -size[0] * 0.25, 0,
                                             0))],
        boundary_layers=[mp.PML(0.5)],
        use_fused=True)
    sim.add_flux(fcen, 0.2, 3,
                 mp.FluxRegion(center=mp.Vector3(
                     size[0] * (0.35 if mat_nl else 0.25), 0, 0),
                               size=mp.Vector3(0, size[1] * 0.4,
                                               size[2] * 0.4)))
    dt = sim.dt

    def fence():
        # a scalar d2h read is the only true completion fence through
        # the tunnel (sim.run dispatch is async)
        return complex(sim.get_field_point(mp.Ez, mp.Vector3()))

    # `until` is a DURATION (reference run-until semantics): every call
    # below advances exactly `steps` more steps, so the jitted hybrid
    # cycle runner is reused across the re-measure loop
    sim.run(until=steps * dt)               # compile + warm
    fence()
    t0 = time.perf_counter()
    sim.run(until=steps * dt)
    fence()
    dt_wall = time.perf_counter() - t0
    deadline = _T_PROC + float(os.environ.get("BENCH_TIMEOUT", "540")) - 30.0
    it = 0
    while it < _REMEASURE and time.perf_counter() + dt_wall * 1.3 < deadline:
        t0 = time.perf_counter()
        sim.run(until=steps * dt)
        fence()
        dt_wall = min(dt_wall, time.perf_counter() - t0)
        it += 1
    ncell = int(np.prod(cells))
    gcells = ncell * steps / dt_wall / 1e9
    print(json.dumps({
        "metric": ("yee_cell_updates_3d_monitored_nl_fp32" if mat_nl
                   else "yee_cell_updates_3d_monitored_flux_fp32"),
        "value": round(gcells, 3),
        "unit": "GCells/s",
        "vs_baseline": round(gcells / 10.0, 3),
        "grid": list(cells),
        "steps": steps,
        "kernel": "hybrid-capture" if mat_nl else "hybrid",
    }))


def run_one():
    """Single measurement at BENCH_GRID (invoked as a subprocess)."""
    import numpy as np
    import jax
    if os.environ.get("BENCH_RESIDENT"):
        run_resident()
        return
    if os.environ.get("BENCH_MONITORED"):
        run_monitored()
        return
    if os.environ.get("BENCH_CPU"):
        # testing escape hatch: the ambient JAX_PLATFORMS=axon tunnel
        # selection wins over env overrides, so force CPU via config
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: tunnel compile latency varies wildly
    # (500s+ on bad days); repeated/driver runs reuse compiles when the
    # backend supports it
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mnt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    size_env = os.environ.get("BENCH_GRID", "128,128,128")
    nx, ny, nz = (int(s) for s in size_env.split(","))
    # 600 steps: compile time dominates the probe; short runs
    # bias 20-30% low (tunnel dispatch amortization)
    steps = int(os.environ.get("BENCH_STEPS", "600"))

    import meep_nl_tpu as mnt
    from meep_nl_tpu.core import grid as G
    from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                          compile_plan)
    from meep_nl_tpu.stepper.step import init_state, make_step, build_xs

    res = 16.0
    # sites-aligned grid: nx-1 cells -> nx SITES per axis, so the arrays hit
    # the TPU's (8, 128) tile layout exactly (an nx-site array would pad
    # nx..next-multiple-of-128 lanes in HBM: 257 sites costs 384 lanes of
    # traffic, a free 1.5x loss).  The metric counts the true cells.
    cx, cy, cz = nx - 1, ny - 1, nz - 1
    gv = G.GridVolume.create("3d", [cx / res, cy / res, cz / res], res)
    mat_mode = bool(os.environ.get("BENCH_MAT"))
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    # material mode: source off-center, outside the NL ball (+1 stencil)
    src_x = (cx / res) * 0.35 if mat_mode else 0.0
    pts = gv.interp_weights("ez", [src_x, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    # periodic mode: Bloch-periodic x (the grating class), PML y/z only;
    # "1" = k_x = 0 (real wrap), "k" = oblique k_x (complex phase, the
    # real-pair channel-pair kernel)
    per_mode = os.environ.get("BENCH_PERIODIC")
    if per_mode:
        pmls = [PMLSpec(d, 1.0) for d in ("y", "z")]
    else:
        pmls = [] if os.environ.get("BENCH_NOPML") else \
            [PMLSpec(d, 1.0) for d in ("x", "y", "z")]
    if mat_mode:
        # the fork's flagship material class: eps=4 ball with a Lorentz
        # pole + chi2-NR region (BASELINE configs 3-5 physics), sized like
        # __graft_entry__._flagship_plan but at bench scale
        from meep_nl_tpu.stepper.plan import PolSpec
        shape = gv.shape
        size = [cx / res, cy / res, cz / res]
        xs_c, ys_c, zs_c = [gv.comp_coords("ez", ax) for ax in range(3)]
        ctr = [0.5 * (c[0] + c[-1]) for c in (xs_c, ys_c, zs_c)]
        XX, YY, ZZ = np.meshgrid(xs_c - ctr[0], ys_c - ctr[1], zs_c - ctr[2],
                                 indexing="ij")
        ball = XX ** 2 + YY ** 2 + ZZ ** 2 < (min(size) / 4) ** 2
        eps = np.ones(shape)
        eps[ball] = 4.0
        chi1inv = {c: {c[1]: 1.0 / eps} for c in ("ex", "ey", "ez")}
        pol = PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                      sigma={(c, c[1]): 0.2 * ball.astype(np.float64)
                             for c in ("ex", "ey", "ez")})
        nr = {}
        if os.environ.get("BENCH_MAT") != "pol":   # "pol" = ADE only
            c2 = np.zeros(shape)
            c2[ball] = 0.05
            nr = {c: c2 for c in ("ex", "ey", "ez")}
        mat = MaterialSpec(chi1inv=chi1inv, pols=[pol], nr_chi2=nr)
    else:
        mat = MaterialSpec(chi1inv={})
    per_kw = {}
    if per_mode:
        per_kw = dict(periodic=(True, False, False),
                      bloch_k=((0.23 / (cx / res), 0.0, 0.0)
                               if per_mode == "k" else (0.0, 0.0, 0.0)))
    plan = compile_plan(gv, mat, pmls=pmls, sources=[src],
                        pad_to_multiple=(8, 8, 128), **per_kw)
    if per_mode == "k":
        plan.real_pair = True
    if os.environ.get("BENCH_PALLAS"):
        plan.use_pallas = True
    if os.environ.get("BENCH_SLAB"):
        plan.slab_store = True

    # fused Pallas kernels: the 2-step temporally-fused kernel
    # (ops/pallas/fdtd3d_t2.py) is the production path for this envelope
    # (half the HBM bytes/cell/step); BENCH_T1=1 forces the 1-step kernel,
    # BENCH_JNP=1 the jnp stepper
    from meep_nl_tpu.ops.pallas import fdtd3d, fdtd3d_t2
    bx_env = os.environ.get("BENCH_BX")
    bxv = int(bx_env) if bx_env else None
    plain = (not os.environ.get("BENCH_JNP")
             and not os.environ.get("BENCH_PALLAS")
             and not os.environ.get("BENCH_SLAB"))
    # default: deepest supported temporal fusion (depth 3 measured 15.5
    # GCells/s at 255^3 vs 11.7 at depth 2; needs bx=2 for VMEM)
    depth_env = os.environ.get("MNT_T2_DEPTH")
    if depth_env:
        depth = int(depth_env)
    else:
        # let _pick_bx choose the block depth per schedule: vacuum
        # 255^3 lands at bx=2 (VMEM), dispersive windows require bx=8
        # (sub-sublane disp blocks FailedPrecondition on this backend)
        depth = 3
        if not fdtd3d_t2.supported(plan, bxv, depth=3):
            depth = 2
    steps -= steps % depth
    use_t2 = (plain and not os.environ.get("BENCH_T1")
              and steps % depth == 0
              and fdtd3d_t2.supported(plan, bxv, depth=depth))
    use_fdtd3d = plain and not use_t2 and fdtd3d.supported(plan, bxv)
    pair = 1
    if per_mode and plain:
        from meep_nl_tpu.ops.pallas import periodicx
        if per_mode == "k":
            try:
                ker = periodicx.PairPeriodicGhostT2Kernel(plan, bx=bxv)
                step0 = ker.make_fused_step()
                pair = ker.depth
            except ValueError:
                ker = periodicx.PairPeriodicXKernel(plan, bx=bxv)
                step0 = ker.make_step()
        else:
            # ghost-ring driver: plain fused kernel on the Bloch-wrapped
            # extended grid (round 5) — no wrap-strip recompute
            try:
                ker = periodicx.PeriodicGhostT2Kernel(plan, bx=bxv)
                step0 = ker.make_fused_step()
                pair = ker.depth
            except ValueError:
                ker = periodicx.PeriodicXKernel(plan, bx=bxv)
                step0 = ker.make_step()
        use_t2 = use_fdtd3d = False
        unroll = 2
        # the ghost-ring kernel may run a deeper schedule than the
        # aperiodic pick that trimmed `steps` above
        steps -= steps % pair
    elif use_t2:
        ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx=bxv, depth=depth)
        step0 = ker.make_fused_step()
        pair = ker.depth
        unroll = 2
    elif use_fdtd3d:
        ker = fdtd3d.Fdtd3dKernel(plan, bx=bxv)
        step0 = ker.make_step()
        unroll = 4
    else:
        ker = None
        step0 = make_step(plan)
        # unroll=4 measured +7% on the TPU (1.05 -> 1.12 GCells/s at
        # 128^3): better HBM pipelining across step boundaries
        unroll = 4

    def run_block(state, xs, C):
        def body(carry, x):
            return step0(carry, x, C), None
        state, _ = jax.lax.scan(body, state, xs, unroll=unroll)
        return state

    state = ker.init_state() if ker is not None else init_state(plan)
    xs = build_xs(plan, steps, 0)
    xs2 = build_xs(plan, steps, steps)
    if ker is not None:
        xs = {k: v for k, v in xs.items() if k in ker.xs_keys}
        xs2 = {k: v for k, v in xs2.items() if k in ker.xs_keys}
    if pair > 1:
        xs = {k: np.asarray(v).reshape((steps // pair, pair) + v.shape[1:])
              for k, v in xs.items()}
        xs2 = {k: np.asarray(v).reshape((steps // pair, pair) + v.shape[1:])
               for k, v in xs2.items()}
    # the ghost-ring periodic kernel steps against its EXTENDED plan's
    # coefficients (wrapped ghost planes baked in)
    C = getattr(ker, "ext_plan", plan).coefs if ker is not None \
        else plan.coefs

    def fence(state):
        if "re" in state:                      # pair-channel kernel state
            return float(state["re"]["dz"][1, 1, 1])
        arr = state["f"]["ez"] if "f" in state else state["dz"]
        return float(arr[1, 1, 1])

    run_c = jax.jit(run_block).lower(state, xs, C).compile()

    # warmup; a scalar d2h read is the only true fence through the tunnel
    state = run_c(state, xs, C)
    _ = fence(state)

    t0 = time.perf_counter()
    state = run_c(state, xs2, C)
    _ = fence(state)
    dt_wall = time.perf_counter() - t0

    # tunnel latency is wildly variable: re-measure (bounded — min-of-k
    # rather than budget-filling, so the suite's other probes keep their
    # slices) and keep the best (min time)
    deadline = _T_PROC + float(os.environ.get(
        "BENCH_TIMEOUT", "540")) - 30.0
    it = 0
    while it < _REMEASURE and time.perf_counter() + dt_wall * 1.3 < deadline:
        t0 = time.perf_counter()
        state = run_c(state, xs, C)
        _ = fence(state)
        dt_wall = min(dt_wall, time.perf_counter() - t0)
        it += 1

    cells = cx * cy * cz
    gcells = cells * steps / dt_wall / 1e9
    baseline = 10.0  # GCells/s north star (BASELINE.json)
    metric = ("yee_cell_updates_3d_pml_lorentz_nr_fp32" if mat_mode
              else "yee_cell_updates_3d_bloch_pair_fp32"
              if per_mode == "k"
              else "yee_cell_updates_3d_periodic_fp32" if per_mode
              else "yee_cell_updates_3d_pml_fp32")
    print(json.dumps({
        "metric": metric,
        "value": round(gcells, 3),
        "unit": "GCells/s",
        "vs_baseline": round(gcells / baseline, 3),
        "grid": [cx, cy, cz],
        "steps": steps,
        "kernel": (type(ker).__name__ if per_mode and ker is not None else
                   f"fdtd3d_t{pair}" if pair > 1 else
                   "fdtd3d" if ker is not None else "jnp"),
    }))


def _probe(grid, timeout, extra_env=None):
    """Run one measurement subprocess.  Returns (record, error_string):
    exactly one of the two is non-None."""
    if timeout < 45:
        return None, "skipped: budget exhausted"
    env = dict(os.environ, BENCH_ONE="1", BENCH_GRID=grid,
               BENCH_TIMEOUT=str(int(timeout)), **(extra_env or {}))
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, "timeout after %ds" % int(timeout)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "metric" in line:
            return json.loads(line), None
    lines = [ln for ln in (out.stderr or out.stdout or "").splitlines()
             if ln.strip()]
    # prefer the actual exception line over JAX's traceback-filtering note
    msg = next((ln for ln in reversed(lines)
                if "Error" in ln or "error" in ln), lines[-1] if lines
               else "no output")
    return None, "rc=%d %s" % (out.returncode, msg.strip()[:200])


def main():
    """Driver entry.  BENCH_TIMEOUT is the TOTAL wall-clock budget for the
    whole suite (default 540s); individual probes get slices of the
    remainder and are skipped when it runs out.  A merged JSON line is
    re-printed after EVERY probe — the driver keeps the tail, so the last
    complete line always carries everything measured so far even if the
    process is killed mid-suite (the round-3 failure mode: one line at the
    very end of ~16 sequential probes, rc=124, nothing recorded).

    Probe order = importance x cheapness: the vacuum headline first,
    then the kernel-direct probes (one compile each, ~2-4 min through
    the tunnel), and the monitored public-API probes LAST — they
    compile 3-4 kernel variants (~6-8 min each) and must not starve
    everything behind them when the budget is small."""
    if os.environ.get("BENCH_ONE"):
        run_one()
        return
    total = float(os.environ.get("BENCH_TIMEOUT", "540"))
    t0 = time.perf_counter()

    def left():
        return total - (time.perf_counter() - t0)

    rec = {"metric": "yee_cell_updates_3d_pml_fp32", "value": 0.0,
           "unit": "GCells/s", "vs_baseline": 0.0}

    def emit():
        print(json.dumps(rec), flush=True)

    def sub(key, grid, cap, extra_env):
        """One merged sub-probe: record value_* or *_error, then emit."""
        r, err = _probe(grid, min(left() - 10, cap), extra_env)
        if r is not None:
            rec[key + "_value"] = r["value"]
            rec[key + "_grid"] = r["grid"]
            if "kernel" in r:
                rec[key + "_kernel"] = r["kernel"]
            rec.pop(key + "_error", None)
        else:
            rec[key + "_error"] = err
        emit()
        return r is not None

    # probe queue: (key, grid, per-probe cap seconds, env, depth-ladder)
    mgrid = os.environ.get("BENCH_MAT_GRID", "128,128,128")
    pgrid = os.environ.get("BENCH_PER_GRID", "128,128,128")
    mon = os.environ.get("BENCH_MON_GRID", "128,128,128")
    queue = []
    if not os.environ.get("BENCH_SKIP_MAT"):
        queue.append(("material", mgrid, 300, {"BENCH_MAT": "1"}, True))
        queue.append(("lorentz", mgrid, 240, {"BENCH_MAT": "pol"}, True))
        big = os.environ.get("BENCH_MAT_BIG",
                             "224,224,224;192,192,192").split(";")
        queue.append(("material_big", big, 320, {"BENCH_MAT": "1"},
                      False))
    if not os.environ.get("BENCH_SKIP_PER"):
        queue.append(("periodic", pgrid, 320, {"BENCH_PERIODIC": "1"},
                      False))
        queue.append(("bloch_pair", pgrid, 240, {"BENCH_PERIODIC": "k"},
                      False))
    if not os.environ.get("BENCH_SKIP_RESIDENT"):
        rl = os.environ.get("BENCH_RESIDENT_LADDER",
                            "768,768;512,512").split(";")
        queue.append(("resident2d", rl, 240, {"BENCH_RESIDENT": "1"},
                      False))
    if not os.environ.get("BENCH_SKIP_MONITORED"):
        queue.append(("monitored", mon, 460, {"BENCH_MONITORED": "1"},
                      False))
        queue.append(("monitored_nl", mon, 600,
                      {"BENCH_MONITORED": "nl"}, False))

    # ---- 1. vacuum ladder (the headline metric) ---------------------
    ladder = os.environ.get(
        "BENCH_LADDER",
        "256,256,256;192,192,192;128,128,128;96,96,96;64,64,64").split(";")
    for i, grid in enumerate(ladder):
        # proportional reserve: the headline gets up to ~a third of
        # whatever budget exists (never starved by the queue reserve,
        # never starving the queue).  First-compile latency through the
        # tunnel is wildly variable (~2-6 min at 255^3) — the first
        # attempt needs the fat cap.
        cap = min(420 if i == 0 else 200, max(90.0, left() * 0.3))
        r, err = _probe(grid, cap)
        if r is not None:
            rec.update(r)
            break
        rec["error"] = "vacuum@%s: %s" % (grid, err)
        if left() < 120 * len(queue):
            break
    emit()

    # ---- 2..n: the probe queue with weighted slices ------------------
    for qi, (key, grids, cap, env, depth_ladder) in enumerate(queue):
        n_left = len(queue) - qi
        slc = min(cap, max(140.0, (left() - 20) / n_left))
        t_end = time.perf_counter() + slc
        glist = grids if isinstance(grids, list) else [grids]
        done = False
        if depth_ladder:
            # deepest schedule first; dispatch-class failures fail fast
            for mdepth in (None, "2", "1"):
                if t_end - time.perf_counter() < 45:
                    break       # keep the informative timeout error
                e = dict(env)
                if mdepth:
                    e["MNT_T2_DEPTH"] = mdepth
                if sub(key, glist[0], t_end - time.perf_counter(), e):
                    done = True
                    break
        else:
            for g in glist:
                if t_end - time.perf_counter() < 45:
                    break
                if sub(key, g, t_end - time.perf_counter(), env):
                    done = True
                    break
        del done
    emit()


if __name__ == "__main__":
    main()
