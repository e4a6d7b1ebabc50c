"""Benchmark: Yee-cell updates/sec on a 3D uPML-bounded grid at fp32.

The reference's own throughput metric is grid-point updates/sec
(tests/bench.cpp:28-54 `b.gridsteps/b.time`); BASELINE.json's north star is
>=10 GCells/s per TPU chip on a 3D PML-bounded grid at fp32.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    size_env = os.environ.get("BENCH_GRID", "256,256,256")
    nx, ny, nz = (int(s) for s in size_env.split(","))
    steps = int(os.environ.get("BENCH_STEPS", "50"))

    import meep_nl_tpu as mnt
    from meep_nl_tpu.core import grid as G
    from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                          compile_plan)
    from meep_nl_tpu.stepper.step import init_state, make_step, build_xs

    res = 16.0
    gv = G.GridVolume.create("3d", [nx / res, ny / res, nz / res], res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    pmls = [PMLSpec(d, 1.0) for d in ("x", "y", "z")]
    plan = compile_plan(gv, MaterialSpec(chi1inv={}), pmls=pmls, sources=[src],
                        pad_to_multiple=(8, 8, 128))

    step = make_step(plan)

    def run_block(state, xs, C):
        def body(carry, x):
            return step(carry, x, C), None
        state, _ = jax.lax.scan(body, state, xs)
        return state

    def fence_val(state):
        return state["f"]["ez"][1, 1, 1]

    state = init_state(plan)
    xs = build_xs(plan, steps, 0)
    xs2 = build_xs(plan, steps, steps)
    C = plan.coefs

    # The axon tunnel rejects compiles issued after transfers or while the
    # device is busy: AOT-compile every program up front, then only execute.
    run_c = jax.jit(run_block).lower(state, xs, C).compile()
    fence_c = jax.jit(fence_val).lower(state).compile()

    # warmup execution; a scalar device-to-host read is the only true fence
    # (block_until_ready does not synchronize through the tunnel)
    state = run_c(state, xs, C)
    _ = float(fence_c(state))

    t0 = time.perf_counter()
    state = run_c(state, xs2, C)
    _ = float(fence_c(state))
    dt_wall = time.perf_counter() - t0

    cells = nx * ny * nz
    gcells = cells * steps / dt_wall / 1e9
    baseline = 10.0  # GCells/s north star (BASELINE.json)
    print(json.dumps({
        "metric": "yee_cell_updates_3d_pml_fp32",
        "value": round(gcells, 3),
        "unit": "GCells/s",
        "vs_baseline": round(gcells / baseline, 3),
    }))


if __name__ == "__main__":
    main()
