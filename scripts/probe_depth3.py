"""Depth-3 FailedPrecondition triage: run the t2 kernel at depth 3 on a
small grid under a ladder of feature configurations (PML axes on/off,
bx, z_full) in ONE process, printing PASS/FAIL per config.  Round-2/3
saw FAILED_PRECONDITION at the first d2h fence for the full 3D-uPML
bench config; the minimal (2,Y,Z) aliased pallas repro passed, so the
trigger is some feature of the real kernel."""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(nx, pml_axes, bx, depth, z_full):
    import meep_nl_tpu as mnt
    from meep_nl_tpu.core import grid as G
    from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, SrcVolSpec,
                                          compile_plan)
    res = 16.0
    cx = nx - 1
    gv = G.GridVolume.create("3d", [cx / res] * 3, res)
    src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
    pts = gv.interp_weights("ez", [0.0, 0.0, 0.0])
    idx = np.array([p for p, w in pts], np.int32)
    amps = np.array([w for p, w in pts], np.complex128)
    src = SrcVolSpec("ez", idx, amps, src_t)
    side = 0
    if pml_axes.endswith("-lo"):
        side, pml_axes = -1, pml_axes[:-3]
    elif pml_axes.endswith("-hi"):
        side, pml_axes = +1, pml_axes[:-3]
    pmls = [PMLSpec(d, 1.0, side=side if d == "x" else 0)
            for d in pml_axes]
    plan = compile_plan(gv, MaterialSpec(chi1inv={}), pmls=pmls,
                        sources=[src], pad_to_multiple=(8, 8, 128))
    from meep_nl_tpu.ops.pallas import fdtd3d_t2
    if not fdtd3d_t2.supported(plan, bx, depth=depth):
        return None, None
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx=bx, depth=depth,
                                   z_full=z_full)
    return plan, ker


def try_one(label, nx, pml_axes, bx, depth, z_full=True):
    import jax
    t0 = time.time()
    try:
        plan, ker = build(nx, pml_axes, bx, depth, z_full)
        if ker is None:
            print(f"[{label}] SKIP (unsupported)", flush=True)
            return
        state = ker.init_state()
        state = ker.run(state, 2 * depth)
        v = float(state["f" if "f" in state else "dz"]["dz"][1, 1, 1]) \
            if "f" in state else float(state["dz"][1, 1, 1])
        print(f"[{label}] PASS dz111={v:.3e} ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"[{label}] FAIL {type(e).__name__}: {msg} "
              f"({time.time()-t0:.0f}s)", flush=True)


CASES = [
    ("d2-x-bx2", 64, "x", 2, 2, True),         # control at depth 2
    ("d3-x-lo-bx2", 64, "x-lo", 2, 3, True),   # lo edge call only
    ("d3-x-hi-bx2", 64, "x-hi", 2, 3, True),   # hi edge call only
    ("d3-x-bx4", 64, "x", 4, 3, True),         # both, wider blocks
    ("d3-xyz-bx2", 64, "xyz", 2, 3, True),     # full bench config
]


def main():
    # one case per SUBPROCESS: a FailedPrecondition poisons the device
    # for the remainder of the process (every later case fails in 0s),
    # so in-process ladders only ever report the first failure honestly
    if os.environ.get("PROBE_CASE"):
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/mnt_jax_cache")
        label, nx, axes, bx, depth, zf = CASES[int(os.environ["PROBE_CASE"])]
        try_one(label, int(os.environ.get("PROBE_NX", nx)), axes, bx,
                depth, zf)
        return
    import subprocess
    only = os.environ.get("PROBE_ONLY")
    for ci, (label, *_rest) in enumerate(CASES):
        if only and only not in label:
            continue
        env = dict(os.environ, PROBE_CASE=str(ci))
        subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)


if __name__ == "__main__":
    main()
