"""Bisect the depth-3 on-chip FailedPrecondition (round-3 end).

RESOLVED (round 4): prefix-running the call chain isolated the fault to
the hi-edge call, and entry-ablation inside it to the per-stage `coef2`
block-indexed BlockSpec entries of the full-grid u operand — two
block-indexed entries of the SAME operand at sub-sublane bx kill the
Mosaic dispatch.  Fixed by the cfa one-iteration scratch cache
(fdtd3d_t2.py): stage 2 reads u from what stage 1 loaded the previous
iteration, relayed across calls through the package.  bx<8 depth-3
dispersive now runs clean; the bx>=8 guard is gone.

Round-3 findings (historical): 64^3, bx=2, flagship geometry failed for
pure-ADE, NR-only, and both; CASE_DISP3 at bx=8 passed — the knob walk
below found bx to be the trigger.  Each case runs in its own subprocess
(FailedPrecondition poisons the device for the process)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CASE = r"""
import numpy as np, sys, time, json
spec = json.loads(sys.argv[1])
import meep_nl_tpu as mnt
from meep_nl_tpu.core import grid as G
from meep_nl_tpu.stepper.plan import (MaterialSpec, PMLSpec, PolSpec,
                                      SrcVolSpec, compile_plan)
from meep_nl_tpu.ops.pallas import fdtd3d_t2

res = 16.0
cells = tuple(spec.get("cells", [64, 64, 64]))
size = [n / res for n in cells]
gv = G.GridVolume.create("3d", size, res)
shape = gv.shape
x, y, z = [gv.comp_coords("ez", ax) for ax in range(3)]
cx, cy, cz = [0.5 * (c[0] + c[-1]) for c in (x, y, z)]
XX, YY, ZZ = np.meshgrid(x - cx, y - cy, z - cz, indexing="ij")
ball = XX ** 2 + YY ** 2 + ZZ ** 2 < (min(size) / spec.get("ballden", 6)) ** 2
eps = np.ones(shape)
eps[ball] = 4.0
chi1inv = {c: {c[1]: 1.0 / eps} for c in ("ex", "ey", "ez")}
pols = [PolSpec(field_type="e", omega0=2.0, gamma=0.05,
                sigma={(c, c[1]): 0.3 * ball.astype(np.float64)
                       for c in ("ex", "ey", "ez")})]
mat = MaterialSpec(chi1inv=chi1inv, pols=pols)
src_t = mnt.GaussianSource(frequency=1.0, fwidth=0.5)
pts = gv.interp_weights("ez", [size[0] * 0.3, 0.0, 0.0])
idx = np.array([p for p, w in pts], np.int32)
amps = np.array([w for p, w in pts], np.complex128)
src = SrcVolSpec("ez", idx, amps, src_t)
pmls = [PMLSpec(d, spec.get("pml", 0.5)) for d in "xyz"]
plan = compile_plan(gv, mat, pmls=pmls, sources=[src],
                    pad_to_multiple=tuple(spec.get("pad", [8, 1, 1])))
plan.slab_opt = True
bx = spec.get("bx", 2)
if not fdtd3d_t2.supported(plan, bx, depth=spec.get("depth", 3)):
    print("UNSUPPORTED"); raise SystemExit(0)
depth = spec.get("depth", 3)
ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, bx=bx, depth=depth)
st = ker.init_state()
t0 = time.perf_counter()
st = ker.run(st, 6)
v = float(np.asarray(ker.to_full(st)["f"]["ez"][1, 1, 1]))
print("OK", v, round(time.perf_counter() - t0, 1))
"""


def run(tag, spec, timeout=900):
    import json as J
    try:
        out = subprocess.run(
            [sys.executable, "-c", CASE, J.dumps(spec)],
            capture_output=True, text=True, timeout=timeout, cwd=REPO)
        tail = (out.stdout.strip().splitlines() or [""])[-1]
        err = (out.stderr.strip().splitlines() or [""])[-1][:120]
        print(f"{tag}: rc={out.returncode} {tail}"
              + ("" if out.returncode == 0 else f" | {err}"), flush=True)
    except subprocess.TimeoutExpired:
        print(f"{tag}: TIMEOUT", flush=True)


if __name__ == "__main__":
    if os.environ.get("PROBE_D2"):
        # depth-2 disp at sub-sublane bx: the production hybrid picks
        # bx=2 for 255^3-class disp plans, never yet proven on-chip
        run("d2-disp64-bx2", {"bx": 2, "depth": 2}, timeout=1200)
        run("d2-disp64-bx4", {"bx": 4, "depth": 2}, timeout=1200)
    elif os.environ.get("PROBE_BX"):
        # round-2 of the knob walk: bx is the suspect (bench forces
        # bx=2 at depth 3; CASE_DISP3's default at 128^3 was bx=8);
        # result: base64 (bx=2) FAILED, so every knob in round 1 was
        # irrelevant — the geometry itself fails at bx=2
        run("disp64-bx4", {"bx": 4})
        run("disp64-bx8", {"bx": 8})
        run("disp128-bx2", {"cells": [128, 128, 128], "bx": 2})
    else:
        run("base64", {})                      # passing geometry @64^3
        run("pad-z", {"pad": [8, 8, 128]})     # bench/flagship padding
        run("pml1.0", {"pml": 1.0})            # thick PML
        run("ball4", {"ballden": 4})           # bigger disp window
