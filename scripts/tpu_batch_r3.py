"""End-of-round-3 TPU measurement batch (run when the tunnel is alive).

Each case runs in its own subprocess (a FailedPrecondition poisons the
process; see probe_depth3.py).  Results append to /tmp/tpu_batch_r3.json.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = "/tmp/tpu_batch_r3.json"


def record(name, payload):
    with open(OUT, "a") as f:
        f.write(json.dumps({"case": name, **payload}) + "\n")
    print(name, "->", payload, flush=True)


def sub(code, timeout=560, env=None):
    e = dict(os.environ, **(env or {}))
    try:
        out = subprocess.run([sys.executable, "-c", code], env=e,
                             capture_output=True, text=True,
                             timeout=timeout, cwd=REPO)
        return out.returncode, out.stdout[-3000:], out.stderr[-2000:]
    except subprocess.TimeoutExpired:
        return -1, "", "timeout"


CASE_DISP3 = r"""
import numpy as np, sys, time
sys.path.insert(0, "tests")
from test_fdtd3d_disp import _plan as _dplan
from meep_nl_tpu.ops.pallas import fdtd3d_t2
from meep_nl_tpu.stepper.step import init_state, run
plan = _dplan(with_pol=True, res=16.0, cells=(128, 128, 128))
assert fdtd3d_t2.supported(plan, depth=3), "depth3 unsupported"
ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, depth=3)
st = ker.init_state()
# warm at the MEASURED step count: ker.run jits a scan of length
# nsteps//depth, so a different warm length would leave the measured
# call compile-dominated (the round-3 batch hit exactly that)
st = ker.run(st, 201)
_ = float(np.asarray(ker.to_full(st)["f"]["ez"][1, 1, 1]))
st = ker.init_state()
t0 = time.perf_counter()
st = ker.run(st, 201)
_ = float(np.asarray(ker.to_full(st)["f"]["ez"][1, 1, 1]))
dt = time.perf_counter() - t0
cells = 127 ** 3
print("GCELLS", cells * 201 / dt / 1e9)
# correctness at small scale vs jnp
plan2 = _dplan(with_pol=True)
k2 = fdtd3d_t2.Fdtd3dT2Kernel(plan2, depth=3)
sk = k2.run(k2.init_state(), 21)
fk = k2.to_full(sk)
sj = run(plan2, init_state(plan2), 21)
scale = max(float(np.max(np.abs(np.asarray(v)))) for v in sj["f"].values())
err = max(float(np.max(np.abs(np.asarray(fk["f"][c]) - np.asarray(sj["f"][c]))))
          for c in sj["f"]) / scale
print("ERR", err)
"""

CASE_ROT4 = r"""
import numpy as np, time
import meep_nl_tpu as mnt

def mk(sym):
    a, b = 1.23, 0.71
    pts = [(a, b), (-b, a), (-a, -b), (b, -a)]
    srcs = [mnt.Source(mnt.GaussianSource(frequency=1.0, fwidth=0.5),
                       component=mnt.Ez, center=mnt.Vector3(*p))
            for p in (pts[:1] if sym else pts)]
    return mnt.Simulation(cell_size=mnt.Vector3(40, 40, 0), resolution=16,
                          boundary_layers=[mnt.PML(1.0)], sources=srcs,
                          symmetries=[mnt.Rotate4("z")] if sym else [],
                          eps_averaging=False, use_fused=False)

for tag, sym in (("full", False), ("quarter", True)):
    sim = mk(sym)
    sim.run(until=2.0)          # compile + settle
    t0 = time.perf_counter()
    sim.run(until=20.0)
    dt = time.perf_counter() - t0
    print(tag.upper(), dt)
"""


CASE_COND = r"""
import numpy as np, sys
sys.path.insert(0, "tests")
from test_cond_fold import _plan_cond, _plan_lorentz_cond
from meep_nl_tpu.ops.pallas import fdtd3d, fdtd3d_t2
from meep_nl_tpu.ops.pallas.condfold import fold_conductivity
from meep_nl_tpu.stepper.step import init_state, run
for tag, plan in (("cond", _plan_cond(res=16.0, cells=(64, 48, 48))),
                  ("lor+cond", _plan_lorentz_cond(res=16.0,
                                                  cells=(64, 48, 48)))):
    fold = fold_conductivity(plan)
    assert fold is not None, tag
    plan.slab_opt = True
    sj = run(plan, init_state(plan), 30)
    scale = max(float(np.max(np.abs(np.asarray(v)))) for v in sj["f"].values())
    for kname, ok, mk in (("k1", fdtd3d.supported(fold),
                           lambda: fdtd3d.Fdtd3dKernel(fold)),
                          ("t2", fdtd3d_t2.supported(fold, depth=2),
                           lambda: fdtd3d_t2.Fdtd3dT2Kernel(fold, depth=2))):
        if not ok:
            print(tag, kname, "UNSUPPORTED"); continue
        ker = mk()
        fk = ker.to_full(ker.run(ker.init_state(), 30))
        err = max(float(np.max(np.abs(np.asarray(fk["f"][c])
                                      - np.asarray(sj["f"][c]))))
                  for c in sj["f"]) / scale
        print(tag, kname, "ERR", err)
"""

CASE_PERX = r"""
import numpy as np, sys
sys.path.insert(0, "tests")
from test_periodic_fused import _plan_periodic
from meep_nl_tpu.ops.pallas import periodicx
from meep_nl_tpu.stepper.step import init_state, run
for tag, kx, pair in (("k0", 0.0, False), ("oblique", 0.23, True)):
    plan = _plan_periodic(kx=kx, res=16.0, cells=(63, 48, 48))
    if pair:
        plan.real_pair = True
        ker = periodicx.PairPeriodicXKernel(plan)
    else:
        ker = periodicx.PeriodicXKernel(plan)
    plan.slab_opt = True
    sj = run(plan, init_state(plan), 30)
    scale = max(float(np.max(np.abs(np.asarray(v)))) for v in sj["f"].values())
    fk = ker.to_full(ker.run(ker.init_state(), 30))
    err = max(float(np.max(np.abs(np.asarray(fk["f"][c])
                                  - np.asarray(sj["f"][c]))))
              for c in sj["f"]) / scale
    print(tag, "ERR", err)
"""


def main():
    t_all = time.time()
    # 1. bench (vacuum ladder + material + lorentz extra fields)
    rc, out, err = sub(
        "import runpy; runpy.run_path('bench.py', run_name='__main__')",
        timeout=3500)
    line = next((ln for ln in out.splitlines()
                 if ln.strip().startswith("{")), None)
    record("bench", {"rc": rc, "line": line, "err": err[-300:]})

    # 2. depth-3 dispersive on-chip (perf + exactness)
    rc, out, err = sub(CASE_DISP3, timeout=560)
    record("disp3", {"rc": rc, "out": out[-500:], "err": err[-300:]})

    # 3. rot4 on-chip speedup (jnp path quarter vs full)
    rc, out, err = sub(CASE_ROT4, timeout=560)
    record("rot4", {"rc": rc, "out": out[-400:], "err": err[-300:]})

    # 4. conductivity fold on-chip exactness (compiled Mosaic, both
    # kernels; the in-kernel full-coef slicing is the layout risk)
    rc, out, err = sub(CASE_COND, timeout=560)
    record("cond", {"rc": rc, "out": out[-500:], "err": err[-300:]})

    # 5. periodic-x + oblique-Bloch pair on-chip exactness
    rc, out, err = sub(CASE_PERX, timeout=560)
    record("perx", {"rc": rc, "out": out[-500:], "err": err[-300:]})

    print("batch done in", round(time.time() - t_all), "s")


if __name__ == "__main__":
    main()
