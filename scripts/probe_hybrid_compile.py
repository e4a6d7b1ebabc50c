"""Bisect the remote-compile HTTP 500 on the new hybrid runner: build
the same scan-of-(fused steps + to_full + dft-update) program in
variants and see which feature kills the tunnel's compile helper.
One variant per subprocess (compile-helper crashes can wedge state)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = ["full", "nodft", "nofull", "jstep"]


def run_variant(name):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/mnt_jax_cache")
    import meep_nl_tpu as mnt
    from meep_nl_tpu.stepper.step import (build_xs, init_state, make_step,
                                          _dft_update)
    from meep_nl_tpu.ops.pallas import fdtd3d_t2

    sim = mnt.Simulation(cell_size=mnt.Vector3(6, 6, 6), resolution=10,
                         boundary_layers=[mnt.PML(1.0)],
                         sources=[mnt.Source(
                             mnt.GaussianSource(frequency=1.0, fwidth=0.4),
                             component=mnt.Ez,
                             center=mnt.Vector3(-1.8, 0, 0))],
                         eps_averaging=False, use_fused=False)
    fr = sim.add_flux(1.0, 0.3, 5, mnt.FluxRegion(
        center=mnt.Vector3(1.8, 0, 0), size=mnt.Vector3(0, 4, 4)))
    sim.init_sim()
    plan = sim._plan
    plan.slab_opt = True
    C = plan.coefs
    ker = fdtd3d_t2.Fdtd3dT2Kernel(plan, depth=2)
    d, ncyc = 4, 8
    xs_all = build_xs(plan, ncyc * d, 0)
    xs = {k: np.asarray(v).reshape((ncyc, d) + np.asarray(v).shape[1:])
          for k, v in xs_all.items()}
    step2 = ker.make_fused_step()
    jstep = make_step(plan)
    kxs = set(ker.xs_keys)
    state = init_state(plan)

    def runner(full_state, xs, C):
        comp0 = ker.from_full(full_state)

        def body(carry, xc):
            comp, dft = carry
            for j in range(d // 2):
                xp = {k: xc[k][2 * j:2 * j + 2] for k in xc if k in kxs}
                comp = step2(comp, xp, C)
            x_last = {k: xc[k][d - 1] for k in xc}
            if name == "nofull":
                pass
            elif name == "nodft":
                full = ker.to_full(comp, C)
                dft = {k: v + full["f"]["ez"][1, 1, 1] for k, v in dft.items()}
            elif name == "jstep":
                full = ker.to_full(comp, C)
                full["dft"] = dft
                full = jstep(full, x_last, C)
                dft = full["dft"]
                comp = ker.from_full(full)
            else:
                full = ker.to_full(comp, C)
                dft = _dft_update(plan, C, {"f": full["f"], "dft": dft},
                                  x_last)["dft"]
            return (comp, dft), None

        (comp, dft), _ = jax.lax.scan(body, (comp0, full_state["dft"]),
                                      xs, length=ncyc)
        full = ker.to_full(comp, C)
        full["dft"] = dft
        return full

    t0 = time.time()
    try:
        out = jax.jit(runner)(state, xs, C)
        v = float(out["f"]["ez"][1, 1, 1])
        print(f"[{name}] PASS ez111={v:.3e} ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"[{name}] FAIL {type(e).__name__}: "
              f"{str(e)[:140]} ({time.time()-t0:.0f}s)", flush=True)


def main():
    if os.environ.get("PROBE_VARIANT"):
        run_variant(os.environ["PROBE_VARIANT"])
        return
    import subprocess
    only = os.environ.get("PROBE_ONLY")
    for v in VARIANTS:
        if only and only not in v:
            continue
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=dict(os.environ, PROBE_VARIANT=v))


if __name__ == "__main__":
    main()
