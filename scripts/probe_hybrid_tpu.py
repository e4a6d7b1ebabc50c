"""On-chip end-to-end check of the hybrid monitored run path: a small
PML-bounded sim with a flux monitor, run once through the jnp stepper
and once through the hybrid (fused stretches + DFT-only sample reads),
comparing final fields and DTFT flux.  Loud on fallback."""

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(use_fused):
    import meep_nl_tpu as mp
    fcen = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(4.0, 2.0, 2.0), resolution=10,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.4),
                           component=mp.Ez, center=mp.Vector3(-1.2, 0, 0))],
        boundary_layers=[mp.PML(0.5)],
        use_fused=use_fused)
    flux = sim.add_flux(fcen, 0.2, 3,
                        mp.FluxRegion(center=mp.Vector3(1.2, 0, 0),
                                      size=mp.Vector3(0, 1.0, 1.0)))
    t0 = time.time()
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        sim.run(until=8.0)
    for w in wlist:
        print(f"  WARN[{use_fused}]: {w.message}", flush=True)
    dt_run = time.time() - t0
    return (np.asarray(sim.get_fluxes(flux)),
            np.asarray(sim.get_array(mp.Ez)), dt_run)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/mnt_jax_cache")
    print(f"devices: {jax.devices()}", flush=True)
    fj, ezj, tj = run(False)
    print(f"jnp   : flux={fj} t={tj:.1f}s", flush=True)
    fh, ezh, th = run(True)
    print(f"hybrid: flux={fh} t={th:.1f}s", flush=True)
    scale = np.abs(ezj).max()
    derr = np.abs(ezh - ezj).max() / scale
    ferr = np.abs(fh - fj).max() / np.abs(fj).max()
    print(f"ez rel err {derr:.2e}  flux rel err {ferr:.2e}", flush=True)
    ok = derr < 5e-5 and ferr < 1e-3
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
