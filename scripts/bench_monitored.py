"""On-chip measurement: monitored (DFT flux) production run through the
hybrid fused driver — quantifies the plane-sampled DFT cycle (no
full-grid to_full per cycle) vs the reconstruction path.

Usage (on the TPU host):
    python scripts/bench_monitored.py [nx ny nz [steps]]
Env:
    MNT_HYBRID_PLANE_DFT=0   force the to_full reconstruction sample
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cells = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 \
        else (128, 128, 128)
    steps = int(sys.argv[4]) if len(sys.argv) >= 5 else 600
    import meep_nl_tpu as mp

    res = 16.0
    size = [n / res for n in cells]
    fcen = 1.0
    sim = mp.Simulation(
        cell_size=mp.Vector3(*size), resolution=res,
        sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.4),
                           component=mp.Ez,
                           center=mp.Vector3(-size[0] * 0.25, 0, 0))],
        boundary_layers=[mp.PML(0.5)],
        use_fused=True)
    flux = sim.add_flux(fcen, 0.2, 3,
                        mp.FluxRegion(center=mp.Vector3(size[0] * 0.25, 0, 0),
                                      size=mp.Vector3(0, size[1] * 0.4,
                                                      size[2] * 0.4)))
    dt = sim.dt
    # warm: compile the cycle runner at the measured block length
    t_warm0 = time.perf_counter()
    sim.run(until=steps * dt)
    print(f"warm block: {time.perf_counter() - t_warm0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sim.run(until=sim._t * dt + steps * dt)
    el = time.perf_counter() - t0
    ncell = np.prod([c + 1 for c in cells])
    g = ncell * steps / el / 1e9
    print({"monitored_gcells_s": round(g, 3), "grid": cells,
           "steps": steps, "elapsed_s": round(el, 2),
           "fluxes": [float(f) for f in sim.get_fluxes(flux)]})


if __name__ == "__main__":
    main()
