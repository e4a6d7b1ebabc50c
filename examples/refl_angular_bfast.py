"""Broadband oblique-incidence reflectance with BFAST (the fork's
headline feature; reference python/examples/refl_angular_bfast.ipynb):
ONE run gives R(f) at a FIXED 30-degree angle for every frequency,
compared against the p-polarization Fresnel formula."""

import numpy as np
import meep_nl_tpu as mp

S = 0.5                    # sin(30 deg)
N2 = 1.5
FCEN, DF, NF = 1.0, 0.5, 5
COURANT = (1 - S) / np.sqrt(3)   # BFAST-reduced CFL


def build(interface: bool):
    geom = [mp.Block(center=mp.Vector3(0, 0, 2.5),
                     size=mp.Vector3(mp.inf, mp.inf, 5.0),
                     material=mp.Medium(epsilon=N2 ** 2))] if interface \
        else []
    sim = mp.Simulation(
        cell_size=mp.Vector3(0.1, 0.1, 10), resolution=20,
        Courant=COURANT, geometry=geom,
        sources=[mp.Source(mp.GaussianSource(frequency=FCEN, fwidth=DF),
                           component=mp.Ex, center=mp.Vector3(0, 0, -3.0),
                           size=mp.Vector3(0.1, 0.1, 0))],
        boundary_layers=[mp.PML(1.0, direction=mp.Z)],
        k_point=mp.Vector3(0, 0, 0),
        bfast_scaled_k=mp.Vector3(S, 0, 0),
        eps_averaging=False)
    refl = sim.add_flux(FCEN, DF, NF, mp.FluxRegion(
        center=mp.Vector3(0, 0, -2.0), size=mp.Vector3(0.1, 0.1, 0)))
    return sim, refl


def fresnel_p(f):
    w = 2 * np.pi * f
    kz1 = np.sqrt(w ** 2 - (S * w) ** 2)
    kz2 = np.sqrt((N2 * w) ** 2 - (S * w) ** 2)
    rp = (N2 ** 2 * kz1 - kz2) / (N2 ** 2 * kz1 + kz2)
    return abs(rp) ** 2


def main():
    sim0, refl0 = build(False)
    sim0.run(until=60)
    inc = np.array(sim0.get_fluxes(refl0))
    data = sim0.get_flux_data(refl0)

    sim1, refl1 = build(True)
    sim1.load_minus_flux_data(refl1, data)
    sim1.run(until=100)
    R = -np.array(sim1.get_fluxes(refl1)) / inc

    print(" f      R_meas  R_fresnel(30deg, p-pol)")
    for i, f in enumerate(np.linspace(FCEN - DF / 2, FCEN + DF / 2, NF)):
        print(f"{f:.3f}  {R[i]:7.4f}  {fresnel_p(f):7.4f}")
    return R


if __name__ == "__main__":
    main()
