"""Binary-grating diffraction efficiencies (the reference's
python/examples/binary_grating.py pattern): launch a normally-incident
planewave onto a lamellar grating in a y-periodic cell and decompose the
transmitted field into DiffractedPlanewave orders.  Energy check: the
propagating orders sum to the transmitted flux."""

import numpy as np
import meep_nl_tpu as mp

PERIOD, FCEN, DF, RES = 1.0, 1.5, 0.2, 24
ORDERS = (-2, -1, 0, 1, 2)

sim = mp.Simulation(
    cell_size=mp.Vector3(8, PERIOD), resolution=RES,
    k_point=mp.Vector3(),
    geometry=[mp.Block(center=mp.Vector3(0, 0.2),
                       size=mp.Vector3(0.5, 0.45, mp.inf),
                       material=mp.Medium(epsilon=6))],
    sources=[mp.Source(mp.GaussianSource(frequency=FCEN, fwidth=DF),
                       component=mp.Ez, center=mp.Vector3(-2.5, 0),
                       size=mp.Vector3(0, PERIOD))],
    boundary_layers=[mp.PML(1.0, direction=mp.X)])
flux = sim.add_flux(FCEN, 0, 1, mp.FluxRegion(
    center=mp.Vector3(2.5, 0), size=mp.Vector3(0, PERIOD)))
sim.run(until_after_sources=mp.stop_when_dft_decayed())

bands = [mp.DiffractedPlanewave((0, g, 0)) for g in ORDERS]
alpha = sim.get_eigenmode_coefficients(flux, bands)
P = float(sim.get_fluxes(flux)[0])
print(f"transmitted flux: {P:.5f}")
total = 0.0
for g, a in zip(ORDERS, alpha[:, 0, 0]):
    eff = abs(a) ** 2 / P
    total += abs(a) ** 2
    tag = "" if abs(a) > 1e-12 else "  (evanescent)"
    print(f"order {g:+d}: efficiency {eff:.4f}{tag}")
print(f"order sum / flux = {total / P:.4f}  (completeness check)")
