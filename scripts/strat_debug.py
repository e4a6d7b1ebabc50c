"""Debug per-branch conservation of Bloch orders in a stratified medium."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import meep_nl_tpu as mp
from meep_nl_tpu.stepper.step import dft_view

fcen = 1.5
sim = mp.Simulation(
    cell_size=mp.Vector3(8, 1), resolution=20,
    k_point=mp.Vector3(),
    geometry=[mp.Block(center=mp.Vector3(0, 0.3),
                       size=mp.Vector3(mp.inf, 0.4, mp.inf),
                       material=mp.Medium(epsilon=4))],
    sources=[mp.Source(mp.GaussianSource(frequency=fcen, fwidth=0.3),
                       component=mp.Ez, center=mp.Vector3(-2.5, 0),
                       size=mp.Vector3(0, 1))],
    boundary_layers=[mp.PML(1.0, direction=mp.X)])
fr1 = mp.FluxRegion(center=mp.Vector3(1.5, 0), size=mp.Vector3(0, 1))
fr2 = mp.FluxRegion(center=mp.Vector3(3.0, 0), size=mp.Vector3(0, 1))
fl1 = sim.add_flux(fcen, 0, 1, fr1)
fl2 = sim.add_flux(fcen, 0, 1, fr2)
sim.run(until_after_sources=200)

# raw DFT lines (ez + hy) at the two planes
for fl in (fl1, fl2):
    print(fl.name, [k for k in sim._state["dft"] if k.startswith(fl.name)])

def get_line(fl, comp):
    for mi, m in enumerate(sim._plan.dfts):
        if m.name.startswith(fl.name) and m.component == comp:
            return np.asarray(dft_view(np.asarray(sim._state["dft"][m.name])))[..., 0], m
    return None, None

P1 = np.asarray(sim.get_fluxes(fl1))
P2 = np.asarray(sim.get_fluxes(fl2))
print("fluxes:", P1, P2)

# discrete Bloch eigenbasis on the monitor line
from meep_nl_tpu.analysis.modes import bloch_planewave_mode_tm
gv = sim._plan.gv
dx = gv.dx
w = 2 * np.pi * fcen
dt = sim.dt
wt2 = (2 / dt * np.sin(w * dt / 2)) ** 2

ez1, m1 = get_line(fl1, "ez")
ez2, m2 = get_line(fl2, "ez")
print("line shapes:", ez1.shape, ez2.shape, m1.region, "centered:", m1.centered)

# epsilon on the line (same x-uniform medium) - sample from sim
eps_grid = sim.get_epsilon()
print("eps grid shape", eps_grid.shape)
ix1 = (m1.region[0][0] + m1.region[0][1] - 1) // 2
eps_line = eps_grid[min(ix1, eps_grid.shape[0]-1), m1.region[1][0]:m1.region[1][1]]
n = len(eps_line)
print("eps line:", np.unique(np.round(eps_line,3)), "n =", n)

B = np.zeros((n, n))
i = np.arange(n)
B[i, i] = wt2 * eps_line - 2.0 / dx ** 2
B[i[:-1], i[:-1] + 1] = 1.0 / dx ** 2
B[i[1:], i[1:] - 1] = 1.0 / dx ** 2
B[n - 1, 0] += 1.0 / dx ** 2
B[0, n - 1] += 1.0 / dx ** 2
vals, vecs = np.linalg.eigh(B)
prop = vals > 1e-9
print("propagating branches:", np.sum(prop), "lam:", vals[prop])
betas = np.sqrt(np.maximum(vals, 0))
print("betas:", betas[prop])

# project each plane's ez line onto the eigenbasis; per-branch power
def branch_powers(ez):
    ez = ez.ravel()[:n]
    c = vecs.T @ ez * dx  # not normalized; relative comparison only
    pw = (betas / w) * np.abs(vecs.T @ ez) ** 2
    return pw

pw1 = branch_powers(ez1)
pw2 = branch_powers(ez2)
idx = np.where(prop)[0]
print("branch |c|^2*beta/w at plane1:", pw1[idx])
print("branch |c|^2*beta/w at plane2:", pw2[idx])
print("ratios:", pw2[idx] / np.maximum(pw1[idx], 1e-300))
# eigenvector harmonics content
ys = np.arange(n) * dx
for j in idx:
    t0 = np.abs(np.sum(vecs[:, j]))**2
    tp = np.abs(np.sum(vecs[:, j] * np.exp(-2j*np.pi*ys)))**2
    tm = np.abs(np.sum(vecs[:, j] * np.exp(+2j*np.pi*ys)))**2
    print(f"branch {j}: lam={vals[j]:.3f} beta={betas[j]:.3f} "
          f"harm(|g0|,|g+1|,|g-1|)/n = {t0/n:.3f} {tp/n:.3f} {tm/n:.3f}")
