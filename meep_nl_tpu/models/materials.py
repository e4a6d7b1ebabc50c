"""Material library: Drude-Lorentz fits for common optical materials
(role of python/materials.py; ~30 materials in the reference).

Parameters are standard published fits (Rakic et al. 1998 for metals,
Sellmeier-derived Lorentz poles for dielectrics), expressed in meep units of
1/um (a = 1 um): frequency f = 1/lambda[um].  Valid ranges as noted.

The library is deliberately small in round 1 (the most-used entries); the
Medium/Susceptibility machinery accepts arbitrary user fits.
"""

from __future__ import annotations

import math

from .geom import (DrudeSusceptibility, LorentzianSusceptibility, Medium)

# conversion: energies in eV to meep frequency units (1/um):
# f[1/um] = E[eV] / (h c / e / 1 um) = E / 1.23984193
_EV = 1.0 / 1.23984193


def _drude(wp_ev, gam_ev, sigma=1.0):
    f = wp_ev * _EV
    return DrudeSusceptibility(frequency=f, gamma=gam_ev * _EV,
                               sigma=sigma)


def _lorentz(w_ev, gam_ev, sigma):
    return LorentzianSusceptibility(frequency=w_ev * _EV,
                                    gamma=gam_ev * _EV, sigma=sigma)


def _drude_sigma(wp_ev, f_strength, w0_ev):
    """Drude term expressed as sigma at a nominal frequency (Rakic's
    f_j wp^2 form): sigma * f^2 == f_strength * wp^2."""
    f0 = w0_ev * _EV
    wp = wp_ev * _EV
    return f_strength * wp ** 2 / f0 ** 2


# --- metals (Rakic et al., Appl. Opt. 37, 5271 (1998), LD model) ----------

def _metal(wp, f0, g0, poles):
    """Build a Medium from Rakic LD parameters: poles = [(f_j, g_j, w_j)]."""
    sus = []
    # Drude: sigma f_drude^2 = f0 wp^2; use nominal freq = wp for scaling
    drude_f = 1e-10 + wp * _EV  # avoid 0
    sus.append(DrudeSusceptibility(frequency=drude_f, gamma=g0 * _EV,
                                   sigma=f0))
    for (fj, gj, wj) in poles:
        if wj == 0:
            continue
        sus.append(LorentzianSusceptibility(
            frequency=wj * _EV, gamma=gj * _EV,
            sigma=fj * (wp / wj) ** 2))
    return Medium(epsilon=1.0, E_susceptibilities=sus)


#: Gold, 0.2-12.4 eV validity (Rakic LD)
Au = _metal(9.03, 0.760, 0.053, [
    (0.024, 0.241, 0.415), (0.010, 0.345, 0.830), (0.071, 0.870, 2.969),
    (0.601, 2.494, 4.304), (4.384, 2.214, 13.32)])

#: Silver (Rakic LD)
Ag = _metal(9.01, 0.845, 0.048, [
    (0.065, 3.886, 0.816), (0.124, 0.452, 4.481), (0.011, 0.065, 8.185),
    (0.840, 0.916, 9.083), (5.646, 2.419, 20.29)])

#: Aluminum (Rakic LD)
Al = _metal(14.98, 0.523, 0.047, [
    (0.227, 0.333, 0.162), (0.050, 0.312, 1.544), (0.166, 1.351, 1.808),
    (0.030, 3.382, 3.473)])

#: Copper (Rakic LD)
Cu = _metal(10.83, 0.575, 0.030, [
    (0.061, 0.378, 0.291), (0.104, 1.056, 2.957), (0.723, 3.213, 5.300),
    (0.638, 4.305, 11.18)])

# --- dielectrics (Sellmeier -> Lorentz poles) ------------------------------

#: fused silica (Malitson 1965 Sellmeier, valid 0.21-3.7 um)
fused_quartz = Medium(epsilon=1.0, E_susceptibilities=[
    LorentzianSusceptibility(frequency=1.0 / 0.0684043, gamma=0.0,
                             sigma=0.696166),
    LorentzianSusceptibility(frequency=1.0 / 0.1162414, gamma=0.0,
                             sigma=0.407943),
    LorentzianSusceptibility(frequency=1.0 / 9.896161, gamma=0.0,
                             sigma=0.897479),
])
SiO2 = fused_quartz

#: crystalline silicon (Lorentz fit to the near-IR Sellmeier of Salzberg &
#: Villa, valid 1.36-11 um)
cSi_nir = Medium(epsilon=1.0, E_susceptibilities=[
    LorentzianSusceptibility(frequency=1.0 / 0.301516485, gamma=0.0,
                             sigma=10.6684293),
    LorentzianSusceptibility(frequency=1.0 / 1.13475115, gamma=0.0,
                             sigma=0.0030434748),
    LorentzianSusceptibility(frequency=1.0 / 1104.0, gamma=0.0,
                             sigma=1.54133408),
])
Si = cSi_nir

#: silicon nitride (Luke et al. 2015, valid 0.31-5.5 um)
Si3N4 = Medium(epsilon=1.0, E_susceptibilities=[
    LorentzianSusceptibility(frequency=1.0 / 0.1353406, gamma=0.0,
                             sigma=3.0249),
    LorentzianSusceptibility(frequency=1.0 / 1239.842, gamma=0.0,
                             sigma=40314.0),
])

#: gallium arsenide (Skauli et al. 2003-based 3-pole fit, 0.97-17 um)
GaAs = Medium(epsilon=5.372514, E_susceptibilities=[
    LorentzianSusceptibility(frequency=1.0 / 0.4431307, gamma=0.0,
                             sigma=5.466742),
    LorentzianSusceptibility(frequency=1.0 / 0.8746453, gamma=0.0,
                             sigma=0.02429960),
    LorentzianSusceptibility(frequency=1.0 / 36.9166, gamma=0.0,
                             sigma=1.957522),
])

#: lithium niobate (o-ray, Zelmon 1997, 0.4-5 um)
LiNbO3 = Medium(epsilon=1.0, E_susceptibilities=[
    LorentzianSusceptibility(frequency=1.0 / 0.13281566, gamma=0.0,
                             sigma=2.6734),
    LorentzianSusceptibility(frequency=1.0 / 0.24318371, gamma=0.0,
                             sigma=1.2290),
    LorentzianSusceptibility(frequency=1.0 / 21.78571, gamma=0.0,
                             sigma=12.614),
])


def epsilon_of(medium: Medium, freq: float) -> complex:
    """Evaluate the model epsilon(f) (for tests/validation)."""
    eps = complex(medium.epsilon)
    for s in medium.E_susceptibilities:
        if s.drude:
            eps += -s.sigma * s.frequency ** 2 / (freq ** 2 + 1j * freq * s.gamma)
        else:
            eps += s.sigma * s.frequency ** 2 / (
                s.frequency ** 2 - freq ** 2 - 1j * freq * s.gamma)
    return eps
