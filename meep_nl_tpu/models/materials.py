"""Material library: the full set of fitted optical media the reference
ships (python/materials.py, 56 entries), built from the numeric
Drude-Lorentz tables in `_materials_data` (published literature fits:
Rakic et al. APL 1998 metals, Horiba DUV handbook, Sellmeier handbook
dielectrics, Johnson & Christy visible metals).

Units: meep frequency 1/um at a = 1 um (f = 1/lambda[um]).  Anisotropic
entries (SiO2_aniso, AlN_aniso, Al2O3_aniso, BaB2O4, CaCO3, CaWO4,
LiNbO3, Y2O3, YAG ordinary/extraordinary splits) carry epsilon_diag and
per-pole sigma_diag.
"""

from __future__ import annotations

from .geom import (DrudeSusceptibility, LorentzianSusceptibility, Medium,
                   Vector3)
from ._materials_data import TABLE

# conversion: energies in eV to meep frequency units (1/um):
# f[1/um] = E[eV] / (h c / e / 1 um) = E / 1.23984193
_EV = 1.0 / 1.23984193


def _build(entry) -> Medium:
    sus = []
    for p in entry["poles"]:
        kw = dict(frequency=p["f"], gamma=p["g"])
        if "sd" in p:
            kw["sigma_diag"] = Vector3(*p["sd"])
            kw["sigma"] = max(p["sd"])
        else:
            kw["sigma"] = p["s"]
        cls = DrudeSusceptibility if p.get("drude") else \
            LorentzianSusceptibility
        sus.append(cls(**kw))
    if entry.get("eps_diag") is not None:
        return Medium(epsilon_diag=Vector3(*entry["eps_diag"]),
                      E_susceptibilities=sus)
    return Medium(epsilon=entry["eps"], E_susceptibilities=sus)


_library = {name: _build(entry) for name, entry in TABLE.items()}
globals().update(_library)

#: every library medium by name (materials.py parity inventory)
MATERIAL_LIBRARY = dict(_library)

__all__ = sorted(_library) + ["MATERIAL_LIBRARY", "epsilon_of"]


def epsilon_of(medium: Medium, freq: float) -> complex:
    """Evaluate the model epsilon(f) (for tests/validation); anisotropic
    media return the first diagonal entry."""
    eps = complex(medium.epsilon if medium.epsilon_diag is None
                  else medium.eps_diag_vec().x)
    for s in medium.E_susceptibilities:
        sig = s.sigma if s.sigma_diag is None else s.sigma_vec().x
        if s.drude:
            eps += -sig * s.frequency ** 2 / (freq ** 2 + 1j * freq * s.gamma)
        else:
            eps += sig * s.frequency ** 2 / (
                s.frequency ** 2 - freq ** 2 - 1j * freq * s.gamma)
    return eps
