"""Material library gates: refractive indices / metal permittivities of the
fitted media against tabulated optics (python/materials.py parity)."""

import math

import numpy as np
import pytest

from meep_nl_tpu import materials as M


def n_of(medium, lam_um):
    eps = M.epsilon_of(medium, 1.0 / lam_um)
    return math.sqrt(max(eps.real, 0.0))


def test_library_size_and_names():
    assert len(M.MATERIAL_LIBRARY) >= 56
    for name in ["Au", "Ag", "Al", "Cu", "W", "Ti", "Ni", "Pd", "Pt", "Be",
                 "Cr", "Mo", "Co", "ITO", "SiO2", "Si", "cSi", "aSi",
                 "aSi_H", "Ge", "GaAs", "GaN", "AlAs", "AlN", "Al2O3",
                 "BK7", "fused_quartz", "Si3N4", "InP", "PMMA", "PC", "PS",
                 "CdTe", "LiNbO3", "BaB2O4", "CaCO3", "CaWO4", "Y2O3",
                 "YAG", "SiO2_aniso", "AlN_aniso", "Al2O3_aniso",
                 "Au_visible", "Ag_visible", "Al_visible", "Au_JC_visible",
                 "Al_drude", "Ti_drude", "NiCr", "NiFe", "CLS", "SiN",
                 "Si3N4_NIR", "Si3N4_VISNIR"]:
        assert name in M.MATERIAL_LIBRARY, name


@pytest.mark.parametrize("name,lam,n_expect,tol", [
    ("BK7", 0.55, 1.5185, 0.005),
    ("SiO2", 1.0, 1.45, 0.02),
    ("fused_quartz", 0.55, 1.46, 0.01),
    ("Si", 1.55, 3.48, 0.02),
    ("Ge", 4.0, 4.02, 0.03),
    ("GaAs", 1.55, 3.37, 0.05),
    ("PMMA", 0.6, 1.49, 0.01),
    ("Si3N4_NIR", 1.55, 1.99, 0.03),
])
def test_dielectric_indices(name, lam, n_expect, tol):
    n = n_of(M.MATERIAL_LIBRARY[name], lam)
    assert abs(n - n_expect) <= tol, (name, n, n_expect)


@pytest.mark.parametrize("name,lam,eps_re_lo,eps_re_hi", [
    ("Au", 1.55, -120.0, -80.0),     # Rakic LD
    ("Ag", 1.0, -55.0, -35.0),
    ("Al", 0.8, -75.0, -50.0),
    ("Cu", 1.0, -50.0, -30.0),
])
def test_metal_permittivity(name, lam, eps_re_lo, eps_re_hi):
    eps = M.epsilon_of(M.MATERIAL_LIBRARY[name], 1.0 / lam)
    assert eps_re_lo < eps.real < eps_re_hi, (name, eps)
    assert eps.imag > 0


def test_anisotropic_entries_have_diagonal():
    for name in ("SiO2_aniso", "AlN_aniso", "Al2O3_aniso", "BaB2O4",
                 "CaCO3", "CaWO4", "LiNbO3"):
        m = M.MATERIAL_LIBRARY[name]
        aniso = m.epsilon_diag is not None or any(
            s.sigma_diag is not None for s in m.E_susceptibilities)
        assert aniso, name
    # uniaxial birefringence sanity: calcite no > ne
    eo = M.epsilon_of(M.CaCO3, 1.0 / 0.59)


def test_usable_in_simulation():
    """A library medium runs through the full stepper (ADE dispersion)."""
    # resolution 40: the SiO2 fit's DUV pole (f ~ 9.7/um) needs
    # 2*pi*f_eff*dt < 2 for the leapfrog ADE (f_eff = f*sqrt(1+sigma))
    import meep_nl_tpu as mp
    sim = mp.Simulation(cell_size=mp.Vector3(0, 0, 6), resolution=40,
                        boundary_layers=[mp.PML(1.0)],
                        geometry=[mp.Block(size=mp.Vector3(mp.inf, mp.inf, 1),
                                           center=mp.Vector3(),
                                           material=M.SiO2)],
                        sources=[mp.Source(
                            mp.GaussianSource(frequency=0.65, fwidth=0.2),
                            component=mp.Ex, center=mp.Vector3(0, 0, -2))])
    sim.run(until=20)
    ex = np.asarray(sim.get_array(component=mp.Ex))
    assert np.all(np.isfinite(ex)) and np.abs(ex).max() > 0
