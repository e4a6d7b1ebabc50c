"""MPB-compatible namespace (the reference's `import meep.mpb as mpb`,
python/solver.py + python/mpb_data.py surface): band solvers, the
band-function library, and MPBData re-exported under one module."""

from .analysis.bands import (ModeSolver, ModeSolver3D, retrieve_gap,
                             get_num_args,
                             apply_band_func, apply_band_func_thunk,
                             combine_band_functions, output_at_kpoint,
                             fix_hfield_phase, fix_bfield_phase,
                             fix_dfield_phase, fix_efield_phase,
                             output_hfield, output_bfield, output_dfield,
                             output_efield, output_bpwr, output_hpwr,
                             output_dpwr, output_dpwr_in_objects,
                             output_charge_density, output_tot_pwr,
                             output_hfield_x, output_hfield_y,
                             output_hfield_z, output_bfield_x,
                             output_bfield_y, output_bfield_z,
                             output_dfield_x, output_dfield_y,
                             output_dfield_z, output_efield_x,
                             output_efield_y, output_efield_z,
                             output_poynting, output_poynting_x,
                             output_poynting_y, output_poynting_z,
                             display_yparities, display_zparities,
                             display_group_velocities, MPBArray)
from .analysis.mpb_data import MPBData
from .models.geom import Vector3, Medium, Lattice

NO_PARITY = 0
EVEN_Z = 1
ODD_Z = 2
EVEN_Y = 4
ODD_Y = 8
TE = EVEN_Z
TM = ODD_Z


def output_epsilon(ms):
    """Save the unit-cell epsilon grid (solver.py output_epsilon)."""
    import numpy as np
    np.save("epsilon.npy", np.asarray(ms.get_epsilon()))
