"""meep_nl_tpu: a TPU-native FDTD electromagnetics framework.

Brand-new JAX/XLA implementation of the capabilities of the meep_nl fork of
Meep (reference layer map in SURVEY.md): full-vector Maxwell time-stepping on
the staggered Yee grid, uPML, dispersive and nonlinear (chi2 Pockels via
Newton inversion, chi3 Kerr) media, in-loop DTFT monitors, and native
jax.grad adjoints, sharded over TPU meshes with shard_map halo exchange.
"""

from .core import grid
from .core.grid import GridVolume
from .stepper import plan as stepplan
from .stepper.plan import (MaterialSpec, PolSpec, PMLSpec, SrcVolSpec,
                           DftSpec, compile_plan)
from .stepper.step import init_state, make_step, build_xs, run
from .models.source import (GaussianSource, ContinuousSource, CustomSource,
                            Source, SourceTime, GaussianBeamSource,
                            IndexedSource)
from .models.geom import (Vector3, Medium, Sphere, Block, Cylinder, Cone,
                          Wedge, Ellipsoid, Prism, LorentzianSusceptibility,
                          DrudeSusceptibility, NoisyLorentzianSusceptibility,
                          GyrotropicLorentzianSusceptibility, Transition,
                          MultilevelAtom, vacuum, air)
from .models.simulation import (Simulation, PML, Absorber, FluxRegion,
                                Near2FarRegion,
                                after_sources,
                                Ex, Ey, Ez, Hx, Hy, Hz, Dx, Dy, Dz,
                                Bx, By, Bz, Er, Ep, Hr, Hp, Dielectric,
                                X, Y, Z, R, ALL,
                                Low, High, Metallic, Magnetic, Mirror, Rotate2, Rotate4,
                                DiffractedPlanewave)
from .analysis.harminv import Harminv, harminv
from .analysis.bands import ModeSolver, ModeSolver3D, retrieve_gap
from .analysis.mpb_data import MPBData

inf = float("inf")

__version__ = "0.1.0"

from .models.run_control import (at_every, at_beginning, at_end,
                                 during_sources, in_volume,
                                 stop_when_fields_decayed,
                                 stop_when_dft_decayed, output_field,
                                 output_efield_z, output_epsilon)
from .utils.visualization import plot2D, plot3D, plot_fields, Animate2D

CYLINDRICAL = "cyl"


class _Verbosity:
    """Shared verbosity shim (python/verbosity_mgr.py parity): levels
    0 = quiet .. 3 = debug; only gates this package's optional prints."""

    def __init__(self):
        self.meep = 1
        self.mpb = 1

    def __call__(self, level=None):
        if level is not None:
            self.meep = int(level)
        return self.meep

    def set(self, level):
        self.meep = int(level)
        return self.meep


verbosity = _Verbosity()
