from .design import DesignRegion, DesignVariables
from .optimization import OptimizationProblem, run_differentiable
from . import filters
from .objectives import (eigenmode_coefficient, fourier_fields,
                         ldos_objective, near2far_fields)
from .connectivity import connectivity_penalty
from .basis import BilinearInterpolationBasis, unfilter_design
