from .design import DesignRegion, DesignVariables
from .optimization import OptimizationProblem, run_differentiable
from . import filters
