from .design import DesignRegion, DesignVariables, MaterialGrid
from .optimization import OptimizationProblem, run_differentiable
from . import filters
from .objectives import (eigenmode_coefficient, fourier_fields,
                         ldos_objective, near2far_fields)
from .connectivity import connectivity_penalty, constraint_connectivity, cc_fd
from .basis import BilinearInterpolationBasis, Basis, unfilter_design

# reference python/adjoint surface (objective.py / utils.py / wrapper.py /
# filter_source.py / optimization_problem.py helpers)
from .compat import (ObjectiveQuantity, EigenmodeCoefficient,
                     FourierFields, Near2FarFields, LDOS,
                     register_monitors, install_design_region_monitors,
                     gather_monitor_values, validate_and_update_design,
                     calculate_vjps, create_adjoint_sources,
                     MeepJaxWrapper, FilteredSource, atleast_3d)
from .filters import (conic_filter, gaussian_filter, cylindrical_filter,
                      tanh_projection, heaviside_projection,
                      smoothed_projection,
                      exponential_erosion, exponential_dilation,
                      heaviside_erosion, heaviside_dilation,
                      geometric_erosion, geometric_dilation,
                      harmonic_erosion, harmonic_dilation,
                      get_threshold_wang, get_eta_from_conic,
                      get_conic_radius_from_eta_e, length_indicator,
                      indicator_solid, constraint_solid, indicator_void,
                      constraint_void, gray_indicator, mesh_grid,
                      convolve_design_weights_and_kernel)
