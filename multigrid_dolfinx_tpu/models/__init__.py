"""Problem families (Poisson 2D/3D, P2, variable-coefficient, screened)."""
from .poisson import (
    poisson2d,
    poisson2d_p2,
    poisson3d,
    poisson3d_p2,
    screened_poisson2d,
    screened_poisson3d,
    variable_coefficient_2d,
    variable_coefficient_3d,
)
