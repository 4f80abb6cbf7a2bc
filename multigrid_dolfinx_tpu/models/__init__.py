"""Problem families (Poisson 2D/3D, P2, variable-coefficient diffusion)."""
from .poisson import (
    poisson2d,
    poisson2d_p2,
    poisson3d,
    variable_coefficient_2d,
)
