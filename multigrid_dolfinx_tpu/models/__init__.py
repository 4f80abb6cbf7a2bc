"""Problem families (Poisson 2D/3D, variable-coefficient diffusion)."""
from .poisson import poisson2d, poisson3d, variable_coefficient_2d
