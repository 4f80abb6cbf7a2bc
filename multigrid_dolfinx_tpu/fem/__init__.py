"""FEM assembly, elements, norms, and Galerkin coarsening."""
