"""Solver drivers: hierarchy construction, cycles, FMG, Krylov."""
