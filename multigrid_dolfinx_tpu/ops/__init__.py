"""Compute kernels: stencil operators, transfers, smoothers, coarse solves."""
