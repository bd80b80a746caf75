"""Shared numerics utilities (spline fitting, tridiagonal solvers, etc.)."""
