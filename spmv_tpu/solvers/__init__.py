"""Iterative solvers built on SpMV (the reference's L5)."""
