"""Differentiable trace wrappers (custom VJP)."""
