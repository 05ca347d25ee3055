"""Trace kernel and user-facing tracers."""
