"""Utilities: timing/profiling, logging."""
