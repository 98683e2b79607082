"""Utilities: metric writers, profiling, attention-map visualization."""
