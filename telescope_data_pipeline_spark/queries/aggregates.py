"""Placeholder — filled in by build phases."""
