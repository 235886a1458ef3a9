"""Utilities: timing/benchmark harness, roofline accounting."""
