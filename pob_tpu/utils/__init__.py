"""Shared utilities: profiling/timing harness."""
