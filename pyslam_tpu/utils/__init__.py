"""Shared utilities: logging, timers, serialization (reference: pyslam/utilities)."""
