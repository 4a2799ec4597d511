"""Sparse SLAM core: cameras, frames, map, tracking, mapping, optimization."""
