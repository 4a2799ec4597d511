"""Depth estimation layer (reference: pyslam/depth_estimation, SURVEY 2.4)."""
