"""Dense volumetric mapping (reference: pyslam/dense + cpp/volumetric)."""
