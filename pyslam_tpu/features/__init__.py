"""Local feature extraction/matching layer (reference: pyslam/local_features)."""
