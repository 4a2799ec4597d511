"""Host-side I/O: datasets, ground truth, trajectories (reference: pyslam/io)."""
