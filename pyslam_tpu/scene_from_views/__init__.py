"""Multi-view end-to-end reconstruction (reference: pyslam/scene_from_views)."""
