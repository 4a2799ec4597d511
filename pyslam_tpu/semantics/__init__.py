"""Semantic mapping layer (reference: pyslam/semantics, SURVEY.md section 2.6)."""
