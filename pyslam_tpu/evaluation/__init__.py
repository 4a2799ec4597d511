"""Evaluation harness: ATE/RPE metrics and multi-run reporting."""
