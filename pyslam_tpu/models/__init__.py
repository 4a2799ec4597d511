"""Learned perception models as XLA inference graphs.

Reference: pySLAM's torch/tensorflow model wrappers (``pyslam/local_features/
feature_superpoint.py``, ``feature_xfeat.py``, ``semantic_segmentation_*.py``,
``loop_detector_vpr.py`` ...).  Here each model family is a flax module whose
forward pass jit-compiles for TPU; weights load from converted ``.npz``
checkpoints (``checkpoint=`` argument).  The build environment has no network
egress, so modules initialize randomly when no checkpoint is present —
architecture, pre/post-processing, and the factory surface are complete and
tested; numerical parity requires dropping in converted reference weights.
"""
