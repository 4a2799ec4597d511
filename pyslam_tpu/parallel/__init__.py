"""Multi-chip execution: device meshes, sharded bundle adjustment, batch eval.

The reference has no distributed backend (its parallelism is threads +
multiprocessing, SURVEY.md section 2.13); the TPU-native analogs are:
- sharded global bundle adjustment: observations partitioned across chips,
  normal equations reduced with XLA collectives (ICI), reduced camera system
  solved replicated;
- batch evaluation: one sequence per chip (embarrassingly parallel);
- batched frontend: image batches sharded over the mesh.
"""
