"""mapfree_tpu — a TPU-native (JAX/XLA/Pallas) map-free visual relocalization framework.

Re-designed from scratch for TPU with the capability surface of
nianticlabs/map-free-reloc: relative pose regression (RPR) models, feature-matching
+ metric-scale pose solvers, MapFree/ScanNet/7Scenes data pipelines, and the
leaderboard-compatible benchmark evaluator.

Design principles (vs the torch/OpenCV reference):
- pure functions over fixed-shape batched arrays, jit-compiled once
- data parallelism via jax.sharding.Mesh + jit sharding, not per-pair Python loops
- all geometry (RANSAC, Kabsch, PnP, E-matrix) as batched XLA programs
- bfloat16 compute on the MXU, float64 numpy on host for evaluation parity
"""

__version__ = "0.1.0"
