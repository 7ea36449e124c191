r"""
TPU-native compute-path extensions:

- :mod:`rodeo_tpu.ops.precond` — Taylor-mode preconditioning (float32-
  stable solvers and likelihoods).
- :mod:`rodeo_tpu.ops.ptime` — parallel-in-time associative-scan Kalman
  filtering/smoothing and the iterated solver.
- :mod:`rodeo_tpu.ops.pallas_kalman` — fused single-kernel filter/smoother.
- :mod:`rodeo_tpu.ops.linalg` — closed-form tiny-matrix solves
  (``fast_linalg`` context).
"""
from rodeo_tpu.ops import linalg
from rodeo_tpu.ops import precond
from rodeo_tpu.ops import ptime
