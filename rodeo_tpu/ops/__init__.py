r"""
TPU-native compute-path extensions:

- :mod:`rodeo_tpu.ops.precond` — Taylor-mode preconditioning (float32-
  stable solvers and likelihoods).
- :mod:`rodeo_tpu.ops.ptime` — parallel-in-time associative-scan Kalman
  filtering/smoothing and the iterated solver.
- :mod:`rodeo_tpu.ops.stationary` — stationary-gain dense solver for
  affine time-invariant ODEs (large-state regime).
- :mod:`rodeo_tpu.ops.pallas_kalman` — fused single-kernel filter/smoother.
- :mod:`rodeo_tpu.ops.linalg` — closed-form tiny-matrix solves
  (``fast_linalg`` context).
- :mod:`rodeo_tpu.ops.scan` — ``scan_unroll`` trace-time context for the
  solver time loops (cross-step ILP on the vmapped XLA paths).
- :mod:`rodeo_tpu.ops.profile` — ``profile_solve`` step-cost /
  utilization probe (the bench harness's tunnel-aware drain-protocol
  timer as a public API).
"""
from rodeo_tpu.ops import linalg
from rodeo_tpu.ops import precond
from rodeo_tpu.ops import ptime
from rodeo_tpu.ops import stationary
from rodeo_tpu.ops.scan import scan_unroll
from rodeo_tpu.ops.profile import profile_solve
