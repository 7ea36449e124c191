r"""
rodeo-tpu: a TPU-native probabilistic ODE solver and inference framework.

Re-architecture of the capabilities of ``mlysy/rodeo`` (reference mounted at
``/root/reference``) for TPU execution: batch-polymorphic Kalman kernels,
optional parallel-in-time associative-scan filtering/smoothing, SVD-free
sampling, fused Pallas kernels for the hot scans, and device-mesh sharding
for vmapped MCMC chains and parameter sweeps.

Public API surface (matching the reference's re-exports,
``src/rodeo/__init__.py:1-6``):

- :func:`rodeo_tpu.solve_mv`, :func:`rodeo_tpu.solve_sim`
- :mod:`rodeo_tpu.interrogate`, :mod:`rodeo_tpu.prior`,
  :mod:`rodeo_tpu.inference`, :mod:`rodeo_tpu.kalmantv`,
  :mod:`rodeo_tpu.utils`
- TPU-native extensions under :mod:`rodeo_tpu.ops` (parallel-in-time,
  Pallas kernels, fast sampling) and :mod:`rodeo_tpu.parallel`
  (mesh/sharding helpers).
"""

__version__ = "0.5.0"

from rodeo_tpu import interrogate
from rodeo_tpu import prior
from rodeo_tpu import inference
from rodeo_tpu.solve import solve_sim, solve_mv
