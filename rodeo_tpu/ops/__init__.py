r"""
TPU-native compute-path extensions: parallel-in-time associative-scan Kalman
filtering/smoothing (:mod:`rodeo_tpu.ops.ptime`), SVD-free posterior sampling
(:mod:`rodeo_tpu.ops.sampling`), and fused Pallas kernels
(:mod:`rodeo_tpu.ops.pallas_kalman`).
"""
