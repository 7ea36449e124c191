r"""
Likelihood approximations and MCMC kernels for Bayesian parameter inference
in ODE models.

Parity target: ``/root/reference/src/rodeo/inference/__init__.py``.
"""
from rodeo_tpu.inference.basic import basic
from rodeo_tpu.inference.fenrir import fenrir
from rodeo_tpu.inference.dalton import dalton, daltonng
from rodeo_tpu.inference.magi import magi_logdens
