"""
Large-state workflow: a PDE semi-discretization as ONE dense block.

The reference's examples top out at 6 state variables
(`/root/reference/examples/timings.py`); this example runs the d=128
method-of-lines heat equation (state dim 384, `rodeo_tpu/models/heat.py`)
three ways and checks each against the discretized system's closed-form
solution (the initial profile is an exact Laplacian eigenvector):

1. the exact Taylor-preconditioned solver (`precond.solve_mv` — MXU
   matmuls + Cholesky innovation solves via `ops/linalg.solve_psd`);
2. the stationary-gain solver (`ops/stationary.py` — exact Riccati
   warm-up, frozen gains, matvec-only mean scans; valid because the
   heat RHS is affine and time-invariant);
3. the stationary solver with marginal-only covariance output
   (`var_out="diag"` — the full covariance grid is the HBM wall for
   d >> 128).

Run: python examples/large_state.py          (CPU, f64, small d)
     python examples/large_state.py --tpu    (ambient accelerator, f32,
                                              the benchmark config)
"""
import os
import sys
import timeit

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_TPU = "--tpu" in sys.argv

if not _TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from rodeo_tpu.interrogate import interrogate_kramer  # noqa: E402
from rodeo_tpu.models import heat                     # noqa: E402
from rodeo_tpu.ops import precond                     # noqa: E402
from rodeo_tpu.ops.stationary import solve_mv_stationary  # noqa: E402


def bench_one(tag, fn, exact, p, t_max):
    # simple block_until_ready timing: through the experimental TPU
    # tunnel this includes a ~26 ms host roundtrip per call, so short
    # solves read higher here than bench.py's drain-protocol rows
    # (e.g. stationary d=128: ~37 ms here vs 10.1 ms amortized)
    mu = fn()[0]
    jax.block_until_ready(mu)
    t = min(timeit.repeat(lambda: jax.block_until_ready(fn()[0]),
                          number=1, repeat=3))
    err = float(np.max(np.abs(
        np.asarray(mu[-1, 0, ::p]) - exact(t_max))))
    print(f"{tag:>34s}: {t * 1e3:9.1f} ms   max|err| vs closed form "
          f"{err:.2e}")


def main():
    d = 128 if _TPU else 32
    n_steps = 1000 if _TPU else 200
    dtype = jnp.float32 if _TPU else jnp.float64
    cfg = heat.setup(d=d, n_deriv=3, n_steps=n_steps, dtype=dtype)
    exact = cfg.pop("exact")
    p = cfg.pop("n_deriv")
    print(f"heat equation d={d} (state dim {3 * d}), {n_steps} steps, "
          f"{jnp.zeros(0, dtype).dtype} on {jax.devices()[0]}")

    bench_one(
        "exact precond path", jax.jit(lambda: precond.solve_mv(
            key=None, interrogate=interrogate_kramer, n_deriv=p, **cfg)),
        exact, p, cfg["t_max"])
    bench_one(
        "stationary gains (n_warm=64)", jax.jit(lambda: solve_mv_stationary(
            key=None, interrogate=interrogate_kramer, n_deriv=p,
            n_warm=64, **cfg)),
        exact, p, cfg["t_max"])
    bench_one(
        "stationary, var_out='diag'", jax.jit(lambda: solve_mv_stationary(
            key=None, interrogate=interrogate_kramer, n_deriv=p,
            n_warm=64, var_out="diag", **cfg)),
        exact, p, cfg["t_max"])


if __name__ == "__main__":
    main()
