"""profile_solve: the public drain-protocol step-cost probe must return
sane per-eval timings and the roofline bookkeeping."""
import jax
import jax.numpy as jnp
import numpy as np

from rodeo_tpu.ops import profile_solve
from rodeo_tpu.ops.profile import V5E_VPU_PEAK_FLOPS


def test_profile_solve_times_a_jitted_eval():
    @jax.jit
    def f(x):
        return jnp.sum(x * x)

    x = jnp.arange(1024.0)
    out = profile_solve(f, x, min_window=0.05)
    assert out["ms"] > 0
    assert abs(out["evals_per_sec"] - 1e3 / out["ms"]) \
        < 1e-6 * out["evals_per_sec"]
    assert "utilization" not in out


def test_profile_solve_roofline_fields():
    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    flops = 2 * 64**3
    out = profile_solve(f, x, min_window=0.05, flops_per_eval=flops,
                        peak_flops=V5E_VPU_PEAK_FLOPS)
    assert out["flops_per_eval"] == flops
    assert np.isclose(out["achieved_flops"],
                      flops * out["evals_per_sec"], rtol=1e-6)
    assert np.isclose(out["utilization"],
                      out["achieved_flops"] / V5E_VPU_PEAK_FLOPS,
                      rtol=1e-6)


def test_profile_solve_per_and_kwargs():
    @jax.jit
    def f(x, scale=1.0):
        return jnp.sum(x) * scale

    x = jnp.ones((8, 100))
    a = profile_solve(f, x, per=8, min_window=0.05, scale=2.0)
    b = profile_solve(f, x, per=1, min_window=0.05, scale=2.0)
    # per=8 reports 1/8 of the per-call cost (same call, batched lanes)
    assert a["ms"] < b["ms"]
