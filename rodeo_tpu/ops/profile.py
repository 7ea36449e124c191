r"""
Step-cost / utilization probe for solver and likelihood evaluations.

The benchmark harness (``bench.py``) measures kernels with a
*drain-protocol* timer built for the one-chip TPU tunnel, where
``block_until_ready`` acknowledges enqueue rather than completion and a
host readback costs a ~30 ms roundtrip: run ``n`` back-to-back calls,
one readback at the end (the submission queue is FIFO, so the final
readback drains every call), subtract the separately-measured readback
roundtrip, and escalate the repetition count until the measured window
dwarfs the probe jitter.  :func:`profile_solve` exposes that timer —
plus the FLOP-model bookkeeping used by the roofline rows of
``BENCH_DETAILS.json`` — as a public API, so users on real TPUs can
reproduce the audit numbers for their own configurations.

Reference context: the reference has no profiling surface at all (its
timings live in a standalone ``examples/timings.py`` harness); this is
TPU-motivated new surface (SURVEY.md section 5, metrics/observability).
"""
import time

import jax

__all__ = ["profile_solve", "V5E_VPU_PEAK_FLOPS", "V5E_MXU_PEAK_FLOPS"]

#: v5e per-chip peak f32 VPU throughput (8 MiB vector units), FLOP/s.
V5E_VPU_PEAK_FLOPS = 1.9e12
#: v5e per-chip peak bf16 MXU throughput, FLOP/s.
V5E_MXU_PEAK_FLOPS = 197e12


def _sync(out):
    """Force completion of the computation producing ``out``.

    ``block_until_ready`` on the experimental TPU tunnel acknowledges
    *enqueue*, not completion (measured: repeated un-consumed calls
    "complete" in ~30 us while the device still runs) — only a host
    readback is a reliable sync point.  Reads ONE element (4 bytes), so
    the cost is a constant tunnel roundtrip, measured separately by
    :func:`_probe_once` and subtracted from every timing."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.numpy.ravel(leaf)[0])


def _probe_once(out):
    t0 = time.perf_counter()
    _sync(out)
    return time.perf_counter() - t0


def _timeit(fn, args, n_rep=5, per=1, min_window=0.3):
    """Amortized drain protocol: n back-to-back calls, ONE host sync at
    the end (the submission queue is FIFO, so the final readback drains
    every call), minus the separately measured sync roundtrip.  Per-rep
    syncing would add the ~30-40 ms tunnel roundtrip to every
    measurement.

    The probe roundtrip itself has ~10 ms jitter, so a measurement whose
    drained work is comparable to the probe is pure noise (observed: a
    3-call window of a 1 ms kernel "measuring" 384e9 evals/s when
    total - probe went negative).  Reps therefore escalate until the
    window is at least ``max(min_window, 8 x probe)`` of wall clock;
    ``n_rep`` is only the starting point.

    Returns ``(seconds_per_unit, last_output)`` where a unit is one of
    the ``per`` evaluations each call performs (e.g. one lane of a
    batched kernel)."""
    out = fn(*args)
    _sync(out)
    probe = min(_probe_once(out) for _ in range(3))
    reps = max(n_rep, 1)
    floor = max(min_window, 8.0 * probe)
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        total = time.perf_counter() - t0 - probe
        if total >= floor or reps >= 4096:
            break
        scale = floor / max(total, 0.25 * probe, 1e-4)
        reps = min(4096, max(2 * reps, int(reps * scale) + 1))
    return max(total, 1e-9) / (reps * per), out


def profile_solve(fn, *args, per=1, n_rep=5, min_window=0.3,
                  flops_per_eval=None, peak_flops=None, **kwargs):
    r"""
    Measure the steady-state device cost of one evaluation of ``fn``.

    ``fn(*args, **kwargs)`` should be a jitted callable (it is called
    once for warm-up/compilation before timing begins).  Timing uses the
    tunnel-aware drain protocol above — robust both on direct-attached
    devices and through the remote TPU tunnel, where naive
    ``block_until_ready`` timing under-reports by the enqueue/completion
    gap and single-call timing carries ~10 ms roundtrip jitter.

    Args:
        per (int): evaluations performed by ONE call of ``fn`` (e.g. the
            lane count of a batched kernel); results are per evaluation.
        n_rep (int): starting repetition count (auto-escalated until the
            measured window is trustworthy).
        min_window (float): minimum wall-clock window in seconds.
        flops_per_eval (float | None): a FLOP model for one evaluation.
            When given, the result gains ``achieved_flops`` and — with
            ``peak_flops`` — ``utilization``, reproducing the roofline
            rows of ``BENCH_DETAILS.json`` (e.g. the fused lane-batched
            column program counts 570 f32 FLOP/step/block/lane on the
            VPU with the MXU idle by design at q <= 5).
        peak_flops (float | None): device peak for the unit doing the
            work — :data:`V5E_VPU_PEAK_FLOPS` for elementwise/column
            programs, :data:`V5E_MXU_PEAK_FLOPS` for matmul-dominated
            large-state solves.

    Returns:
        dict: ``ms`` (per evaluation), ``evals_per_sec``, ``reps_used``
        is implicit in the protocol; plus ``achieved_flops`` /
        ``utilization`` when the models are supplied.
    """
    call = (lambda *a: fn(*a, **kwargs)) if kwargs else fn
    sec, _ = _timeit(call, args, n_rep=n_rep, per=per,
                     min_window=min_window)
    out = {"ms": sec * 1e3, "evals_per_sec": 1.0 / sec}
    if flops_per_eval is not None:
        out["flops_per_eval"] = float(flops_per_eval)
        out["achieved_flops"] = float(flops_per_eval) / sec
        if peak_flops is not None:
            out["utilization"] = float(flops_per_eval) / sec / peak_flops
    return out
