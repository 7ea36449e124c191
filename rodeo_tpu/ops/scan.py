r"""
Trace-time scan configuration for the time-stepping loops.

The solver/inference layers run their per-step recursions with
``jax.lax.scan``.  On TPU each scan iteration's body is a handful of tiny
fused kernels; unrolling several steps per loop iteration exposes
instruction-level parallelism across consecutive steps and amortizes loop
bookkeeping, which speeds up the vmapped XLA paths ~20-40% (measured on
v5e, Lorenz63 4k grid).  The default stays ``unroll=1`` — bit-identical
results, and no compile-time cost for the latency-insensitive uses.

Usage (trace-time, like :func:`rodeo_tpu.ops.linalg.fast_linalg`)::

    from rodeo_tpu.ops.scan import scan_unroll

    with scan_unroll(8):
        ll = jax.jit(jax.vmap(lambda th: precond.fenrir(...)))(thetas)

The context must be active while the function is being *traced* (the first
jitted call); the unroll factor is baked into the compiled program.
"""
import contextlib
import threading

import jax

__all__ = ["scan", "scan_unroll", "get_scan_unroll",
           "scan_remat", "get_scan_remat"]

_state = threading.local()


def get_scan_unroll():
    """Current ambient unroll factor for solver time loops (default 1)."""
    return getattr(_state, "unroll", 1)


@contextlib.contextmanager
def scan_unroll(n):
    """Trace-time context: run solver time loops with ``lax.scan``
    ``unroll=n`` (``n`` consecutive steps per compiled loop iteration)."""
    prev = get_scan_unroll()
    _state.unroll = int(n)
    try:
        yield
    finally:
        _state.unroll = prev


def get_scan_remat():
    """Whether solver time-loop bodies are rematerialized (default False)."""
    return getattr(_state, "remat", False)


@contextlib.contextmanager
def scan_remat(enable=True):
    """Trace-time context: wrap every solver time-loop body in
    ``jax.checkpoint`` — reverse-mode differentiation then recomputes the
    per-step intermediates instead of storing them all, trading FLOPs for
    the HBM traffic that dominates gradient evaluations of long scans.
    Identical values and gradients."""
    prev = get_scan_remat()
    _state.remat = bool(enable)
    try:
        yield
    finally:
        _state.remat = prev


def scan(f, init, xs=None, length=None, reverse=False):
    """``jax.lax.scan`` with the ambient :func:`scan_unroll` /
    :func:`scan_remat` settings."""
    if get_scan_remat():
        f = jax.checkpoint(f)
    return jax.lax.scan(f, init, xs, length=length, reverse=reverse,
                        unroll=get_scan_unroll())
