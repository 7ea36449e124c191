r"""
Trace-time scan configuration for the time-stepping loops.

The solver/inference layers run their per-step recursions with
``jax.lax.scan``.  On TPU each scan iteration's body is a handful of tiny
fused kernels; unrolling several steps per loop iteration exposes
instruction-level parallelism across consecutive steps and amortizes loop
bookkeeping, which speeds up the vmapped XLA paths ~20-40% (measured on
v5e, Lorenz63 4k grid).  The default is **auto**: long loops (>= 256
steps) on the TPU backend unroll 8-way; everything else (CPU, short
loops) stays ``unroll=1`` (no compile-time cost where it cannot pay).
Unrolling replays the identical per-step graph, so results are
unchanged up to XLA fusion rounding.  Set an explicit factor with
:func:`scan_unroll` (``scan_unroll(1)`` restores the strict
one-step-per-iteration loop).

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
    """Current ambient unroll factor for solver time loops (``None`` =
    auto: 8 on TPU for loops of >= 256 steps, else 1)."""
    return getattr(_state, "unroll", None)


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


def _loop_length(xs, length):
    if length is not None:
        return int(length)
    leaves = jax.tree_util.tree_leaves(xs)
    if leaves:
        return int(leaves[0].shape[0])
    return 0


def scan(f, init, xs=None, length=None, reverse=False):
    """``jax.lax.scan`` with the ambient :func:`scan_unroll` /
    :func:`scan_remat` settings (auto-unroll on TPU when unset)."""
    if get_scan_remat():
        f = jax.checkpoint(f)
    unroll = get_scan_unroll()
    if unroll is None:
        n = _loop_length(xs, length)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # measured on v5e (Lorenz 10k solve): 126 ms at unroll=1,
        # 107/105/104 at 8/16/32 — 16 is the knee vs compile time; fall
        # back to 8 when the length only divides 8 (e.g. the stationary
        # solver's n_steps - n_warm tail scans)
        if on_tpu and n >= 256 and n % 16 == 0:
            unroll = 16
        elif on_tpu and n >= 256 and n % 8 == 0:
            unroll = 8
        else:
            unroll = 1
    return jax.lax.scan(f, init, xs, length=length, reverse=reverse,
                        unroll=unroll)
