r"""
Kalman kernel backends.

Two interchangeable modules with the same eight-function interface
(``predict``, ``update``, ``filter``, ``smooth_mv``, ``smooth_sim``,
``smooth``, ``forecast``, ``smooth_cond``):

- :mod:`rodeo_tpu.kalmantv.standard` — covariance form.
- :mod:`rodeo_tpu.kalmantv.square_root` — square-root (QR) form.

Callers select a backend module from the string
``kalman_type in {"standard", "square-root"}`` via :func:`get_backend`.
"""
from rodeo_tpu.kalmantv import standard
from rodeo_tpu.kalmantv import square_root

_BACKENDS = {
    "standard": standard,
    "square-root": square_root,
}


def get_backend(kalman_type):
    """Resolve a ``kalman_type`` string to a kernel module.

    Mirrors the dispatch done inline at every reference entry point
    (e.g. ``solve.py:136-143``).
    """
    try:
        return _BACKENDS[kalman_type]
    except KeyError:
        raise NotImplementedError(
            f"unknown kalman_type {kalman_type!r}; "
            f"expected one of {sorted(_BACKENDS)}"
        ) from None
