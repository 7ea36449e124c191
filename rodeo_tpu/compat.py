"""
Upstream-namespace compatibility shim.

:func:`install_alias` maps the ``rodeo`` import namespace onto this
package so code written against the upstream reference
(`mlysy/rodeo <https://github.com/mlysy/rodeo>`_; surface defined by
``/root/reference/src/rodeo/__init__.py`` and its submodules) runs
verbatim — including ``from rodeo.xyz import …`` statements, which a
local ``import rodeo_tpu as rodeo`` alias cannot intercept.  Upstream's
own test suite runs green under this shim
(``tools/run_reference_tests.py`` / ``tests/test_upstream_suite.py``).
"""
import importlib
import sys

__all__ = ["install_alias"]

# every public submodule of the upstream package (rodeo 1.1.3)
_SUBMODULES = (
    "solve",
    "interrogate",
    "utils",
    "prior",
    "kalmantv",
    "kalmantv.standard",
    "kalmantv.square_root",
    "inference",
    "inference.basic",
    "inference.fenrir",
    "inference.dalton",
    "inference.magi",
    "inference.pseudo_marginal",
)


def install_alias(name="rodeo"):
    """Alias the upstream package name to ``rodeo_tpu`` in ``sys.modules``.

    Call once, before any ``import rodeo``.  Refuses to shadow a live
    upstream installation that has already been imported (aliasing over
    it mid-session would leave half-initialized module objects behind).

    Args:
        name (str): Root name to alias (default ``"rodeo"``).

    Returns:
        (dict): The installed ``{module_name: module}`` mapping.
    """
    existing = sys.modules.get(name)
    if existing is not None and not existing.__name__.startswith(
            "rodeo_tpu"):
        raise RuntimeError(
            f"'{name}' is already imported from "
            f"{getattr(existing, '__file__', '?')}; install_alias() must "
            "run before the upstream package is imported")
    root = importlib.import_module("rodeo_tpu")
    aliases = {name: root}
    for sub in _SUBMODULES:
        aliases[f"{name}.{sub}"] = importlib.import_module(
            f"rodeo_tpu.{sub}")
    sys.modules.update(aliases)
    return aliases
