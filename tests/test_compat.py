"""The upstream-namespace shim (`rodeo_tpu.compat.install_alias`) — the
migration-guide entry point (docs/migration.md) and the mechanism behind
tools/run_reference_tests.py."""
import subprocess
import sys


def test_install_alias_covers_upstream_import_patterns():
    # fresh interpreter: the alias must be installable before any
    # `rodeo` import and intercept every upstream import pattern
    src = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from rodeo_tpu.compat import install_alias
install_alias()
import rodeo
from rodeo import solve_mv, solve_sim
from rodeo.utils import first_order_pad
from rodeo.prior import ibm_init
from rodeo.interrogate import interrogate_kramer
from rodeo.kalmantv.standard import predict, update
from rodeo.kalmantv.square_root import predict as sr_predict
from rodeo.inference import basic, fenrir, dalton, daltonng, magi_logdens
from rodeo.inference.pseudo_marginal import normal_random_walk
assert rodeo.__name__ == "rodeo_tpu"
assert solve_mv.__module__ == "rodeo_tpu.solve"
print("COMPAT_OK")
"""
    out = subprocess.run([sys.executable, "-c", src],
                         capture_output=True, text=True, timeout=300)
    assert "COMPAT_OK" in out.stdout, out.stdout[-800:] + out.stderr[-800:]


def test_install_alias_refuses_live_upstream():
    src = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/reference/src")
try:
    import rodeo  # the real upstream
except ImportError:
    print("NO_UPSTREAM")
    raise SystemExit
from rodeo_tpu.compat import install_alias
try:
    install_alias()
    print("DID_NOT_RAISE")
except RuntimeError:
    print("REFUSED_OK")
"""
    out = subprocess.run([sys.executable, "-c", src],
                         capture_output=True, text=True, timeout=300)
    assert ("REFUSED_OK" in out.stdout or "NO_UPSTREAM" in out.stdout), \
        out.stdout[-800:] + out.stderr[-800:]
