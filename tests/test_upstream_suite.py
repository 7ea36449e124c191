"""
The upstream reference's own unittest suite, run against THIS package via
the ``rodeo`` -> ``rodeo_tpu`` namespace alias (tools/run_reference_tests.py).
Skipped when the reference checkout is absent (e.g. public CI).
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference checkout not available")
def test_upstream_suite_passes_against_rodeo_tpu():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_reference_tests.py")],
        capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "OK" in out.stderr or "OK" in out.stdout
