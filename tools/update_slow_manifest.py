"""
Regenerate / extend ``tests/slow_tests.txt`` from a measured run.

Runs the smoke tier with ``--durations=0``, parses per-test durations,
and moves every test whose TOTAL time (setup+call+teardown summed) is at
or above the threshold into the manifest, keeping existing entries.
This is the tool behind ``make remeasure`` — the smoke-tier budget gate
in the Makefile fails when drift accumulates, and this restores it.

Usage:  python tools/update_slow_manifest.py [--threshold 10] [--dry-run]
"""
import argparse
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
MANIFEST = REPO / "tests" / "slow_tests.txt"
# pytest --durations lines look like: "12.34s call tests/test_x.py::test_y"
_LINE = re.compile(
    r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(\S+)\s*$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=10.0,
                    help="seconds; tests at/above move to the slow tier")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "not slow",
         "--durations=0", "--durations-min=0.1"],
        cwd=REPO, capture_output=True, text=True)
    sys.stderr.write(proc.stdout[-2000:])
    totals = {}
    for line in proc.stdout.splitlines():
        m = _LINE.match(line)
        if m:
            dur, _, nodeid = m.groups()
            totals[nodeid] = totals.get(nodeid, 0.0) + float(dur)

    if not totals:
        sys.stderr.write("no --durations output parsed; aborting\n")
        return 1

    existing = [ln for ln in MANIFEST.read_text().splitlines()
                if ln.strip()] if MANIFEST.exists() else []
    known = {ln.strip() for ln in existing if not ln.startswith("#")}
    movers = sorted(n for n, t in totals.items()
                    if t >= args.threshold and n not in known)
    print(f"measured {len(totals)} smoke tests; "
          f"{len(movers)} at/above {args.threshold}s:")
    for n in movers:
        print(f"  {n}  ({totals[n]:.1f}s)")
    if args.dry_run or not movers:
        return 0
    with MANIFEST.open("a") as f:
        for n in movers:
            f.write(n + "\n")
    print(f"appended {len(movers)} entries to {MANIFEST}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
