"""Compare a fresh BENCH_DETAILS.json against the last committed one.

Usage: python tools/bench_check.py [new.json [old.json]]

Flags: error rows, accuracy-audit failures, and headline metrics that
regressed by more than the drain-protocol noise floor (~15%).
"""
import json
import subprocess
import sys

HEADLINES = [
    ("candidates_ms", dict),
    ("fenrir_fused_batch1024_evals_per_sec", "higher"),
    ("dalton_fused_batch1024_evals_per_sec", "higher"),
    ("magi_fused_batch512_evals_per_sec", "higher"),
    ("large_state_stationary_solve_ms", "lower"),
    ("large_state_fenrir_nw32_value_grad_ms", "lower"),
]


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    new_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAILS.json"
    new = load(new_path)
    if len(sys.argv) > 2:
        old = load(sys.argv[2])
    else:
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAILS.json"],
            capture_output=True, text=True)
        old = json.loads(blob.stdout) if blob.returncode == 0 else {}

    bad = 0
    for k, v in sorted(new.items()):
        if k.endswith("_error"):
            print(f"ERROR ROW   {k}: {str(v)[:160]}")
            bad += 1
        if k.endswith("_accuracy_pass") and v is not True:
            print(f"ACCURACY    {k}: {v}")
            bad += 1
        if (k.endswith("_finite") and v is not True):
            print(f"NON-FINITE  {k}: {v}")
            bad += 1

    for k, direction in HEADLINES:
        if direction is dict:
            a, b = old.get(k, {}), new.get(k, {})
            for name in b:
                if name in a and isinstance(b[name], (tuple, list)):
                    continue
            continue
        a, b = old.get(k), new.get(k)
        if a is None or b is None:
            print(f"MISSING     {k}: old={a} new={b}")
            continue
        worse = (b < a / 1.15) if direction == "higher" else (b > a * 1.15)
        tag = "REGRESSED " if worse else "ok        "
        if worse:
            bad += 1
        print(f"{tag}  {k}: {a} -> {b}")

    if "candidates_ms" in new:
        print("candidates_ms:")
        for name, pair in new["candidates_ms"].items():
            print(f"    {name}: {pair}")
    print(f"\n{bad} problem(s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
