"""
Execute every ``{code-cell}`` block of the myst-nb tutorials under
``docs/examples/`` in order, one shared namespace per tutorial — the
tutorials double as integration tests (the reference builds them with
myst_nb ``nb_execution_mode='cache'``; this runner needs no sphinx).

Run: python docs/run_tutorials.py [name ...]
"""
import pathlib
import re
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))     # import rodeo_tpu from the repo

CELL_RE = re.compile(r"^```\{code-cell\}[^\n]*\n(.*?)^```", re.M | re.S)


def run_tutorial(path):
    text = path.read_text()
    cells = CELL_RE.findall(text)
    ns = {"__name__": f"tutorial_{path.stem}"}
    t0 = time.perf_counter()
    for i, cell in enumerate(cells):
        try:
            exec(compile(cell, f"{path.name}[cell {i}]", "exec"), ns)
        except Exception:
            print(f"FAILED: {path.name} cell {i}:\n{cell}")
            raise
    dt = time.perf_counter() - t0
    print(f"OK: {path.name} ({len(cells)} cells, {dt:.1f}s)")


def main(names=None):
    paths = sorted((HERE / "examples").glob("*.md"))
    if names:
        paths = [p for p in paths if p.stem in names]
    assert paths, "no tutorials found"
    for p in paths:
        run_tutorial(p)
    print(f"ALL {len(paths)} TUTORIALS EXECUTED CLEAN")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
