.PHONY: test test-fast smoke test-upstream bench timings timings-tpu \
	examples tutorials docs

test:
	python -m pytest tests/ -q

# smoke tier: excludes every test measured >= 10 s on the 1-core bench
# VM (tests/slow_tests.txt, applied by conftest.py) — ~8 min vs ~85 min
# for the full suite; regenerate the manifest with
#   pytest tests/ -q --durations=0
smoke:
	python -m pytest tests/ -q -m "not slow"

test-fast: smoke

# the upstream reference's own unittest suite, run against this package
test-upstream:
	python tools/run_reference_tests.py

bench:
	python bench.py

timings:
	python examples/timings.py

timings-tpu:
	python examples/timings.py --tpu

tutorials:
	python docs/run_tutorials.py

examples:
	python examples/euler.py
	python examples/chkrebtii_graph.py
	python examples/tutorial.py
	python examples/higher_order.py
	python examples/lorenz.py
	python examples/parameter.py

# Sphinx site (readthedocs builds this via .readthedocs.yml; tutorials
# execute standalone via `make tutorials` when sphinx is absent)
docs:
	@python -c "import sphinx" 2>/dev/null \
	  && sphinx-build -b html docs docs/_build/html \
	  || echo "sphinx not installed; run 'pip install -r docs/requirements.txt' (tutorials still execute via 'make tutorials')"
