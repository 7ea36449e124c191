.PHONY: test test-fast test-upstream bench timings timings-tpu examples \
	tutorials docs

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

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
