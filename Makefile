.PHONY: test test-fast test-upstream bench timings timings-tpu examples \
	tutorials

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
