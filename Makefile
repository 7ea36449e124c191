.PHONY: test test-fast bench examples

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

examples:
	python examples/tutorial.py
	python examples/higher_order.py
	python examples/parameter.py
	python examples/timings.py
