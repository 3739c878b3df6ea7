# Developer workflow (reference Makefile parity: test/lint, Makefile:1-12)

.PHONY: test test-fast lint bench fixture dryrun

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

lint:
	ruff check layoutdit_tpu tests || true

bench:
	python bench.py

fixture:
	python -m layoutdit_tpu.tools.make_fixture /tmp/fixture --n 64 --epochs 2

dryrun:
	python __graft_entry__.py 8
