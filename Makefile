# Developer workflow (reference Makefile parity: test/lint, Makefile:1-12)

.PHONY: test test-all test-fast lint bench fixture train-fixture dryrun serve predict shards sanitize

# Fast default (~20 min on a 1-core host): everything except tests marked
# `slow` (multi-epoch convergence, 4-process gloo batteries, sanitizer
# builds). Rounds/releases are judged on `make test-all`.
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

test-fast: test

lint:
	ruff check layoutdit_tpu tests || true

bench:
	python bench.py

fixture:
	python -m layoutdit_tpu.tools.make_fixture /tmp/fixture --n 64 --epochs 2

dryrun:
	python __graft_entry__.py 8

train-fixture:  # train on the fixture (writes epoch_2.msgpack, used below)
	LAYOUTDIT_CONFIG=/tmp/fixture/cfg.json python -m layoutdit_tpu.main --local_mode

serve:  # dynamic-batching HTTP server on the fixture checkpoint
	python -m layoutdit_tpu.tools.serve --checkpoint /tmp/fixture/fixture/model_checkpoints/epoch_2.msgpack --port 8000

predict:  # offline detection over the fixture pages
	python -m layoutdit_tpu.tools.predict --checkpoint /tmp/fixture/fixture/model_checkpoints/epoch_2.msgpack --input /tmp/fixture/samples --output /tmp/dets.json

shards:
	python -m layoutdit_tpu.tools.make_shards --images /tmp/fixture/samples --annotations /tmp/fixture/samples.json --out /tmp/fixture/shards

sanitize:
	python -m pytest tests/test_sanitizers.py -q
