# Developer entry points, mirroring the reference's Makefile role
# (its targets built/ran the CUDA+ROS container, Makefile:6-44; this rebuild
# is a pure JAX/TPU package, so the targets drive tests, benchmarks and
# training directly).

PY ?= python

.PHONY: test test-fast bench bench-quick train-frontend dryrun native lint

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

bench-quick:
	$(PY) bench.py --quick

train-frontend:
	$(PY) -m forest_slam_tpu.cli train-frontend --steps 20000

# the driver's multi-chip dry run (8 virtual CPU devices)
dryrun:
	$(PY) __graft_entry__.py dryrun 8

# build the native (C++) bag reader explicitly
native:
	$(PY) -c "from forest_slam_tpu import native; assert native.available(); print('native ok')"
