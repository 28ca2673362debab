# Target names mirror the reference's Makefile (benchmark /
# benchmark_debug / tests); this framework needs no compile step for the
# Python package -- `benchmark` runs the headline throughput benchmark,
# `native` (pre)builds the C++ IO library, `tests` runs the suite.

PY ?= python

.PHONY: benchmark benchmark_debug tests native

benchmark:
	$(PY) bench.py

benchmark_debug:
	JAX_DISABLE_JIT=1 $(PY) -X dev bench.py --reps 2 --trials 1

tests:
	$(PY) -m pytest tests/ -q

native:
	$(PY) -c "from finito_tpu.native import get_lib; import sys; sys.exit(0 if get_lib() else 1)"
