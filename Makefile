# Convenience targets (the reference built with src/Makefile; here the
# native extension is optional and everything else is pure Python).

PY ?= python

.PHONY: all ext test test-fast bench warm scaling clean

all: ext

ext:
	$(PY) setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_pallas.py \
	    --ignore=tests/test_fuzz.py

bench:
	$(PY) bench.py

# Pre-compile the exact kernel bench.py times (remote Mosaic cache warm;
# run periodically so `make bench` never eats a 150-650 s cold compile).
warm:
	timeout 800 $(PY) tools/warm_compile.py

scaling:
	$(PY) tools/scaling_bench.py --cpu

clean:
	rm -rf build cfrk_tpu/io/native/*.so __pycache__ .pytest_cache
