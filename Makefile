PY ?= python

.PHONY: all native test test-fast bench demo clean

all: native

native: native/libsolid_runtime.so

native/libsolid_runtime.so: native/solid_runtime.cc
	g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread $< -o $@

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

demo:
	$(PY) -m solid_dsp_tpu demo

clean:
	rm -f native/libsolid_runtime.so
	find . -name __pycache__ -type d | xargs rm -rf
