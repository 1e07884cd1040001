# Developer entry points — `make check` is the gate every change must
# pass, mirroring the reference's push-time CI (cpp-library.yml runs its
# catch suite under valgrind on every push; here: the full pytest suite
# on the CPU mesh plus the ASan rebuild of the native extensions).

PY ?= python

.PHONY: ext test memcheck bench check check-tpu docs

ext:
	$(PY) setup.py build_ext --inplace

test: ext
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q

memcheck: ext
	./scripts/check_native.sh

bench: ext
	$(PY) bench.py

check: test memcheck
	@echo "check OK"

# On-silicon gate: full CLI through the Pallas kernel on the real
# backend, byte-compared vs the C++ baseline (run on a TPU host).
check-tpu: ext
	./scripts/check_tpu.sh

# The reference regenerates docs/cli.rst by running `./humid -h`
# (src/Makefile:49-50); same idea here.
docs:
	JAX_PLATFORMS=cpu $(PY) -m humid_tpu -h > docs/cli-help.txt
