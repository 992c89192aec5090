# Developer entry points.  The compute library builds itself on first
# import; this Makefile only wraps the common flows.

PY ?= python

.PHONY: test bench fuzz-smoke native dryrun

test:
	$(PY) -m pytest tests/ -q

native:
	$(MAKE) -C t1k_tpu/native

# AddressSanitizer build of the native engine + smoke run of the engine
# tests against it (reference analog: Makefile:18-22 `asan=1`).
asan:
	$(MAKE) -C t1k_tpu/native asan-check

bench:
	$(PY) bench.py

# Multi-chip sharding compile+run on a virtual 8-device CPU mesh.
dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

# A few cases of every fuzz harness (needs the reference binaries;
# see tests/fuzz_*.py docstrings for the build recipe).
fuzz-smoke:
	$(PY) tests/fuzz_genotyper.py 0 3
	$(PY) tests/fuzz_analyzer.py 0 3
	$(PY) tests/fuzz_extractor.py 500 3
	$(PY) tests/fuzz_bam.py 0 3
	$(PY) tests/fuzz_driver.py 700 3
	$(PY) tests/fuzz_smartseq.py 300 2
	$(PY) tests/fuzz_tools.py 600 3
	$(PY) tests/fuzz_db.py 2000 3
	$(PY) tests/fuzz_vcfdb.py 100 3
