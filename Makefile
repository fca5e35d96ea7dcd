# Developer entry points. PYTHONPATH=src is baked into each target.

PY := PYTHONPATH=src python

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/unit -x -q

bench:
	$(PY) bench.py

kernel-parity:
	$(PY) scripts/tpu_kernel_parity.py

perf-sweep:
	$(PY) scripts/perf_sweep.py

stall-bench:
	$(PY) scripts/stall_bench.py

native:
	$(MAKE) -C native

regen-goldens:
	UIG_REGEN_GOLDENS=1 $(PY) -m pytest tests/integration/test_golden.py -q

.PHONY: test test-fast bench kernel-parity perf-sweep stall-bench native regen-goldens
