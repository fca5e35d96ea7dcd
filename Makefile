# Developer entry points. PYTHONPATH=src is baked into each target.

PY := PYTHONPATH=src:$(PYTHONPATH) python
# CPU test runs must NOT claim the (single-claimant) axon TPU tunnel —
# blanking PALLAS_AXON_POOL_IPS makes sitecustomize skip TPU registration.
PYCPU := PALLAS_AXON_POOL_IPS= PYTHONPATH=src:$(PYTHONPATH) python

test:
	$(PYCPU) -m pytest tests/ -x -q

test-fast:
	$(PYCPU) -m pytest tests/unit -x -q

# fast tier: every family's one-step/short-train path + DP equivalence
# (target ≤5 min with a warm .xla_cache; see pyproject markers)
smoke:
	$(PYCPU) -m pytest tests/ -m smoke -x -q

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

.PHONY: test test-fast smoke bench kernel-parity perf-sweep stall-bench native regen-goldens
