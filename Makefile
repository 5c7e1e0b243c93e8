# Developer entry points (the reference's CI equivalents: build matrix ->
# pytest on the virtual 8-device CPU mesh; examples build -> scene smoke).

PY ?= python

.PHONY: test test-full test-fast native scenes bench bench-budget entry-check clean

# Default tier: everything except @slow (the multi-minute shard_map
# compile tests — covered per-push by entry-check's 8-device dryrun).
test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

# Nightly tier: the whole suite. test_domain compiles the largest XLA
# programs (8-device shard_map); it runs in its own interpreter so the
# CPU compiler gets a fresh heap (see _fresh_compile_caches). Reruns are
# fast: compiled programs persist in .jax_cache (tests/conftest.py).
test-full:
	$(PY) -m pytest tests/ -x -q --ignore=tests/test_domain.py
	$(PY) -m pytest tests/test_domain.py -x -q

# Curated fast tier (<5 min; the per-push CI gate, .github/workflows/ci.yml):
# kernels, neighbor search vs brute force, one dense/gather equivalence,
# one spill/gather equivalence (ADVICE r4), one scene smoke, native
# sampler, renderer.
test-fast:
	$(PY) -m pytest tests/test_kernels.py tests/test_neighbors.py \
		tests/test_native.py tests/test_viz.py \
		tests/test_dense.py::test_dense_matches_gather \
		tests/test_spill.py::test_spill_matches_gather_2d \
		"tests/test_scenes.py::test_scene_smoke[custom_forces2]" -q

# Build the C++ triangle-mesh sampler (optional; tests skip when absent).
native:
	$(PY) -c "from salva_tpu import native; assert native._build()"

scenes:
	$(PY) examples/run_scene.py --list

bench:
	$(PY) bench.py

# Driver-artifact health check (VERDICT r4 #8): bench.py must emit its
# JSON line within the driver's wall-clock budget even on a cold compile
# cache — the script time-boxes its own 1M row (BENCH_BUDGET). Run under
# `timeout` so a budget bust fails loudly instead of producing rc=124 at
# round end. CPU tier: tiny N so CI can run it; the budget logic is
# backend-independent.
bench-budget:
	timeout 600 env BENCH_N=4096 BENCH_STEPS=5 BENCH_BUDGET=540 \
		JAX_PLATFORMS=cpu $(PY) bench.py

entry-check:
	PYTHONPATH= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import sys; sys.path.insert(0, '.'); import jax; \
	import __graft_entry__ as g; fn, a = g.entry(); \
	jax.block_until_ready(jax.jit(fn)(*a)); g.dryrun_multichip(8); \
	print('entry + multichip OK')"

dist:
	./publish.sh

clean:
	rm -rf native/build .jax_cache dist
