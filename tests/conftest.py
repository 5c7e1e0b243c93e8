"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of "multi-node testing without a cluster"
(SURVEY.md §4): sharding/collective code paths compile and execute on
virtual CPU devices exactly as they would across a TPU pod slice.

The ambient environment registers a tunneled TPU PJRT plugin at
interpreter startup (a sitecustomize on PYTHONPATH) and sets
JAX_PLATFORMS=axon. The plugin registration happens before any user code,
but backends are not frozen until first use — so forcing the platform via
``jax.config`` here (before any test imports jax functions) reliably puts
the whole test run on CPU.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache (VERDICT r3 #8: suite wall time): the
# suite's cost is dominated by XLA CPU compiles of repeated step
# programs; caching them on disk makes every rerun (CI retries, local
# iteration, the nightly full tier) skip straight to execution. Keyed on
# HLO + platform + flags, so CPU test programs and tunneled-TPU bench
# programs coexist in one directory. ``make clean`` resets it.
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO_ROOT, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_memory():
    """XLA's CPU compiler has segfaulted (rc=139) when compiling the
    suite's largest programs late in a long-lived process with dozens of
    cached executables (observed in test_scenes/test_domain; never in
    isolation). Dropping JAX's caches at module boundaries keeps every
    module's compiles within the same headroom they get standalone."""
    jax.clear_caches()
    yield
