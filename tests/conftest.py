"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of "multi-node testing without a cluster"
(SURVEY.md §4): sharding/collective code paths compile and execute on
virtual CPU devices exactly as they would across a TPU pod slice.
"""

import os
import sys

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# backend (JAX_PLATFORMS=axon), which is the bench target, not the test
# target — tests must run on the virtual multi-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
