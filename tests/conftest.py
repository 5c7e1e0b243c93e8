"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of "multi-node testing without a cluster"
(SURVEY.md §4): sharding/collective code paths compile and execute on
virtual CPU devices exactly as they would across a TPU pod slice.

The ambient environment may force a tunneled TPU backend at interpreter
startup (a sitecustomize on PYTHONPATH registers the 'axon' PJRT plugin
before any user code runs, overriding JAX_PLATFORMS). Tests must run on
CPU, so if that hook is present we re-exec pytest once with a cleaned
environment.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _needs_reexec() -> bool:
    if os.environ.get("SALVA_TPU_TEST_REEXEC") == "1":
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return "axon" in pythonpath or os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"


if _needs_reexec():
    env = dict(os.environ)
    env["SALVA_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO_ROOT
    xla_flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, _REPO_ROOT)
