"""Test configuration.

Tests run on a virtual 8-device CPU platform (multi-chip sharding tests need
several devices; unit tests must not depend on TPU access).
"""

import os
import sys

# The axon TPU plugin registers itself from sitecustomize at interpreter
# startup and overrides JAX_PLATFORMS; the only way to run the suite on the
# virtual 8-device CPU platform is to re-exec with the plugin disabled.
# The 8-device flag must be applied on EVERY cpu-mode path (not just the
# re-exec one) — the multi-chip sharding tests hard-require 8 devices and
# must never silently skip.
# Set RELP_TPU_TEST_PLATFORM=tpu to run the suite against the real chip.
_DEVICE_FLAG = "--xla_force_host_platform_device_count=8"
_cpu_mode = os.environ.get("RELP_TPU_TEST_PLATFORM", "cpu") == "cpu"
if _cpu_mode and _DEVICE_FLAG not in os.environ.get("XLA_FLAGS", ""):
    if os.environ.get("PALLAS_AXON_POOL_IPS") or "jax" in sys.modules:
        # Either the axon plugin would hijack the platform, or jax was
        # already imported with the wrong device count: re-exec cleanly.
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " " + _DEVICE_FLAG
        os.execvpe(
            sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
        )
    # jax not yet imported: setting the env var now is sufficient.
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + _DEVICE_FLAG
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

if _cpu_mode and len(jax.devices()) < 8:
    raise RuntimeError(
        f"test suite requires 8 virtual CPU devices, got {len(jax.devices())} "
        f"({jax.devices()}); the multi-chip tests must not silently skip"
    )

import pytest


REFERENCE_ROOT = "/root/reference"


def reference_problem(suite: str, name: str) -> str:
    """Path of a problem file shipped with the reference's test suites.

    The reference's netlib/miplib/burkardt/unicamp/cook data is read directly
    from the read-only reference mount; tests that need it are skipped when
    the mount is absent.
    """
    path = os.path.join(REFERENCE_ROOT, "tests", suite, "problem_files", name)
    if not os.path.exists(path):
        pytest.skip(f"reference problem file not available: {path}")
    return path


@pytest.fixture
def cpu_config():
    from relp_tpu.config import SolverConfig

    return SolverConfig(pad_to=8, chunk_size=50, refactor_period=50)
