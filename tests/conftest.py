"""Test configuration.

Tests run on a virtual 8-device CPU platform (multi-chip sharding tests need
several devices; unit tests must not depend on TPU access).
"""

import os
import sys

# The axon TPU plugin registers itself from sitecustomize at interpreter
# startup and overrides JAX_PLATFORMS; the only way to run the suite on the
# virtual 8-device CPU platform is to re-exec with the plugin disabled.
# Set RELP_TPU_TEST_PLATFORM=tpu to run the suite against the real chip.
if (
    os.environ.get("RELP_TPU_TEST_PLATFORM", "cpu") == "cpu"
    and os.environ.get("PALLAS_AXON_POOL_IPS")
    and "jax" not in sys.modules
):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

import jax

jax.config.update("jax_enable_x64", True)

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
