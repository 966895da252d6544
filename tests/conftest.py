"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md §4: multi-device behavior is validated with
``xla_force_host_platform_device_count`` (no TPU needed in CI); float64 is
enabled so assembly/solver numerics can be checked against f64 ground truth
(the reference's OSQP path is f64).

NOTE: this environment pre-imports JAX via a sitecustomize (PYTHONPATH
axon_site) with ``JAX_PLATFORMS=axon`` pointing at a tunneled TPU — env vars
set here are too late, so the platform is forced through ``jax.config``.
``XLA_FLAGS`` still works because the CPU backend initializes lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# OSQP_TPU_TESTS=1 leaves the ambient platform (the tunneled TPU) in place so
# hardware-marked tests (e.g. test_pallas_tridiag.py::test_*_on_hardware)
# exercise the native kernel path:
#   OSQP_TPU_TESTS=1 python -m pytest tests/test_pallas_tridiag.py -q
if not os.environ.get("OSQP_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles thousands of XLA:CPU programs; with every
    executable kept alive the accumulated compiler/runtime state ends in a
    deterministic SEGFAULT inside ``backend_compile_and_load`` about 135
    tests in (first seen round 3 — reproducible at the identical test in
    two clean full-suite runs, NOT reproducible for any file subset).
    Dropping the jit caches between modules keeps the live-program count
    bounded; cross-module recompiles cost a few extra minutes.
    """
    yield
    jax.clear_caches()
