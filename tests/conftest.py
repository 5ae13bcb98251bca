"""Test config: run JAX on a virtual 8-device CPU mesh.

This machine's sitecustomize registers a TPU ('axon') PJRT plugin and forces
``jax_platforms="axon,cpu"`` at interpreter startup, so plain env vars are not
enough — we override the config directly before the first backend
initialization.  Tests run on CPU: they need float64 oracles and an 8-device
virtual mesh, neither of which the single tunneled TPU chip provides.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound per-process XLA:CPU compiler state.

    A single full-suite process accumulates hundreds of compiled
    executables; past ~200 compile-heavy tests the XLA:CPU backend
    segfaulted INSIDE a later compile (faulthandler stack in
    backend_compile_and_load) while the same tests pass in split runs.
    Dropping the executable caches at module boundaries keeps the
    accumulated JIT state bounded; cross-module compile reuse is minimal,
    so the wall-clock cost is small."""
    yield
    jax.clear_caches()
