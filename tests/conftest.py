"""Test config: force a virtual 8-device CPU mesh before JAX import, and highest
matmul precision so parity tests against the float32 torch reference are tight."""

import os

# Force CPU: the session presets JAX_PLATFORMS=axon (one real TPU chip); tests
# run on a virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# sitecustomize already imported jax and captured JAX_PLATFORMS=axon; the config
# update below is what actually forces CPU for the test session.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy integration test (excluded from the "
        "default run; select with -m slow, or -m 'slow or not slow' for the "
        "full sweep)")


def pytest_collection_modifyitems(config, items):
    # Default run stays under ~5 min: skip @slow unless the user passed an
    # explicit -m marker expression (which then fully decides selection).
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow (run `pytest -m slow` or `-m 'slow or not slow'`)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _reset_kernel_dispatch_state():
    """Process-global Pallas dispatch state (warn-once registry, vocab-mesh
    registration) must not leak between tests: a model-parallel Trainer that
    a slow test forgot to close() re-routed later single-chip head tests
    through shard_map (observed only in the full sweep)."""
    yield
    from cooperativeimagecaptioning_tpu.ops.pallas import _dispatch
    _dispatch.reset_warnings()
    _dispatch.set_vocab_mesh(None)
