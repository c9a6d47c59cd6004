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

# sitecustomize already imported jax and captured JAX_PLATFORMS=axon; the config
# update below is what actually forces CPU for the test session.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
