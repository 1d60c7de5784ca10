"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without a real TPU slice.

NB: on this machine the env var JAX_PLATFORMS alone is not honoured (a TPU
plugin takes precedence), so the platform is forced via jax.config before any
backend is initialized.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compilation")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
