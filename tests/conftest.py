"""Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware.

The axon TPU environment's sitecustomize initializes JAX backends at
interpreter start, which freezes the CPU device count before conftest can
set XLA flags — so if the device set is already wrong, clear the backends
and re-initialize on CPU with 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.default_backend() != "cpu" or len(jax.devices()) != 8:
    try:
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
    except Exception:  # pragma: no cover
        jax._src.xla_bridge._clear_backends()
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
