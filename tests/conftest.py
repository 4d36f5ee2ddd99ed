"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY §4: 'fake backend'
equivalent = jax CPU backend + interpret-mode Pallas).

This image's sitecustomize registers a remote TPU PJRT plugin ("axon") in
every interpreter; initializing it costs minutes of wall clock. Tests are
CPU-only, so we retarget jax at the cpu backend and drop the axon factory
before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop the remote-TPU plugin factory so it is never dialed
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
except Exception:
    pass

jax.config.update("jax_enable_x64", False)
