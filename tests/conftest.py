"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device code paths without TPU hardware.

Note: this environment force-sets jax_platforms to "axon,cpu" (the TPU
tunnel) regardless of JAX_PLATFORMS, so we must override the config *after*
importing jax but before any backend initialisation — otherwise every test
silently runs over the TPU tunnel and serialises on the single-chip lock.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
