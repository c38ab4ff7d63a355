"""Test configuration: force an 8-device CPU platform.

The driver invokes pytest in the default environment where the axon TPU
plugin is registered (JAX_PLATFORMS=axon, one real chip). Tests instead run
on 8 virtual CPU devices so the shard_map/psum/ppermute code paths
(pixel-tile halo exchange, distributed Schur BA) are exercised without a
pod slice — SURVEY.md section 6 "Distributed tests without a cluster".
Pallas kernels run with interpret=True on CPU (slr.kernels auto-detects).

This must happen before any test module touches a backend; jax.config
updates still work here because sitecustomize only *registers* the axon
plugin, it does not initialize backends.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Fail loudly on NaNs in tests (SURVEY.md section 7, race/sanitizer analog).
jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

os.environ.setdefault("SLR_FORCE_INTERPRET", "1")
