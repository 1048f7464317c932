"""Test env: force an 8-device virtual CPU mesh.

All correctness tests run on CPU so they are hermetic and exercise the
multi-chip sharding paths (the driver's dryrun + real-TPU bench cover the
hardware).

Environment quirks this handles (discovered the hard way):
  * jax is PRE-IMPORTED at interpreter startup here (sitecustomize), so
    setting JAX_PLATFORM_NAME/JAX_PLATFORMS via os.environ in this file is
    too late — use jax.config.update instead;
  * XLA_FLAGS is read at backend *initialization*, which hasn't happened
    yet, so setting it here still works.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
