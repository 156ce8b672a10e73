"""Test harness: force the CPU backend with a virtual 8-device mesh.

The reference's de-facto distributed test is ``mpirun -np K`` on localhost
(README.md:26); ours is an 8-device host-platform mesh, which exercises the
same shard-count-invariance properties without TPU hardware.  Note: in this
image the axon TPU plugin ignores ``JAX_PLATFORMS``, so the jax.config update
is the authoritative switch.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
