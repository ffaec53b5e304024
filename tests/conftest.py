import os

# Tests run on a virtual 8-device CPU mesh in float64: correctness and
# sharding logic are validated here; the real TPU chip is exercised by
# bench.py / __graft_entry__.py in float32.
#
# NOTE: the environment pre-imports jax (sitecustomize) with
# JAX_PLATFORMS=axon, so the platform must be overridden via jax.config,
# not environment variables.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
