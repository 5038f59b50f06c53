import os

# Tests always run on a virtual 8-device CPU mesh so multi-chip
# sharding is exercised deterministically without TPU hardware.  The
# ambient environment may pin JAX to a real accelerator (env var or a
# sitecustomize config update), so override both channels before any
# backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
