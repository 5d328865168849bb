"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding paths are validated
on a host-platform device mesh (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip). Pallas kernels detect
the CPU backend and run in interpreter mode.

Note: the ambient environment registers the TPU PJRT plugin and pins
JAX_PLATFORMS at interpreter boot (sitecustomize), so the platform switch must
go through jax.config after import — env vars are too late. Set
FA_TPU_TEST_PLATFORM=tpu to run the suite on real hardware instead.
"""

import os

# Must be appended before the first CPU backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("FA_TPU_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", False)
