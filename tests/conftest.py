"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device-count override (the strategy SURVEY.md §4 calls out as
the TPU build's advantage over the reference's GPU-only tests).
"""

import os

# Must be set before jax is imported anywhere. Forced (not setdefault): the
# ambient environment points JAX at a remote TPU (JAX_PLATFORMS=axon) whose
# default matmul precision is bf16 — tests want deterministic fp32 CPU.
# Set HYDRAGEN_TEST_TPU=1 to run the suite against real TPU hardware instead.
if not os.environ.get("HYDRAGEN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The environment's sitecustomize registers a remote-TPU ("axon") PJRT
    # plugin and programmatically sets jax_platforms="axon,cpu", which beats
    # the env var — override through jax.config as well.
    import jax

    jax.config.update("jax_platforms", "cpu")
