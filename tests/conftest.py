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
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA:CPU collectives hard-abort (SIGABRT) any program whose slowest
    # participant reaches the rendezvous more than 40 s after the first.
    # With the 8 virtual devices time-slicing few hardware cores, big-dim
    # tests (34B/70B geometry at fp32) stagger past that on small CI hosts
    # — raise the termination timeout; correctness is unaffected. (The
    # heavy-geometry mesh tests additionally skip on 1-core hosts, where
    # the stagger exceeds any sane timeout — see needs_cores.)
    if "xla_cpu_collective_timeout_seconds" not in flags:
        flags += " --xla_cpu_collective_timeout_seconds=1200"
    os.environ["XLA_FLAGS"] = flags

    # The environment's sitecustomize registers a remote-TPU ("axon") PJRT
    # plugin and programmatically sets jax_platforms="axon,cpu", which beats
    # the env var — override through jax.config as well.
    import jax

    jax.config.update("jax_platforms", "cpu")


def usable_cpus() -> int:
    """CPUs this process may actually run on: cgroup/affinity-limited
    containers report the HOST count via os.cpu_count()."""
    try:
        return len(os.sched_getaffinity(0)) or 1
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full-suite process accumulates hundreds of XLA:CPU executables (each
    with its own thread/arena state); on very small CI hosts (1 core,
    observed round 4) the accumulation eventually segfaults LLVM inside a
    later large mesh compile (test_tp [2-2-2]) even with >100 GB RAM free.
    Per-module clearing bounds the live-executable set; re-compiles within
    a module are unaffected."""
    yield
    import jax

    jax.clear_caches()


def needs_cores(n: int, what: str = "heavy-geometry mesh collectives"):
    """skipif marker for tests whose 8-virtual-device programs are too heavy
    for very small hosts: with fewer usable cores than ``n``, the devices'
    time-sliced compute staggers XLA:CPU collective rendezvous beyond any
    sane timeout and the runtime SIGABRTs (not a correctness failure)."""
    import pytest

    return pytest.mark.skipif(
        usable_cpus() < n,
        reason=f"{what}: needs >= {n} usable cores "
        f"(have {usable_cpus()}); XLA:CPU rendezvous would stagger-abort",
    )
