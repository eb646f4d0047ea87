"""Persistent-compilation-cache enablement, guarded by platform.

The cache exists for the TPU (first compile of a scanned decode loop runs
1-3 minutes; cached reruns are seconds). It must NOT be enabled for
XLA:CPU: CPU executables are AOT machine code keyed without the host's
microarchitecture, so a cache populated on one machine SIGILL/SIGSEGVs on
another (observed: the full test suite segfaulted inside device_put after
a script test enabled the cache process-wide and later tests hit entries
compiled on a previous session's host — cpu_aot_loader warns
"+prefer-no-scatter is not supported on the host machine ... could lead
to execution errors such as SIGILL" and then dies).
"""

from __future__ import annotations

import os

import jax

CACHE_DIR = "/root/repo/.jax_cache"


def enable_compile_cache() -> bool:
    """Enable the persistent cache unless running on XLA:CPU. Platform is
    read from config/env (not jax.default_backend(), which would block on
    the remote-TPU tunnel probe at import time)."""
    plat = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    if (plat or "").split(",")[0].strip() == "cpu":
        return False
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
