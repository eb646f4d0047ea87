"""Mesh construction.

Replaces the reference's torchrun/NCCL process-group init
(``/root/reference/hydragen/utils.py:87-133``): under JAX's single-controller
model there is no rank plumbing — one host program builds a ``Mesh`` over all
addressable devices and every jitted program is automatically SPMD over it.

Axes:
- ``dp``: data parallel — unique-batch rows are sharded; no communication.
- ``sp``: sequence parallel over the *shared-prefix* KV — each shard holds a
  slice of the prefix sequence and attends to it locally; partials merge via
  the same LSE math as ``combine_lse`` ("distributed split-K", SURVEY.md §5).
  The reference has no equivalent (its long context lives on one TP group).
- ``tp``: tensor parallel — attention heads / MLP channels are sharded;
  GSPMD inserts the per-layer all-reduces (the reference's tp.py:84-112
  hooks) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(dp, sp, tp)`` mesh.

    On multi-host slices call ``jax.distributed.initialize()`` first; this
    uses all addressable+global devices like any pjit program. The ``tp``
    axis should map to ICI (fastest-varying) — `jax.devices()` order already
    places same-host/ICI neighbours adjacently, and we keep ``tp`` minor.
    """
    if devices is None:
        devices = jax.devices()
    n = tp * dp * sp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))
