"""Mesh construction.

Replaces the reference's torchrun/NCCL process-group init
(``/root/reference/hydragen/utils.py:87-133``): under JAX's single-controller
model there is no rank plumbing — one host program builds a ``Mesh`` over all
addressable devices and every jitted program is automatically SPMD over it.

Axes:
- ``dp``: data parallel — unique-batch rows are sharded; no communication.
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
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(dp, tp)`` mesh.

    On multi-host slices call ``jax.distributed.initialize()`` first; this
    uses all addressable+global devices like any pjit program. The ``tp``
    axis should map to ICI (fastest-varying) — `jax.devices()` order already
    places same-host/ICI neighbours adjacently, and we keep ``tp`` minor.
    """
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
