"""Small utilities (counterpart of /root/reference/hydragen/utils.py:13-34)."""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def rdiff(a, b) -> float:
    """Mean symmetric relative difference — the reference's test metric
    (utils.py:13-18)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float((2 * np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-9)).mean())


def mean(xs: Sequence[float]) -> float:
    return sum(xs) / len(xs)


def std(xs: Sequence[float]) -> float:
    m = mean(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / len(xs))


dtype_map = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}
