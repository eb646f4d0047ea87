"""Benchmark timing for TPU.

Counterpart of the reference's CUDA-event timing
(/root/reference/hydragen/benchmark_utils.py:82-170). On TPU there are no
CUDA events or graphs: dispatch is async, so each measured call is fenced by
materializing its result on the host (``jax.block_until_ready`` alone is not
sufficient over remote-device transports, where readiness can be reported
before execution completes — a host readback is the only reliable fence).
``timed_with_graphs`` has no analogue: jit already gives replay semantics.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np


def _fence(out) -> None:
    """Force real completion: block, then read one element back to the host.

    TPU programs execute in order per device, so a host readback of (part of)
    the last result fences everything enqueued before it.
    """
    out = jax.block_until_ready(out)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            np.asarray(jax.numpy.ravel(leaf)[:1])
            break


def timed_scanned(
    op: Callable,
    args: tuple,
    num_iters: int = 100,
    perturb_idx: int = 0,
) -> float:
    """Seconds per call of ``op(*args)``, measured inside one jitted
    ``lax.scan`` — the only reliable way to time sub-millisecond ops through
    a remote-device transport whose per-dispatch round-trip dwarfs them.

    The perturbed input defeats loop-invariant hoisting/CSE; the fixed
    dispatch cost cancels by differencing a 1x and an (N+1)x run.
    """
    import jax.numpy as jnp

    base = args[perturb_idx]

    def many(n):
        @jax.jit
        def run(args, epss):
            def body(carry, eps):
                a = list(args)
                a[perturb_idx] = a[perturb_idx] + eps
                out = op(*a)
                # Consume EVERY output element: folding only out[0] into the
                # carry lets XLA dead-code-eliminate most of a fused op (a
                # matmul collapses to one dot-product row), reporting absurd
                # rates. A full reduce forces materialization; its own cost
                # appears in both the 1x and Nx runs and cancels.
                acc = carry
                for leaf in jax.tree.leaves(out):
                    if leaf.size:
                        acc = acc + jnp.sum(leaf.astype(jnp.float32))
                return acc, None

            s, _ = jax.lax.scan(body, jnp.float32(0), epss)
            return s

        epss = jnp.zeros((n,) + (1,) * (base.ndim), base.dtype)
        _fence(run(args, epss))  # compile + warm
        t0 = time.perf_counter()
        _fence(run(args, epss))
        return time.perf_counter() - t0

    t1 = many(1)
    tn = many(num_iters + 1)
    return max((tn - t1) / num_iters, 0.0)


def timed(
    fn: Callable,
    num_iters: int = 10,
    num_warmup: int = 3,
    between_fn: Optional[Callable] = None,
) -> Tuple[List[float], List[float]]:
    """Time ``fn`` -> (times, warmup_times), seconds per call.

    Mirrors the reference's ``timed`` signature (benchmark_utils.py:82-137):
    warmup calls are timed separately; ``between_fn`` runs between iterations
    (untimed) — the reference uses it to flush the L2 cache, here it can
    reset caches or devices.
    """
    warmup_times = []
    for _ in range(num_warmup):
        t0 = time.perf_counter()
        _fence(fn())
        warmup_times.append(time.perf_counter() - t0)

    times = []
    for _ in range(num_iters):
        if between_fn is not None:
            _fence(between_fn())
        t0 = time.perf_counter()
        _fence(fn())
        times.append(time.perf_counter() - t0)
    return times, warmup_times
