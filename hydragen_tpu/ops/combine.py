"""Exact merge of partial attention results via log-sum-exp weights.

TPU-native counterpart of the reference's combine op
(``/root/reference/hydragen/attention.py:21-174``): given attentions computed
separately over disjoint KV sets (e.g. shared prefix levels + unique suffix),
produce the attention over the union, exactly.

Math: for partials ``o_i`` with ``lse_i``,
    ``o = sum_i exp(lse_i - max_j lse_j) * o_i / sum_i exp(lse_i - max_j lse_j)``

The default path is plain ``jnp`` — XLA fuses this elementwise reduction into
a single VPU pass, so unlike the CUDA reference no hand-written kernel is
needed for the standalone op. A fused in-kernel merge variant lives in the
cached decode kernel (``ops/decode.py``) where it saves an HBM round-trip.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def combine_lse(outs: Sequence[jax.Array], lses: Sequence[jax.Array]):
    """Merge N partial attention results.

    Args:
        outs: list of ``[batch, seq, heads, dim]`` partial attention outputs.
        lses: list of matching ``[batch, seq, heads]`` log-sum-exps (float32;
            ``-inf`` marks a fully-masked row which then contributes nothing).

    Returns:
        ``[batch, seq, heads, dim]`` merged output in ``outs[0].dtype``.
    """
    assert len(outs) == len(lses) and len(outs) > 0
    if len(outs) == 1:
        return outs[0]

    # No jnp.stack: stacking forces each partial to materialize an f32 copy
    # in HBM before the reduction (profiled as per-layer layout-copy stalls
    # in the 7B decode step); pairwise elementwise ops fuse end-to-end.
    lses = [l.astype(jnp.float32) for l in lses]
    max_lse = lses[0]
    for l in lses[1:]:
        max_lse = jnp.maximum(max_lse, l)
    # Guard fully-masked rows (all -inf) so exp(-inf - -inf) never NaNs.
    max_safe = jnp.maximum(max_lse, -1e30)
    weights = [jnp.exp(l - max_safe) for l in lses]
    denom = weights[0]
    for w in weights[1:]:
        denom = denom + w
    denom = jnp.where(denom == 0.0, 1.0, denom)

    merged = outs[0].astype(jnp.float32) * weights[0][..., None]
    for o, w in zip(outs[1:], weights[1:]):
        merged = merged + o.astype(jnp.float32) * w[..., None]
    return (merged / denom[..., None]).astype(outs[0].dtype)


def combine_lse_with_stats(outs: Sequence[jax.Array], lses: Sequence[jax.Array]):
    """Like ``combine_lse`` but also returns the merged lse.

    Used when the merged result is itself a partial (e.g. combining across a
    context-sharded mesh axis after a local combine).
    """
    merged = combine_lse(outs, lses)
    lse_stack = jnp.stack([l.astype(jnp.float32) for l in lses])
    max_lse = jnp.max(lse_stack, axis=0)
    max_safe = jnp.maximum(max_lse, -1e30)
    total = jnp.sum(jnp.exp(lse_stack - max_safe[None]), axis=0)
    new_lse = jnp.where(total == 0.0, -jnp.inf, max_safe + jnp.log(jnp.where(total == 0.0, 1.0, total)))
    return merged, new_lse
