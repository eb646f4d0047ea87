"""Functional KV caches: unique per-sequence cache + stack of shared levels.

TPU-native re-design of the reference's mutable cache modules
(``SharedCache`` /root/reference/hydragen/llama.py:58-170 and
``PerLayerKVCache`` llama.py:173-346):

- One pytree holds *all* layers (leading ``L`` dim) so the model can
  ``lax.scan`` over layers and the whole decode step jits into one program.
- Layout is ``[L, B, hkv, S, hd]`` (BHSD): TPU HBM tiling packs the last two
  dims into (sublane, lane) tiles, so keeping ``(seq, head_dim)`` innermost
  avoids padding small GQA/MQA head counts to 8 sublanes (up to 8x HBM waste
  in a ``[.., S, hkv, hd]`` layout).
- Shared levels use padded buffers + ``seq_lens`` instead of the reference's
  flat-packed varlen layout — static shapes are what XLA wants, and the
  attention kernels skip fully-padded KV blocks.
- All updates are functional (``cache2 = fill(cache, ...)``); under jit the
  buffers are donated so updates are in-place in HBM.
- The "stack discipline" (``num_used_shared_caches`` push/pop,
  llama.py:223-234,335-346) lives on the *host* in the engine: the number of
  active levels is a static specialization key, exactly like the reference's
  CUDA-graph recapture conditions (llama.py:797-810).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class SharedLevel(NamedTuple):
    """One level of the shared-prefix hierarchy, all layers stacked.

    k, v: ``[L, sb, hkv, S, hd]`` right-padded KV.
    seq_lens: ``[sb]`` int32 true prefix lengths (shared across layers).
    """

    k: jax.Array
    v: jax.Array
    seq_lens: jax.Array

    @property
    def max_batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]


class KVCache(NamedTuple):
    """Full cache state: unique cache + allocated shared levels.

    unique_k, unique_v: ``[L, B, hkv, U, hd]``.
    shared: tuple of allocated ``SharedLevel`` (static length; how many are
    *active* is tracked by the engine as a static int).
    """

    unique_k: jax.Array
    unique_v: jax.Array
    shared: Tuple[SharedLevel, ...]

    @property
    def max_unique_batch_size(self) -> int:
        return self.unique_k.shape[1]

    @property
    def max_unique_seq_len(self) -> int:
        return self.unique_k.shape[3]


def allocate_cache(
    num_layers: int,
    max_unique_batch_size: int,
    max_unique_seq_length: int,
    max_shared_batch_sizes: Sequence[int],
    max_shared_seq_lengths: Sequence[int],
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    """Allocate zeroed cache buffers (mirrors setup_caches, llama.py:921-955)."""
    assert len(max_shared_batch_sizes) == len(max_shared_seq_lengths)
    uk = jnp.zeros(
        (num_layers, max_unique_batch_size, num_kv_heads, max_unique_seq_length, head_dim),
        dtype=dtype,
    )
    uv = jnp.zeros_like(uk)
    shared = tuple(
        SharedLevel(
            k=jnp.zeros((num_layers, sb, num_kv_heads, sl, head_dim), dtype=dtype),
            v=jnp.zeros((num_layers, sb, num_kv_heads, sl, head_dim), dtype=dtype),
            seq_lens=jnp.zeros((sb,), dtype=jnp.int32),
        )
        for sb, sl in zip(max_shared_batch_sizes, max_shared_seq_lengths)
    )
    return KVCache(unique_k=uk, unique_v=uv, shared=shared)


def shared_len_for_batch(
    cache: KVCache, num_used_levels: int, batch_size: int
) -> jax.Array:
    """Total shared-prefix length per sequence, ``[batch_size]`` int32.

    Mirrors ``PerLayerKVCache.get_shared_len`` (llama.py:317-330): each
    level's per-prefix lengths are broadcast (repeat-interleaved) up to the
    final batch size and summed.
    """
    total = jnp.zeros((batch_size,), dtype=jnp.int32)
    for level in cache.shared[:num_used_levels]:
        sb = level.max_batch_size
        assert batch_size % sb == 0, f"{batch_size} % {sb} != 0"
        total = total + jnp.repeat(
            level.seq_lens, batch_size // sb, total_repeat_length=batch_size
        )
    return total


def fill_shared_level(
    cache: KVCache,
    level_idx: int,
    k: jax.Array,
    v: jax.Array,
    seq_lens: jax.Array,
) -> KVCache:
    """Write a freshly-prefilled level (``SharedCache.fill``, llama.py:120-167).

    k, v: ``[L, sb, hkv, t, hd]`` — all layers of the new level's KV.
    seq_lens: ``[sb]`` true lengths (padding beyond is ignored by masking).
    """
    level = cache.shared[level_idx]
    sb, t = k.shape[1], k.shape[3]
    assert sb <= level.max_batch_size and t <= level.max_seq_len, (
        f"level {level_idx}: got [{sb},{t}] max [{level.max_batch_size},{level.max_seq_len}]"
    )
    new_k = jax.lax.dynamic_update_slice(
        level.k, k.astype(level.k.dtype), (0, 0, 0, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        level.v, v.astype(level.v.dtype), (0, 0, 0, 0, 0)
    )
    new_lens = level.seq_lens.at[:sb].set(seq_lens.astype(jnp.int32))
    new_level = SharedLevel(k=new_k, v=new_v, seq_lens=new_lens)
    shared = tuple(
        new_level if i == level_idx else lv for i, lv in enumerate(cache.shared)
    )
    return cache._replace(shared=shared)


def update_unique_prefill(cache: KVCache, k: jax.Array, v: jax.Array) -> KVCache:
    """Write prefill KVs at unique positions ``[0, t)`` for rows ``[0, b)``.

    k, v: ``[L, b, hkv, t, hd]``. Unique prefill always starts at position 0
    (the unique cache is fresh), so this is a contiguous block update — far
    cheaper than the reference's general scatter (llama.py:236-262).
    """
    new_k = jax.lax.dynamic_update_slice(
        cache.unique_k, k.astype(cache.unique_k.dtype), (0, 0, 0, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        cache.unique_v, v.astype(cache.unique_v.dtype), (0, 0, 0, 0, 0)
    )
    return cache._replace(unique_k=new_k, unique_v=new_v)


def update_unique_decode(
    cache: KVCache,
    positions: jax.Array,
    k: jax.Array,
    v: jax.Array,
    uniform: bool = False,
) -> KVCache:
    """Write one decode-step token per row at per-row ``positions``.

    positions: ``[b]`` int (may differ across rows when suffix lens are
    ragged). k, v: ``[L, b, hkv, 1, hd]``.

    ``uniform=True`` (static) asserts all rows share ``positions[0]`` — the
    common case (non-ragged suffixes) — and lowers to a contiguous
    ``dynamic_update_slice`` touching only the new token's bytes. The general
    per-row scatter rewrites whole cache tiles and measures ~100x slower on
    TPU, so the engine tracks raggedness and picks the path statically.
    """
    if uniform:
        new_k = jax.lax.dynamic_update_slice(
            cache.unique_k, k.astype(cache.unique_k.dtype),
            (0, 0, 0, positions[0], 0),
        )
        new_v = jax.lax.dynamic_update_slice(
            cache.unique_v, v.astype(cache.unique_v.dtype),
            (0, 0, 0, positions[0], 0),
        )
        return cache._replace(unique_k=new_k, unique_v=new_v)

    b = k.shape[1]
    rows = jnp.arange(b)
    # Advanced indices on dims (1, 3) with slices between: result dims are
    # moved to the front, so the value must be [b, L, hkv, hd].
    val_k = k[:, :, :, 0].transpose(1, 0, 2, 3)
    val_v = v[:, :, :, 0].transpose(1, 0, 2, 3)
    new_k = cache.unique_k.at[:, rows, :, positions].set(
        val_k.astype(cache.unique_k.dtype)
    )
    new_v = cache.unique_v.at[:, rows, :, positions].set(
        val_v.astype(cache.unique_v.dtype)
    )
    return cache._replace(unique_k=new_k, unique_v=new_v)


def repeat_unique_for_samples(
    cache: KVCache, current_size: int, num_samples: int
) -> KVCache:
    """repeat_interleave rows [0:current_size] -> [0:current_size*num_samples].

    Mirrors ``repeat_per_completion_cache_for_num_samples`` (llama.py:300-312).
    """
    if num_samples == 1:
        return cache
    rep_k = jnp.repeat(cache.unique_k[:, :current_size], num_samples, axis=1)
    rep_v = jnp.repeat(cache.unique_v[:, :current_size], num_samples, axis=1)
    new_k = jax.lax.dynamic_update_slice(
        cache.unique_k, rep_k.astype(cache.unique_k.dtype), (0, 0, 0, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        cache.unique_v, rep_v.astype(cache.unique_v.dtype), (0, 0, 0, 0, 0)
    )
    return cache._replace(unique_k=new_k, unique_v=new_v)


def copy_shared_to_unique(cache: KVCache, total_num_sequences: int) -> KVCache:
    """Materialize the single shared level into every row of the unique cache.

    For the no-hydragen (FlashAttention) baseline (llama.py:264-298). The
    shared KV (level 0) is repeated per-sequence and written at the *front*
    of the unique cache; subsequent unique positions follow it (the engine
    offsets positions accordingly when hydragen is disabled).
    """
    level = cache.shared[0]
    sb = level.max_batch_size
    assert total_num_sequences % sb == 0
    rep = total_num_sequences // sb
    S = level.max_seq_len
    k_rep = jnp.repeat(level.k, rep, axis=1)  # [L, total, hkv, S, hd]
    v_rep = jnp.repeat(level.v, rep, axis=1)
    new_k = cache.unique_k.at[:, :total_num_sequences, :, :S].set(
        k_rep.astype(cache.unique_k.dtype)
    )
    new_v = cache.unique_v.at[:, :total_num_sequences, :, :S].set(
        v_rep.astype(cache.unique_v.dtype)
    )
    return cache._replace(unique_k=new_k, unique_v=new_v)
