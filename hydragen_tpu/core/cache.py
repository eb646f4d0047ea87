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
- Optional **int8 KV quantization**: payloads stored int8 with per-(token,
  head) fp32 scales (``k_scale``/``v_scale`` arrays, None when disabled);
  writers quantize, readers dequantize fused into the attention matmul.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.quant import quantize_kv, quantize_kv4


def _maybe_quantize(x: jax.Array, quantized: bool, bits: int = 8):
    """-> (payload, scale|None) in the cache's storage format.

    ``bits=4`` returns UNPACKED int4 values (quantize_kv4) with the same
    per-(token, head) scale count as int8; the token-planar nibble packing
    happens in the write paths below."""
    if quantized:
        return quantize_kv4(x) if bits == 4 else quantize_kv(x)
    return x, None


class SharedLevel(NamedTuple):
    """One level of the shared-prefix hierarchy, all layers stacked.

    k, v: ``[L, sb, hkv, S, hd]`` right-padded KV (storage dtype; int8 when
    quantized). k_scale, v_scale: ``[L, sb, hkv, S]`` f32 or None.
    seq_lens: ``[sb]`` int32 true prefix lengths (shared across layers).
    """

    k: jax.Array
    v: jax.Array
    seq_lens: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KVCache:
    """Full cache state: unique cache + allocated shared levels.

    unique_k, unique_v: ``[L, B, hkv, U, hd]`` (BHSD, default) or
    ``[L, B, U, hkv, hd]`` (BSHD) when ``unique_bshd`` — see allocate_cache.
    unique_k_scale, unique_v_scale: matching layout minus ``hd``, f32 | None.
    shared: tuple of allocated ``SharedLevel`` (static length; how many are
    *active* is tracked by the engine as a static int).

    ``unique_bshd`` is pytree *aux data* (a static jit key, not a traced
    leaf), so every reader/writer can branch on the layout at trace time.
    """

    unique_k: jax.Array
    unique_v: jax.Array
    shared: Tuple[SharedLevel, ...]
    unique_k_scale: Optional[jax.Array] = None
    unique_v_scale: Optional[jax.Array] = None
    unique_bshd: bool = False
    # int8-KV scales stored flat lane-major ``[L, B, S*hkv]`` (token-major,
    # head-minor) instead of ``[L, B, S, hkv]``: the 4D layout pads hkv up
    # to the 128-lane tile (4x scale HBM traffic at hkv=32) and the flat
    # order is exactly the score-column order of the Pallas decode kernel
    # (ops/decode.py). Off under a mesh: the head dim must stay shardable.
    flat_scales: bool = False
    # Unique payload precision when quantized: 8 (int8) or 4 (int4 packed
    # two tokens per byte along the TOKEN axis — byte row j holds token j
    # low / token j + S/2 high, so the payload's token dim is S/2 while
    # scales keep all S tokens). Static aux like the layout flags: readers
    # branch on it at trace time.
    unique_bits: int = 8

    def tree_flatten(self):
        return (
            (self.unique_k, self.unique_v, self.shared,
             self.unique_k_scale, self.unique_v_scale),
            (self.unique_bshd, self.flat_scales, self.unique_bits),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, unique_bshd=aux[0], flat_scales=aux[1],
                   unique_bits=aux[2])

    def _replace(self, **kw) -> "KVCache":
        return dataclasses.replace(self, **kw)

    @property
    def max_unique_batch_size(self) -> int:
        return self.unique_k.shape[1]

    @property
    def max_unique_seq_len(self) -> int:
        """LOGICAL token capacity (int4 stores two tokens per byte row)."""
        rows = self.unique_k.shape[2 if self.unique_bshd else 3]
        return rows * 2 if self.unique_bits == 4 else rows

    @property
    def quantized(self) -> bool:
        return self.unique_k_scale is not None


def allocate_cache(
    num_layers: int,
    max_unique_batch_size: int,
    max_unique_seq_length: int,
    max_shared_batch_sizes: Sequence[int],
    max_shared_seq_lengths: Sequence[int],
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    unique_bshd: Optional[bool] = None,
    flat_scales: Optional[bool] = None,
    shared_quantized: Optional[bool] = None,
    unique_bits: int = 8,
) -> KVCache:
    """Allocate zeroed cache buffers (mirrors setup_caches, llama.py:921-955).

    ``unique_bshd``: store the unique cache ``[L, B, U, hkv, hd]`` (token dim
    OUT of the HBM tile) instead of ``[L, B, hkv, U, hd]``. A single-token
    decode write into a (seq, hd)-tiled buffer read-modify-writes a whole
    32-token int8 tile per (row, head) — ~5 ms/step at 7B batch 256; with
    (hkv, hd) innermost the write is tile-exact. Auto (None): on iff one
    token's KV fills whole tiles (``hkv * hd * itemsize % 4096 == 0`` — MHA;
    GQA head counts would pad sublanes up to 4x and stay BHSD).

    ``shared_quantized`` (None = follow ``quantized``): quantize the shared
    levels independently of the unique cache. The shared prefix is stored
    ONCE and read once per step regardless of batch, so int8 buys it little
    bandwidth while its dequant commute costs a VPU pass per score at every
    read — ``kv_quant="int8", shared bf16`` is the fast AND more exact
    configuration at long prefixes (decode there is VPU-softmax-bound).
    """
    assert len(max_shared_batch_sizes) == len(max_shared_seq_lengths)
    assert unique_bits in (8, 4) and (unique_bits == 8 or quantized)
    store_dtype = jnp.int8 if quantized else dtype
    itemsize = 1 if quantized else jnp.dtype(dtype).itemsize
    if unique_bits == 4:
        # Token-planar nibble pack (quantize_kv4): byte row j holds token j
        # (low nibble) and token j + S/2 (high) — the TOKEN dim halves and
        # head_dim stays 128-lane exact. Keep S even for the plane split.
        max_unique_seq_length = -(-max_unique_seq_length // 2) * 2
    unique_ps = (
        max_unique_seq_length // 2 if unique_bits == 4
        else max_unique_seq_length
    )
    if unique_bshd is None:
        unique_bshd = (num_kv_heads * head_dim * itemsize) % 4096 == 0
    if flat_scales is None:
        flat_scales = unique_bshd and quantized
    flat_scales = bool(flat_scales and unique_bshd and quantized)
    if shared_quantized is None:
        shared_quantized = quantized

    def bufs(b, s, bshd=False, flat=False, quant=quantized, ps=None):
        # ps: payload seq length when packed (int4: s // 2); scales always
        # cover the full logical s tokens.
        ps = s if ps is None else ps
        shape = (
            (num_layers, b, ps, num_kv_heads, head_dim) if bshd
            else (num_layers, b, num_kv_heads, ps, head_dim)
        )
        k = jnp.zeros(shape, dtype=jnp.int8 if quant else dtype)
        if quant:
            if flat:
                sshape = (num_layers, b, s * num_kv_heads)
            elif bshd:
                sshape = (num_layers, b, s, num_kv_heads)
            else:
                sshape = (num_layers, b, num_kv_heads, s)
            sc = jnp.zeros(sshape, dtype=jnp.float32)
        else:
            sc = None
        return k, jnp.zeros_like(k), sc, (None if sc is None else jnp.zeros_like(sc))

    uk, uv, uks, uvs = bufs(max_unique_batch_size, max_unique_seq_length,
                            bshd=unique_bshd, flat=flat_scales, ps=unique_ps)
    shared = tuple(
        SharedLevel(
            k=b[0], v=b[1], k_scale=b[2], v_scale=b[3],
            seq_lens=jnp.zeros((sb,), dtype=jnp.int32),
        )
        for sb, sl in zip(max_shared_batch_sizes, max_shared_seq_lengths)
        for b in (bufs(sb, sl, quant=shared_quantized),)
    )
    return KVCache(
        unique_k=uk, unique_v=uv, shared=shared,
        unique_k_scale=uks, unique_v_scale=uvs, unique_bshd=unique_bshd,
        flat_scales=flat_scales, unique_bits=unique_bits,
    )


def shared_len_for_batch(
    cache: KVCache, num_used_levels: int, batch_size: int,
    batch_sizes: Sequence[int] | None = None,
) -> jax.Array:
    """Total shared-prefix length per sequence, ``[batch_size]`` int32.

    Mirrors ``PerLayerKVCache.get_shared_len`` (llama.py:317-330): each
    level's per-prefix lengths are broadcast (repeat-interleaved) up to the
    final batch size and summed. ``batch_sizes`` gives each level's *filled*
    prefix count when smaller than allocated (SharedCache.fill accepts
    bs < max_batch_size, llama.py:120-167).
    """
    total = jnp.zeros((batch_size,), dtype=jnp.int32)
    for i, level in enumerate(cache.shared[:num_used_levels]):
        sb = batch_sizes[i] if batch_sizes else level.max_batch_size
        assert batch_size % sb == 0, f"{batch_size} % {sb} != 0"
        total = total + jnp.repeat(
            level.seq_lens[:sb], batch_size // sb, total_repeat_length=batch_size
        )
    return total


def _block_update(buf, val, start_idx):
    return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), start_idx)


def _nibble_rmw(buf, q4_val, idx, is_hi, old=None):
    """Write one decode token's int4 values as a NIBBLE of the byte row at
    ``idx`` (shape = q4_val.shape): the low-plane write clears the masked
    stale partner outright; the high-plane write merges over the live
    low-plane partner via a one-byte-row read. Shared by the batch-level
    and per-layer in-place decode write paths — keep them in lock-step.

    ``old`` lets the caller supply the byte row's current value (the TPU
    in-place path reads it through ops.decode.gather_token_row_cached — an
    XLA dynamic-slice here skews the whole buffer's layout assignment, see
    that kernel's docstring); default is the plain dynamic-slice."""
    if old is None:
        old = jax.lax.dynamic_slice(buf, idx, q4_val.shape)
    o32, q32 = old.astype(jnp.int32), q4_val.astype(jnp.int32)
    new = jnp.where(is_hi, (o32 & 0xF) | (q32 << 4), q32 & 0xF)
    return jax.lax.dynamic_update_slice(buf, new.astype(jnp.int8), idx)


def fill_shared_level(
    cache: KVCache,
    level_idx: int,
    k: jax.Array,
    v: jax.Array,
    seq_lens: jax.Array,
) -> KVCache:
    """Write a freshly-prefilled level (``SharedCache.fill``, llama.py:120-167).

    k, v: ``[L, sb, hkv, t, hd]`` — all layers of the new level's KV (compute
    dtype; quantized here if the cache stores int8), or pre-quantized
    ``(payload, scale)`` tuples from the in-scan quantization path
    (model_forward ``quantize_new_kv`` — avoids the stacked bf16 transient
    at long prefills).
    seq_lens: ``[sb]`` true lengths (padding beyond is ignored by masking).
    """
    level = cache.shared[level_idx]
    if isinstance(k, tuple):
        assert level.quantized
        (kq, ks), (vq, vs) = k, v
    else:
        kq, ks = _maybe_quantize(k, level.quantized)
        vq, vs = _maybe_quantize(v, level.quantized)
    sb, t = kq.shape[1], kq.shape[3]
    assert sb <= level.max_batch_size and t <= level.max_seq_len, (
        f"level {level_idx}: got [{sb},{t}] max [{level.max_batch_size},{level.max_seq_len}]"
    )
    zeros5 = (0, 0, 0, 0, 0)
    new_level = level._replace(
        k=_block_update(level.k, kq, zeros5),
        v=_block_update(level.v, vq, zeros5),
        k_scale=None if ks is None else _block_update(level.k_scale, ks, zeros5[:4]),
        v_scale=None if vs is None else _block_update(level.v_scale, vs, zeros5[:4]),
        seq_lens=level.seq_lens.at[:sb].set(seq_lens.astype(jnp.int32)),
    )
    shared = tuple(
        new_level if i == level_idx else lv for i, lv in enumerate(cache.shared)
    )
    return cache._replace(shared=shared)


def set_shared_level_buffers(
    cache: KVCache,
    level_idx: int,
    k: jax.Array,
    v: jax.Array,
    k_scale: Optional[jax.Array],
    v_scale: Optional[jax.Array],
    seq_lens: jax.Array,
) -> KVCache:
    """Install fully-updated level buffers returned by the in-scan fill path
    (model_forward ``fill_level`` — the layer scan wrote each layer's new KV
    straight into the donated buffers, so no stacked new-KV array ever
    existed; see fill_shared_level for the stacked-path counterpart)."""
    level = cache.shared[level_idx]
    assert k.shape == level.k.shape and v.shape == level.v.shape
    sb = seq_lens.shape[0]
    new_level = level._replace(
        k=k, v=v, k_scale=k_scale, v_scale=v_scale,
        seq_lens=level.seq_lens.at[:sb].set(seq_lens.astype(jnp.int32)),
    )
    shared = tuple(
        new_level if i == level_idx else lv for i, lv in enumerate(cache.shared)
    )
    return cache._replace(shared=shared)


def update_unique_prefill(
    cache: KVCache,
    k: jax.Array,
    v: jax.Array,
    start: jax.Array | int = 0,
    row_start: jax.Array | int = 0,
) -> KVCache:
    """Write prefill KVs at unique positions ``[start, start+t)`` for rows
    ``[row_start, row_start+b)``.

    k, v: ``[L, b, hkv, t, hd]``. ``start`` is 0 for normal unique prefill
    (fresh cache => contiguous block update, far cheaper than the reference's
    general scatter, llama.py:236-262); the disable_hydragen baseline passes
    the copied shared length. ``row_start`` targets a row slot for
    continuous-batching admission. k/v may be pre-quantized
    ``(payload, scale)`` tuples (in-scan quantization, see
    fill_shared_level).
    """
    if isinstance(k, tuple):
        assert cache.quantized
        (kq, ks), (vq, vs) = k, v
    else:
        kq, ks = _maybe_quantize(k, cache.quantized, cache.unique_bits)
        vq, vs = _maybe_quantize(v, cache.quantized, cache.unique_bits)
    L, bb, hkv, t = kq.shape[:4]
    if cache.unique_bits == 4:
        # Token-planar nibble pack: byte row j <- (token j low, token
        # j + Sp high). Prefill must start at 0 — partner nibbles inside
        # the range combine directly; below the boundary the stale high
        # nibble is cleared (those logical tokens are masked until their
        # own write arrives). The disable_hydragen path (traced start) is
        # rejected at the engine.
        assert isinstance(start, int) and start == 0, (
            "int4 unique KV requires prefill at position 0"
        )
        sp = cache.unique_k.shape[2 if cache.unique_bshd else 3]
        assert t <= 2 * sp, (t, sp)

        def pack_t(q4):  # [L, b, hkv, t, hd] -> [L, b, hkv, rows, hd]
            q32 = q4.astype(jnp.int32)
            rows = min(t, sp)
            lo = q32[:, :, :, :rows] & 0xF
            if t > sp:
                both = lo[:, :, :, : t - sp] | (q32[:, :, :, sp:] << 4)
                lo = jnp.concatenate([both, lo[:, :, :, t - sp:]], axis=3)
            return lo.astype(jnp.int8)

        # NB: payloads now span min(t, sp) byte ROWS; the scales keep the
        # full t logical tokens — every reshape below must use their own
        # array shapes, not a shared token count.
        kq, vq = pack_t(kq), pack_t(vq)
    if cache.unique_bshd:
        idx = (0, row_start, start, 0, 0)
        kq, vq = kq.transpose(0, 1, 3, 2, 4), vq.transpose(0, 1, 3, 2, 4)
        if ks is not None:
            if cache.flat_scales:
                # [L, b, hkv, t] -> token-major head-minor [L, b, t*hkv].
                sidx = (0, row_start, start * hkv)
                ks = ks.transpose(0, 1, 3, 2).reshape(L, bb, -1)
                vs = vs.transpose(0, 1, 3, 2).reshape(L, bb, -1)
            else:
                sidx = idx[:4]
                ks, vs = ks.transpose(0, 1, 3, 2), vs.transpose(0, 1, 3, 2)
    else:
        idx = (0, row_start, 0, start, 0)
        sidx = idx[:4]
    return cache._replace(
        unique_k=_block_update(cache.unique_k, kq, idx),
        unique_v=_block_update(cache.unique_v, vq, idx),
        unique_k_scale=None if ks is None else _block_update(cache.unique_k_scale, ks, sidx),
        unique_v_scale=None if vs is None else _block_update(cache.unique_v_scale, vs, sidx),
    )


def update_unique_decode(
    cache: KVCache,
    positions: jax.Array,
    k: jax.Array,
    v: jax.Array,
    uniform: bool = False,
    gather_kernel: bool = False,
) -> KVCache:
    """Write one decode-step token per row at per-row ``positions``.

    positions: ``[b]`` int (may differ across rows when suffix lens are
    ragged). k, v: ``[L, b, hkv, 1, hd]``.

    ``uniform=True`` (static) asserts all rows share ``positions[0]`` — the
    common case (non-ragged suffixes) — and lowers to a contiguous
    ``dynamic_update_slice`` touching only the new token's bytes. The general
    per-row scatter rewrites whole cache tiles on TPU, so the engine tracks
    raggedness and picks the path statically.

    ``gather_kernel`` (int4 BSHD on TPU): as in write_decode_token_layer —
    the nibble RMW's byte-row read goes through the Pallas row copy so the
    dynamic-slice cannot skew the whole buffer's layout assignment.
    """
    kq, ks = _maybe_quantize(k, cache.quantized, cache.unique_bits)
    vq, vs = _maybe_quantize(v, cache.quantized, cache.unique_bits)
    hkv = k.shape[2]

    if uniform:
        pos = positions[0]
        if cache.unique_bits == 4:
            # One decode token = one NIBBLE: byte row pos % Sp, low plane
            # for pos < Sp (the partner is a future token — its stale bits
            # are cleared; it is masked until written), high plane for
            # pos >= Sp (the partner token pos - Sp is live — combine with
            # a one-byte-row read).
            sdim = 2 if cache.unique_bshd else 3
            sp = cache.unique_k.shape[sdim]
            row = jnp.mod(pos, sp).astype(jnp.int32)
            is_hi = pos >= sp

            b = k.shape[1]

            def nibble_write(buf, q4):
                val = q4.transpose(0, 1, 3, 2, 4) if cache.unique_bshd else q4
                idx = (
                    (0, 0, row, 0, 0) if cache.unique_bshd
                    else (0, 0, 0, row, 0)
                )
                old = None
                if gather_kernel and cache.unique_bshd:
                    from hydragen_tpu.ops.decode import gather_token_row_cached

                    old = gather_token_row_cached(None, row, buf)[:, :b, None]
                return _nibble_rmw(buf, val, idx, is_hi, old=old)

            if cache.flat_scales:
                sidx = (0, 0, pos * hkv)
                ks, vs = ks[..., 0], vs[..., 0]  # [L, b, hkv]
            elif cache.unique_bshd:
                sidx = (0, 0, pos, 0)
                ks, vs = ks.transpose(0, 1, 3, 2), vs.transpose(0, 1, 3, 2)
            else:
                sidx = (0, 0, 0, pos)
            return cache._replace(
                unique_k=nibble_write(cache.unique_k, kq),
                unique_v=nibble_write(cache.unique_v, vq),
                unique_k_scale=_block_update(cache.unique_k_scale, ks, sidx),
                unique_v_scale=_block_update(cache.unique_v_scale, vs, sidx),
            )
        if cache.unique_bshd:
            idx = (0, 0, pos, 0, 0)
            kq, vq = kq.transpose(0, 1, 3, 2, 4), vq.transpose(0, 1, 3, 2, 4)
            if ks is not None:
                if cache.flat_scales:
                    sidx = (0, 0, pos * hkv)
                    ks, vs = ks[..., 0], vs[..., 0]  # [L, b, hkv]
                else:
                    sidx = idx[:4]
                    ks, vs = ks.transpose(0, 1, 3, 2), vs.transpose(0, 1, 3, 2)
        else:
            idx = (0, 0, 0, pos, 0)
            sidx = idx[:4]
        return cache._replace(
            unique_k=_block_update(cache.unique_k, kq, idx),
            unique_v=_block_update(cache.unique_v, vq, idx),
            unique_k_scale=None if ks is None else _block_update(cache.unique_k_scale, ks, sidx),
            unique_v_scale=None if vs is None else _block_update(cache.unique_v_scale, vs, sidx),
        )
    assert cache.unique_bits == 8, (
        "int4 unique KV supports only uniform decode positions (ragged "
        "suffix lengths / ring-pool windows need sub-byte scatters)"
    )

    b = k.shape[1]
    rows = jnp.arange(b)

    if cache.unique_bshd:
        # Advanced indices on ADJACENT dims (1, 2): result dims stay in
        # place — value is [L, b, hkv, hd].
        def scatter5(buf, val):
            return buf.at[:, rows, positions].set(
                val[:, :, :, 0].astype(buf.dtype)
            )

        if cache.flat_scales:
            # [L, B, S*hkv]: each row's token segment is hkv contiguous
            # lanes at positions[r]*hkv.
            def scatter4(buf, val):
                cols = positions[:, None] * hkv + jnp.arange(hkv)[None, :]
                return buf.at[:, rows[:, None], cols].set(val[:, :, :, 0])
        else:
            def scatter4(buf, val):
                return buf.at[:, rows, positions].set(
                    val[:, :, :, 0].astype(buf.dtype)
                )
    else:
        def scatter5(buf, val):
            # Advanced indices on dims (1, 3) with slices between: result
            # dims move to the front, so the value must be [b, L, hkv, hd].
            value = val[:, :, :, 0].transpose(1, 0, 2, 3)
            return buf.at[:, rows, :, positions].set(value.astype(buf.dtype))

        def scatter4(buf, val):
            value = val[:, :, :, 0].transpose(1, 0, 2)
            return buf.at[:, rows, :, positions].set(value.astype(buf.dtype))

    return cache._replace(
        unique_k=scatter5(cache.unique_k, kq),
        unique_v=scatter5(cache.unique_v, vq),
        unique_k_scale=None if ks is None else scatter4(cache.unique_k_scale, ks),
        unique_v_scale=None if vs is None else scatter4(cache.unique_v_scale, vs),
    )


def write_decode_token_layer(
    cache: KVCache, layer: int, k: jax.Array, v: jax.Array, slot: jax.Array,
    gather_kernel: bool = False,
) -> KVCache:
    """Write ONE layer's single decode token at a uniform ``slot``.

    k, v: ``[b, hkv, 1, hd]``. Used by the in-place decode path
    (models/llama.py): writing inside the (unrolled) layer loop avoids ever
    materializing the stacked ``[L, b, hkv, 1, hd]`` new-KV array — profiling
    the 7B decode step showed the stack + relayout + whole-cache
    dynamic-update-slice chain costing >15 ms/step at batch 256.

    ``gather_kernel`` (int4 BSHD on TPU): read the nibble RMW's byte row
    through the Pallas row copy instead of an XLA dynamic-slice — the
    slice's layout preference relayout-copied the whole cache at some
    buffer shapes (see ops.decode.gather_token_row_cached).
    """
    kq, ks = _maybe_quantize(k, cache.quantized, cache.unique_bits)
    vq, vs = _maybe_quantize(v, cache.quantized, cache.unique_bits)
    b, hkv = k.shape[0], k.shape[1]
    if cache.unique_bits == 4:
        # Same nibble discipline as update_unique_decode, one layer deep.
        sdim = 2 if cache.unique_bshd else 3
        sp = cache.unique_k.shape[sdim]
        row = jnp.mod(slot, sp).astype(jnp.int32)
        is_hi = slot >= sp

        def nibble_write(buf, q4):
            val = (q4.transpose(0, 2, 1, 3) if cache.unique_bshd else q4)[None]
            idx = (
                (layer, 0, row, 0, 0) if cache.unique_bshd
                else (layer, 0, 0, row, 0)
            )
            old = None
            if gather_kernel and cache.unique_bshd:
                from hydragen_tpu.ops.decode import gather_token_row_cached

                old = gather_token_row_cached(layer, row, buf)[:b][None, :, None]
            return _nibble_rmw(buf, val, idx, is_hi, old=old)

        if cache.flat_scales:
            sidx = (layer, 0, slot * hkv)
            ks, vs = ks[..., 0], vs[..., 0]  # [b, hkv]
        elif cache.unique_bshd:
            sidx = (layer, 0, slot, 0)
            ks, vs = ks.transpose(0, 2, 1), vs.transpose(0, 2, 1)
        else:
            sidx = (layer, 0, 0, slot)
        return cache._replace(
            unique_k=nibble_write(cache.unique_k, kq),
            unique_v=nibble_write(cache.unique_v, vq),
            unique_k_scale=_block_update(cache.unique_k_scale, ks[None], sidx),
            unique_v_scale=_block_update(cache.unique_v_scale, vs[None], sidx),
        )
    if cache.unique_bshd:
        idx = (layer, 0, slot, 0, 0)
        kq, vq = kq.transpose(0, 2, 1, 3), vq.transpose(0, 2, 1, 3)
        if ks is not None:
            if cache.flat_scales:
                sidx = (layer, 0, slot * hkv)
                ks, vs = ks[..., 0], vs[..., 0]  # [b, hkv]
            else:
                sidx = idx[:4]
                ks, vs = ks.transpose(0, 2, 1), vs.transpose(0, 2, 1)
    else:
        idx = (layer, 0, 0, slot, 0)
        sidx = idx[:4]
    return cache._replace(
        unique_k=_block_update(cache.unique_k, kq[None], idx),
        unique_v=_block_update(cache.unique_v, vq[None], idx),
        unique_k_scale=None if ks is None else _block_update(cache.unique_k_scale, ks[None], sidx[:3] if cache.flat_scales else sidx),
        unique_v_scale=None if vs is None else _block_update(cache.unique_v_scale, vs[None], sidx[:3] if cache.flat_scales else sidx),
    )


def repeat_unique_for_samples(
    cache: KVCache, current_size: int, num_samples: int
) -> KVCache:
    """repeat_interleave rows [0:current_size] -> [0:current_size*num_samples].

    Mirrors ``repeat_per_completion_cache_for_num_samples`` (llama.py:300-312).
    """
    if num_samples == 1:
        return cache

    def rep(buf):
        r = jnp.repeat(buf[:, :current_size], num_samples, axis=1)
        return jax.lax.dynamic_update_slice(buf, r, (0,) * buf.ndim)

    return cache._replace(
        unique_k=rep(cache.unique_k),
        unique_v=rep(cache.unique_v),
        unique_k_scale=None if cache.unique_k_scale is None else rep(cache.unique_k_scale),
        unique_v_scale=None if cache.unique_v_scale is None else rep(cache.unique_v_scale),
    )


def copy_shared_to_unique(
    cache: KVCache, total_num_sequences: int, sb: int | None = None
) -> KVCache:
    """Materialize the single shared level into every row of the unique cache.

    For the no-hydragen (FlashAttention) baseline (llama.py:264-298). The
    shared KV (level 0) is repeated per-sequence and written at the *front*
    of the unique cache; subsequent unique positions follow it (the engine
    offsets positions accordingly when hydragen is disabled). ``sb`` is the
    level's filled prefix count (defaults to allocated).
    """
    assert cache.unique_bits == 8, (
        "disable_hydragen (copy_shared_to_unique) is unsupported with int4 "
        "unique KV: the copied prefix would need traced-offset nibble packs"
    )
    level = cache.shared[0]
    if sb is None:
        sb = level.max_batch_size
    if sb != level.max_batch_size:
        level = level._replace(
            k=level.k[:, :sb], v=level.v[:, :sb],
            k_scale=None if level.k_scale is None else level.k_scale[:, :sb],
            v_scale=None if level.v_scale is None else level.v_scale[:, :sb],
            seq_lens=level.seq_lens[:sb],
        )
    assert total_num_sequences % sb == 0
    rep = total_num_sequences // sb
    S = level.max_seq_len

    def cp(dst, src):
        r = jnp.repeat(src, rep, axis=1)
        if cache.unique_bshd:
            if r.ndim == 4 and cache.flat_scales:
                # [L, B, hkv, S] -> [L, B, S*hkv] token-major head-minor.
                L_, B_, H_, S_ = r.shape
                flat = r.transpose(0, 1, 3, 2).reshape(L_, B_, S_ * H_)
                return dst.at[:, :total_num_sequences, : S_ * H_].set(flat)
            perm = (0, 1, 3, 2, 4) if r.ndim == 5 else (0, 1, 3, 2)
            return dst.at[:, :total_num_sequences, :S].set(
                r.transpose(perm).astype(dst.dtype)
            )
        return dst.at[:, :total_num_sequences, :, :S].set(r.astype(dst.dtype))

    def payload_and_scale(payload, scale):
        """Level buffers in the UNIQUE cache's storage format."""
        if cache.quantized and scale is None:
            # bf16 level -> int8 unique: quantize (amax over hd, dim -1 of
            # the BHSD [L, sb, hkv, S, hd] layout after moving hd last).
            return quantize_kv(payload)
        if not cache.quantized and scale is not None:
            # int8 level -> bf16 unique: dequantize.
            deq = (payload.astype(jnp.float32) * scale[..., None]).astype(
                cache.unique_k.dtype
            )
            return deq, None
        return payload, scale

    ck, cks = payload_and_scale(level.k, level.k_scale)
    cv, cvs = payload_and_scale(level.v, level.v_scale)

    return cache._replace(
        unique_k=cp(cache.unique_k, ck),
        unique_v=cp(cache.unique_v, cv),
        unique_k_scale=None if cache.unique_k_scale is None else cp(cache.unique_k_scale, cks),
        unique_v_scale=None if cache.unique_v_scale is None else cp(cache.unique_v_scale, cvs),
    )
