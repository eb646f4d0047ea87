"""Parameter / KV-cache shardings (gpt-fast-style TP, the GSPMD way).

Counterpart of the reference's ``apply_tp`` (/root/reference/hydragen/tp.py:30-132):

- column-shard q/k/v/gate/up  ->  PartitionSpec on the *output-feature* dim
- row-shard o/down            ->  PartitionSpec on the *input-feature* dim
- embeddings / lm_head replicated-or-vocab-sharded (the reference replicates,
  tp.py:127-132; we shard lm_head over vocab — the logits all-gather is tiny
  next to the matmul savings)
- KV caches sharded over kv-heads (the reference gets this implicitly by
  shrinking ``num_kv_heads`` before cache allocation, tp.py:101-106)

Instead of mutating modules per rank, we hand XLA ``NamedSharding``s; GSPMD
derives the reference's two per-layer all-reduces (tp.py:84-112) from the
row-sharded projections and overlaps them via the latency-hiding scheduler.

GQA edge: when ``num_kv_heads % tp != 0`` the kv projections and caches are
replicated while q stays sharded — same semantics the reference can't express
(it requires divisibility, tp.py:43-46).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragen_tpu.core.cache import KVCache, SharedLevel
from hydragen_tpu.models.config import ModelConfig


def _axis(mesh: Mesh, name: str) -> str | None:
    return name if name in mesh.axis_names and mesh.shape[name] > 1 else None


def param_pspecs(cfg: ModelConfig, mesh: Mesh):
    """PartitionSpec pytree matching the param pytree of models/llama.py."""
    tp = _axis(mesh, "tp")
    tp_size = mesh.shape["tp"] if tp else 1

    def div(n: int) -> str | None:
        return tp if tp and n % tp_size == 0 else None

    q_shard = div(cfg.num_attention_heads * cfg.head_dim)
    kv_shard = div(cfg.num_key_value_heads * cfg.head_dim)
    # kv head sharding must also divide the *head count* (caches shard heads).
    if kv_shard and cfg.num_key_value_heads % tp_size != 0:
        kv_shard = None
    mlp_shard = div(cfg.intermediate_size)
    vocab_shard = div(cfg.vocab_size)

    specs = {
        "embed_tokens": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, vocab_shard),
        "layers": {
            "input_norm": P(None, None),
            "post_attn_norm": P(None, None),
            "wq": P(None, None, q_shard),
            "wk": P(None, None, kv_shard),
            "wv": P(None, None, kv_shard),
            "wo": P(None, q_shard, None),
            "gate": P(None, None, mlp_shard),
            "up": P(None, None, mlp_shard),
            "down": P(None, mlp_shard, None),
        },
    }
    if cfg.attention_bias:
        specs["layers"]["bq"] = P(None, q_shard)
        specs["layers"]["bk"] = P(None, kv_shard)
        specs["layers"]["bv"] = P(None, kv_shard)
        specs["layers"]["bo"] = P(None, None)
    return specs


def cache_pspecs(cfg: ModelConfig, mesh: Mesh, cache: KVCache):
    """PartitionSpec pytree matching a ``KVCache``.

    Unique cache: batch over ``dp``, kv-heads over ``tp``.
    Shared levels: kv-heads over ``tp``, prefix *sequence* over ``sp``
    (distributed split-K: each sp shard attends its slice; the LSE merge is
    exact, so GSPMD's collective combine preserves the math). A level's
    prefixes are shared by rows on every dp shard, so shared KV is
    replicated across ``dp`` — the whole point of Hydragen is that this
    buffer is small.
    """
    tp = _axis(mesh, "tp")
    dp = _axis(mesh, "dp")
    sp = _axis(mesh, "sp")
    tp_size = mesh.shape["tp"] if tp else 1
    head_shard = tp if tp and cfg.num_key_value_heads % tp_size == 0 else None

    dp_size = mesh.shape["dp"] if dp else 1
    batch_shard = dp if dp and cache.max_unique_batch_size % dp_size == 0 else None
    sp_size = mesh.shape["sp"] if sp else 1

    if cache.unique_bshd:  # [L, B, U, hkv, hd]
        ukv = P(None, batch_shard, None, head_shard, None)
        if not cache.quantized:
            uscale = None
        elif cache.flat_scales:
            # [L, B, S*hkv]: heads are folded into lanes — batch-shard only
            # (the engine allocates 4D scales under head-sharding meshes).
            uscale = P(None, batch_shard, None)
        else:
            uscale = P(None, batch_shard, None, head_shard)
    else:
        ukv = P(None, batch_shard, head_shard, None, None)
        uscale = P(None, batch_shard, head_shard, None) if cache.quantized else None

    def level_seq_shard(lv):
        return sp if sp and lv.max_seq_len % sp_size == 0 else None

    shared = tuple(
        SharedLevel(
            k=P(None, None, head_shard, level_seq_shard(lv), None),
            v=P(None, None, head_shard, level_seq_shard(lv), None),
            seq_lens=P(None),
            k_scale=P(None, None, head_shard, level_seq_shard(lv)) if lv.quantized else None,
            v_scale=P(None, None, head_shard, level_seq_shard(lv)) if lv.quantized else None,
        )
        for lv in cache.shared
    )
    return KVCache(
        unique_k=ukv, unique_v=ukv, shared=shared,
        unique_k_scale=uscale, unique_v_scale=uscale,
        unique_bshd=cache.unique_bshd, flat_scales=cache.flat_scales,
    )


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """Place the param pytree on the mesh with TP shardings.

    Handles INT8-quantized weights (``QuantizedTensor``): the payload takes
    the weight's spec; the per-output-channel scale takes the same spec with
    the contracted (in-features, axis -2) dimension dropped. INT4 weights
    (``Quantized4Tensor``): the packed payload takes the swapped spec (its
    packed in-axis halves both nibble planes, which GSPMD partitions
    correctly — the dq path operates on logical arrays); the [groups, out]
    scale keeps the logical axis order.
    """
    from hydragen_tpu.ops.quant import Quantized4Tensor, QuantizedTensor

    specs = param_pspecs(cfg, mesh)

    def place(x, s):
        if isinstance(x, QuantizedTensor):
            # Specs are written for the logical [.., in, out] weight; the
            # payload is stored [.., out, in], so swap its last two entries.
            st = tuple(s) + (None,) * (x.q.ndim - len(tuple(s)))
            q_spec = P(*(st[:-2] + (st[-1], st[-2])))
            scale_spec = P(*(st[:-2] + st[-1:]))
            return QuantizedTensor(
                q=jax.device_put(x.q, NamedSharding(mesh, q_spec)),
                scale=jax.device_put(x.scale, NamedSharding(mesh, scale_spec)),
            )
        if isinstance(x, Quantized4Tensor):
            st = tuple(s) + (None,) * (x.qp.ndim - len(tuple(s)))
            qp_spec = P(*(st[:-2] + (st[-1], st[-2])))
            # gscale [.., groups(K), out]: groups shard with the in-features
            # axis only if the per-device group count stays whole.
            axis = st[-2]
            nshard = 1 if axis is None else mesh.shape[axis]
            g_in = st[-2] if x.gscale.shape[-2] % max(nshard, 1) == 0 else None
            gs_spec = P(*(st[:-2] + (g_in, st[-1])))
            return Quantized4Tensor(
                qp=jax.device_put(x.qp, NamedSharding(mesh, qp_spec)),
                gscale=jax.device_put(x.gscale, NamedSharding(mesh, gs_spec)),
            )
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        place, params, specs,
        is_leaf=lambda x: isinstance(x, (QuantizedTensor, Quantized4Tensor)),
    )


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh) -> KVCache:
    """Place a (freshly allocated) KVCache on the mesh."""
    specs = cache_pspecs(cfg, mesh, cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )
