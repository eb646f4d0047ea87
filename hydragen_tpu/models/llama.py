"""Functional JAX Llama stack with Hydragen attention.

TPU-native re-design of the reference model layer
(``/root/reference/hydragen/llama.py:349-765``). Differences by design:

- **Pure functions over pytrees**: params and caches are pytrees; the whole
  forward (all modes) jits into one XLA program. The reference's CUDA-graph
  wrapper (llama.py:768-866) is replaced by jit specialization keyed on the
  same static attributes (mode, active level count/shapes, disable flags).
- **lax.scan over layers** with stacked per-layer weights: one compiled layer
  body regardless of depth, fast compiles, and XLA pipelines weight prefetch.
- **Uniform attention decomposition**: in every mode, attention is computed
  as LSE-mergeable partials — active shared levels + previously-written
  unique cache (length-masked) + a causal self-attend over the *current*
  input's KV. This removes the reference's scatter-before-attend ordering
  (llama.py:564-587): new KVs are returned from the scan and scattered into
  the unique cache once, for all layers, afterwards.
- RoPE is applied at the **global** position while KV is stored at the
  position minus the shared length, mirroring llama.py:487-501.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.ops.combine import combine_lse, combine_lse_with_stats
from hydragen_tpu.ops.hydragen import (
    _attention,
    _pick_impl,
    fold_queries_for_shared,
    unfold_shared_lse,
    unfold_shared_out,
)
from hydragen_tpu.ops.quant import qmatmul


# ---------------------------------------------------------------------------
# Parameter initialization / structure
# ---------------------------------------------------------------------------

def init_params(
    cfg: ModelConfig, key: jax.Array, quantized: bool | str = False
):
    """Random-init params (for tests and benchmarks without checkpoints).

    ``quantized=True`` creates INT8 weights *directly* (random int8 payload +
    magnitude-matched scales) — a 7B model cannot hold bf16 originals and
    int8 copies simultaneously on a 16 GB chip, and benchmark timing does
    not depend on weight values. ``quantized="int4"`` (or "w4a8") creates
    planar-packed INT4 weights the same way (lm_head stays INT8 — see
    ops/quant.py quantize_params).
    """
    int4 = quantized in ("int4", "w4a8")
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    if quantized in ("w8a8", "w4a8"):
        # Same intermediate-dim padding quantize_params applies to real
        # checkpoints (ops/quant.py pad_intermediate): exact, and keeps the
        # s8 GEMMs on 512-wide N tiles. Weight-only modes skip it — dq's
        # einsum gains nothing and the pad is +2.3 % MXU work.
        from hydragen_tpu.ops.quant import _I_PAD

        if I >= _I_PAD:
            I = -(-I // _I_PAD) * _I_PAD
    L = cfg.num_hidden_layers
    Hq = cfg.num_attention_heads * cfg.head_dim
    Hkv = cfg.num_key_value_heads * cfg.head_dim
    dt = cfg.jax_dtype

    keys = jax.random.split(key, 12)

    def dense(k, shape, fan_in, int4_ok=False):
        # Sample directly in the target dtype: a 7B model's fp32 transients
        # would exceed a single v5e's 16 GB HBM.
        if quantized and int4 and int4_ok:
            from hydragen_tpu.ops.quant import Quantized4Tensor, pick_group4

            K = shape[-2]
            g = pick_group4(K)
            # Packed payload stored [out, in//2] (see Quantized4Tensor).
            pshape = shape[:-2] + (shape[-1], K // 2)
            qp = jax.random.randint(k, pshape, -128, 128, dtype=jnp.int8)
            gscale = jnp.full(
                shape[:-2] + (K // g, shape[-1]),
                1.0 / (4.0 * math.sqrt(fan_in)),  # ~unit-normal group amax
                dtype=jnp.bfloat16,
            )
            return Quantized4Tensor(qp=qp, gscale=gscale)
        if quantized:
            from hydragen_tpu.ops.quant import QuantizedTensor

            # Payload stored [out, in] (see QuantizedTensor).
            tshape = shape[:-2] + (shape[-1], shape[-2])
            q = jax.random.randint(k, tshape, -127, 128, dtype=jnp.int8)
            scale = jnp.full(
                shape[:-2] + shape[-1:],
                1.0 / (74.0 * math.sqrt(fan_in)),  # ~unit-normal channel amax
                dtype=jnp.bfloat16,
            )
            return QuantizedTensor(q=q, scale=scale)
        return jax.random.normal(k, shape, dtype=dt) / jnp.asarray(
            math.sqrt(fan_in), dtype=dt
        )

    def dense_fp(k, shape, fan_in):
        return jax.random.normal(k, shape, dtype=dt) / jnp.asarray(
            math.sqrt(fan_in), dtype=dt
        )

    params = {
        "embed_tokens": dense_fp(keys[0], (V, H), H),  # gather: stays fp
        "final_norm": jnp.ones((H,), dtype=dt),
        "lm_head": dense(keys[1], (H, V), H),
        "layers": {
            "input_norm": jnp.ones((L, H), dtype=dt),
            "post_attn_norm": jnp.ones((L, H), dtype=dt),
            "wq": dense(keys[2], (L, H, Hq), H, int4_ok=True),
            "wk": dense(keys[3], (L, H, Hkv), H, int4_ok=True),
            "wv": dense(keys[4], (L, H, Hkv), H, int4_ok=True),
            "wo": dense(keys[5], (L, Hq, H), Hq, int4_ok=True),
            "gate": dense(keys[6], (L, H, I), H, int4_ok=True),
            "up": dense(keys[7], (L, H, I), H, int4_ok=True),
            "down": dense(keys[8], (L, I, H), I, int4_ok=True),
        },
    }
    if cfg.attention_bias:
        params["layers"]["bq"] = jnp.zeros((L, Hq), dtype=dt)
        params["layers"]["bk"] = jnp.zeros((L, Hkv), dtype=dt)
        params["layers"]["bv"] = jnp.zeros((L, Hkv), dtype=dt)
        params["layers"]["bo"] = jnp.zeros((L, H), dtype=dt)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(cfg: ModelConfig, position_ids: jax.Array):
    """cos/sin tables at the given positions, HF-llama convention.

    position_ids: ``[b, t]`` int. Returns cos, sin ``[b, t, head_dim]``
    (half-frequencies duplicated, matching HF's ``cat(freqs, freqs)``).
    RoPE variants (vanilla / linear / dynamic NTK) mirror llama.py:716-741.
    """
    d = cfg.head_dim
    base = cfg.rope_theta
    pos = position_ids.astype(jnp.float32)

    if cfg.rope_scaling is not None:
        stype, factor = cfg.rope_scaling[0], cfg.rope_scaling[1]
        if stype == "linear":
            pos = pos / factor
        elif stype == "llama3":
            # Llama-3.1 frequency smoothing: low-frequency (long-wavelength)
            # components are slowed by `factor`, high-frequency kept, with a
            # linear blend between the two wavelength thresholds.
            _, _, low_f, high_f, orig_max = cfg.rope_scaling
            inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
            wavelen = 2.0 * math.pi / inv_freq
            smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            scaled = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
            inv_freq = jnp.where(wavelen > orig_max / low_f, inv_freq / factor,
                                 jnp.where(wavelen < orig_max / high_f, inv_freq, scaled))
            ang = pos[..., None] * inv_freq[None, None, :]
            cos = jnp.cos(ang)
            sin = jnp.sin(ang)
            return (
                jnp.concatenate([cos, cos], axis=-1),
                jnp.concatenate([sin, sin], axis=-1),
            )
        elif stype == "dynamic":
            # Dynamic NTK: grow the base when the current max position
            # exceeds the trained context window.
            seq_len = jnp.max(position_ids).astype(jnp.float32) + 1.0
            mpe = float(cfg.max_position_embeddings)
            scaled = factor * seq_len / mpe - (factor - 1.0)
            new_base = base * jnp.maximum(scaled, 1.0) ** (d / (d - 2))
            inv_freq = 1.0 / (
                new_base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
            )
            ang = pos[..., None] * inv_freq[None, None, :]
            cos = jnp.cos(ang)
            sin = jnp.sin(ang)
            return (
                jnp.concatenate([cos, cos], axis=-1),
                jnp.concatenate([sin, sin], axis=-1),
            )
        else:
            raise ValueError(f"unknown rope scaling {stype}")

    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = pos[..., None] * inv_freq[None, None, :]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    return jnp.concatenate([cos, cos], axis=-1), jnp.concatenate([sin, sin], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [b, h, t, d] (BHSD); cos/sin: [b, t, d]. HF rotate_half convention.

    Accumulates in f32 regardless of table dtype (HF applies the same
    upcast-then-cast-back discipline)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rotf = rot.astype(jnp.float32)
    out = (
        xf * cos[:, None, :, :].astype(jnp.float32)
        + rotf * sin[:, None, :, :].astype(jnp.float32)
    )
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

class ForwardSpec(NamedTuple):
    """Static specialization of a forward call — the TPU analogue of the
    reference's CaptureData key set (llama.py:769-810)."""

    mode: str  # "shared_prefill" | "unique_prefill" | "decode"
    num_used_levels: int
    level_filled: Tuple[int, ...]  # static filled length per active level
    unique_history: bool  # attend over previously-written unique cache?
    unique_filled: int  # static upper bound of written unique positions
    disable_hydragen: bool
    disable_attention: bool
    impl: Optional[str] = None
    sharded: bool = False  # running SPMD over a mesh (disables Pallas paths)
    # Projection-matmul impl: "dq" (weight-only int8, bf16 MXU) or "w8a8"
    # (per-row activation quant + native s8 MXU GEMM, ops/gemm.py).
    matmul: str = "dq"
    # Static filled *prefix count* per active level; () = all fully filled
    # (reference SharedCache.fill accepts bs < max_batch_size, llama.py:120).
    level_batch: Tuple[int, ...] = ()


def resolve_forward_impl(spec: ForwardSpec) -> str:
    """Attention impl used by model_forward's *inline* calls for this spec.

    Under GSPMD sharding the inline calls route to XLA: a pallas_call is an
    opaque custom call the partitioner cannot split. Large sharded calls
    keep the Pallas kernels anyway — via explicit ``shard_map`` wrappers
    (parallel/shard_attn.py) dispatched separately in the layer body, with
    sp partials merged by the exact LSE algebra (ref semantics anchor: flash
    kernels under TP, tp.py:84-112).
    """
    impl = _pick_impl(spec.impl)
    if spec.sharded and impl != "xla":
        return "xla"
    return impl


def _mesh_kernels_on() -> bool:
    """Run the mesh-wrapped Pallas fast paths? True on TPU; off-TPU the
    CPU-mesh tests and the driver's dryrun opt in explicitly (interpret-mode
    pallas at model scale is too slow for the default CPU suite)."""
    import os

    return jax.default_backend() == "tpu" or bool(
        os.environ.get("HYDRAGEN_MESH_KERNELS_INTERPRET")
    )


def _mesh_level_attn_ok(mesh, spec: ForwardSpec, b, hq, hkv, sb, s, m) -> bool:
    """Route this shared-level read through the shard_map'd Pallas kernel?

    Same shape thresholds as ``_pick_impl``'s auto rule, applied to the
    PER-SHARD fold (local M = group * (b/dp)/sb_loc * m, local S = s/sp;
    in the dp-sharded-sb mode sb_loc = sb/dp, so the per-shard fold M is
    b/sb — using the GLOBAL sb here under-estimated it by dp x)."""
    if mesh is None or not spec.sharded or spec.impl == "xla":
        return False
    from hydragen_tpu.parallel.shard_attn import mesh_attention_eligible

    if not mesh_attention_eligible(mesh, b, hq, hkv, sb, s):
        return False
    dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
    sp = mesh.shape["sp"] if "sp" in mesh.axis_names else 1
    sb_loc = sb // dp if (dp > 1 and sb % dp == 0) else sb
    m_loc = (hq // hkv) * (b // dp // sb_loc) * m
    s_loc = s // sp
    from hydragen_tpu.ops.hydragen import pallas_wins

    return pallas_wins(m_loc, s_loc)


def _mesh_causal_attn_ok(mesh, spec: ForwardSpec, b, hq, hkv, t) -> bool:
    if mesh is None or not spec.sharded or spec.impl == "xla":
        return False
    dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
    tp = mesh.shape["tp"] if "tp" in mesh.axis_names else 1
    if b % dp or hq % tp or hkv % tp:
        return False
    m_loc = (hq // hkv) * t
    return m_loc >= 256 and t >= 1024


def model_forward(
    params,
    cfg: ModelConfig,
    cache,
    input_ids: jax.Array,
    position_ids: jax.Array,
    unique_position_ids: jax.Array,
    spec: ForwardSpec,
    history_lens: jax.Array | None = None,
    history_mask: jax.Array | None = None,
    inplace_slot: jax.Array | None = None,
    mesh=None,
    quantize_new_kv: int | None = None,
    fill_level: int | None = None,
):
    """Run the decoder stack in one of the three cache modes.

    Args:
        cache: ``KVCache`` (read-only here; new KVs are returned).
        input_ids: ``[b, t]``.
        position_ids: ``[b, t]`` global positions (RoPE).
        unique_position_ids: ``[b, t]`` positions within the unique cache
            (= global minus shared length; equal to global when hydragen is
            disabled). Used only for causal bookkeeping here; the engine uses
            it again for the post-scan scatter.
        spec: static specialization.
        history_lens: ``[b]`` number of valid previously-written unique-cache
            positions per row (required when ``spec.unique_history``).
        history_mask: optional ``[b, unique_filled]`` bool mask selecting
            valid unique-cache slots per row — the ring-slot pool's wrapped
            windows (core/batching.py); overrides length masking when given.
        inplace_slot: decode fast path (requires ``t == 1``): a scalar cache
            slot shared by all rows. The layer loop runs as a Python loop
            (decode already unrolls it for weight prefetch) and each layer
            writes its token's KV into the cache *inside* the body — the
            stacked ``[L, b, hkv, 1, hd]`` new-KV array, its relayout copies
            and the engine-side whole-cache update all disappear (measured
            >15 ms/step at 7B batch 256). Returns ``(hidden, cache)``.

        quantize_new_kv: quantize each layer's new KV INSIDE the scan body
            (8 -> ``quantize_kv``, 4 -> ``quantize_kv4`` unpacked values).
            The stacked bf16 new-KV transient of a long prefill otherwise
            dominates peak HBM: at 7B/16K it is 8.6 GB, which OOMed the
            round-4 sweep beside 6.6 GB of weights
            (results/r4_measure/sweep7b.log). In-scan quantization emits
            int8 payloads + f32 scales, letting the per-layer bf16 arrays
            die inside the scan.

        fill_level: shared-prefill fast path — the index of the level being
            prefilled. Each layer writes its new KV straight into the
            level's (donated) buffers INSIDE the scan carry, so the stacked
            ``[L, b, hkv, t, hd]`` new-KV array never exists: at 7B/16K
            that stack is a second 4.3 GB copy of the level (int8, after
            the in-scan quantization; 8.6 GB bf16 before it) living beside
            the destination buffer until the post-scan fill — the term that
            kept every 16K x 7B sweep cell "exceeds HBM" through round 5.
            The level being filled is never read during its own prefill,
            so every read precedes the first write and XLA keeps the
            carry updates in place. Returns ``(hidden, (k_buf, v_buf,
            k_scale_buf, v_scale_buf))`` — full updated level buffers.

    Returns:
        (hidden ``[b, t, H]``, new_k ``[L, b, hkv, t, hd]``, new_v likewise),
        ``(hidden, cache)`` when ``inplace_slot`` is given, or
        ``(hidden, level_bufs)`` when ``fill_level`` is given. With
        ``quantize_new_kv``, new_k/new_v are ``(payload, scale)`` tuples
        (scale ``[L, b, hkv, t]`` f32).
    """
    impl = resolve_forward_impl(spec)
    b, t = input_ids.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = params["embed_tokens"][input_ids].astype(cfg.jax_dtype)
    cos, sin = rope_cos_sin(cfg, position_ids)
    # Tables in the model dtype: they are loop-invariant across the layer
    # scan, and f32 tables cost 2x the copy bandwidth per layer at long
    # prefill. apply_rope still accumulates in f32 (HF casts the same way).
    cos = cos.astype(cfg.jax_dtype)
    sin = sin.astype(cfg.jax_dtype)

    active_levels = cache.shared[: spec.num_used_levels]
    # Filled prefix count per level (may be < allocated, llama.py:120-167).
    level_sb = spec.level_batch or tuple(
        lv.max_batch_size for lv in active_levels
    )
    # Static slice of each level to its filled length (the reference's
    # sliced_sequence_length fast path, llama.py:377-400, minus varlen).
    # Quantized caches carry (payload, scale) pairs; dequantization happens
    # in the layer body so XLA fuses the multiply into the attention matmul's
    # operand read.
    def kv_view(payload, scale, fl, rows=None):
        p = payload[:, :rows, :, :fl] if rows is not None else payload[:, :, :, :fl]
        if scale is None:
            return (p, None)
        s = scale[:, :rows, :, :fl] if rows is not None else scale[:, :, :, :fl]
        return (p, s)

    # Cached shared-level reads: route level j through the stacked-buffer
    # Pallas kernel (layer index via scalar prefetch) whenever the shapes
    # would pick the Pallas path anyway — per-layer slice operands make XLA
    # materialize each layer's level slice per step (~4.5 ms at 7B bs256).
    # Returns False | "local" | "mesh": under a mesh the same kernel runs
    # per shard via shard_map (parallel/shard_attn.py) — inside the body
    # the local level shard is a whole buffer, the kernel's own operand
    # requirement (VERDICT r4 item 1; ref anchor: kernels under TP,
    # tp.py:84-112).
    def _shared_cached_ok(lv, fl, sb):
        if (
            spec.impl == "xla"
            or cfg.head_dim % 128 != 0
            or spec.disable_hydragen
        ):
            return False
        from hydragen_tpu.ops.hydragen import pallas_wins

        if spec.sharded:
            if mesh is None or not _mesh_kernels_on():
                return False
            from hydragen_tpu.parallel.shard_attn import (
                mesh_shared_cached_eligible,
            )

            if not mesh_shared_cached_eligible(
                mesh, b, nh, nkv, sb, lv.max_batch_size, lv.max_seq_len
            ):
                return False
            if spec.impl == "pallas":
                return "mesh"
            dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
            sp = mesh.shape["sp"] if "sp" in mesh.axis_names else 1
            sb_loc = sb // dp if (dp > 1 and sb % dp == 0) else sb
            m_fold_loc = (nh // nkv) * (b // dp // sb_loc) * t
            return "mesh" if pallas_wins(m_fold_loc, fl // sp) else False
        if jax.default_backend() != "tpu":
            return False
        if spec.impl == "pallas":
            return "local"
        m_fold = (nh // nkv) * (b // sb) * t
        return "local" if pallas_wins(m_fold, fl) else False

    shared_cached = tuple(
        _shared_cached_ok(lv, fl, sb)
        for lv, fl, sb in zip(active_levels, spec.level_filled, level_sb)
    )

    level_ks = [
        (None, None) if shared_cached[i] else kv_view(lv.k, lv.k_scale, fl, rows=sb)
        for i, (lv, fl, sb) in enumerate(
            zip(active_levels, spec.level_filled, level_sb)
        )
    ]
    level_vs = [
        (None, None) if shared_cached[i] else kv_view(lv.v, lv.v_scale, fl, rows=sb)
        for i, (lv, fl, sb) in enumerate(
            zip(active_levels, spec.level_filled, level_sb)
        )
    ]
    level_lens = [lv.seq_lens[:sb] for lv, sb in zip(active_levels, level_sb)]

    if spec.unique_history:
        if cache.unique_bits == 4:
            # Token-planar int4: a [:filled] token slice would break
            # the (j, j + S/2) byte pairing — pass the full packed
            # buffer (and full-length scales); history_lens masks the
            # unwritten tail exactly as padding is masked elsewhere.
            def ukv_view4(payload, scale):
                return (payload[:, :b], scale[:, :b])

            uk = ukv_view4(cache.unique_k, cache.unique_k_scale)
            uv = ukv_view4(cache.unique_v, cache.unique_v_scale)
        elif cache.unique_bshd:
            # [L, B, U, hkv, hd]: slice rows and the token dim (dim 2).
            def ukv_view(payload, scale):
                p = payload[:, :b, : spec.unique_filled]
                if scale is None:
                    s = None
                elif cache.flat_scales:  # [L, B, S*hkv]
                    s = scale[:, :b, : spec.unique_filled * nkv]
                else:
                    s = scale[:, :b, : spec.unique_filled]
                return (p, s)

            uk = ukv_view(cache.unique_k, cache.unique_k_scale)
            uv = ukv_view(cache.unique_v, cache.unique_v_scale)
        else:
            uk = kv_view(cache.unique_k, cache.unique_k_scale, spec.unique_filled, rows=b)
            uv = kv_view(cache.unique_v, cache.unique_v_scale, spec.unique_filled, rows=b)
    else:
        uk = uv = None

    lp = params["layers"]
    has_bias = "bq" in lp

    # Per-projection-family w8a8 routing. History: the round-3 M=256 ladder
    # (results/r3_measure/gemm.log) had the s8 GEMM winning only where
    # N >> K (gate/up) because its numbers INCLUDED a per-projection
    # activation quantize; with the quantize shared per activation (round
    # 5, the memo below) every family flips — measured end-to-end at the 7B
    # north star: all 7,758 tok/s vs gate,up 7,259 vs qkv+gate/up 7,475
    # (results/r5_measure/bench_w8a8*). HYDRAGEN_W8A8_FAMILIES overrides
    # (comma list or "all"); read at trace time like the kernel tile knobs.
    import os as _os

    _w8a8_fams = frozenset(
        _os.environ.get("HYDRAGEN_W8A8_FAMILIES", "all").split(",")
    )

    # Column-parallel families whose weights are actually tp-sharded: these
    # keep the s8 GEMMs under a mesh via shard_map (parallel/shard_gemm.py)
    # — the activation is tp-replicated so the shared row quantization is
    # bitwise the single-chip one, and no collective is needed. Row-parallel
    # families (o/down) measured faster on dq at decode M anyway.
    _col_tp_fams = frozenset()
    _row_tp_fams = frozenset()
    if spec.sharded and mesh is not None:
        from hydragen_tpu.parallel.sharding import param_pspecs

        _lp_specs = param_pspecs(cfg, mesh)["layers"]
        _col_tp_fams = frozenset(
            f for f in ("wq", "wk", "wv", "gate", "up")
            if tuple(_lp_specs[f])[-1] == "tp"
        )
        # Row-parallel families (input features over tp): each shard
        # contributes a K-sliced w8a8 partial; the psum replaces the dq
        # path's GSPMD all-reduce (shard_gemm.sharded_qmatmul_stacked_row).
        _row_tp_fams = frozenset(
            f for f in ("wo", "down")
            if tuple(_lp_specs[f])[-2] == "tp"
        )

    def qmm(x, w, subscripts, family=None, li=None, memo=None):
        from hydragen_tpu.ops.quant import Quantized4Tensor

        impl = spec.matmul
        if impl == "w8a8" and isinstance(w, Quantized4Tensor):
            # Mixed per-family widths (quantization="mixed"): an int4
            # weight under the w8a8 engine mode routes to the w4a8 GEMM —
            # the family routing below is int8-specific.
            impl = "w4a8"
        elif (
            impl == "w8a8"
            and family is not None
            and "all" not in _w8a8_fams
            and family not in _w8a8_fams
        ):
            impl = "dq"
        if impl in ("w8a8", "w4a8") and family is not None and li is not None:
            # s8-GEMM paths read the STACKED weight with the layer index on
            # scalar prefetch — per-layer slices would be copied whole to
            # stage the pallas operand (OOM at 7B bs256, see
            # ops/quant.py qmatmul_stacked).
            from hydragen_tpu.ops.quant import (
                qmatmul_stacked,
                s8_stacked_eligible,
            )

            def shared_quantize(x):
                # Share the per-row activation quantization across
                # projections consuming the same activation (q/k/v off one
                # rmsnorm, gate/up off the other): the amax/divide pass
                # otherwise re-runs per projection. Keyed by tracer
                # identity; the memo pins x so the id cannot be recycled
                # within a layer trace.
                if memo is None:
                    from hydragen_tpu.ops.gemm import quantize_rows

                    return quantize_rows(x.reshape(-1, x.shape[-1]))
                hit = memo.get(id(x))
                if hit is None:
                    from hydragen_tpu.ops.gemm import quantize_rows

                    a_pre = quantize_rows(x.reshape(-1, x.shape[-1]))
                    memo[id(x)] = (x, a_pre)
                    return a_pre
                return hit[1]

            if spec.sharded:
                from hydragen_tpu.parallel.shard_gemm import (
                    mesh_s8_gemm_eligible,
                    mesh_s8_gemm_row_eligible,
                    sharded_qmatmul_stacked,
                    sharded_qmatmul_stacked_row,
                )

                if family in _col_tp_fams and mesh_s8_gemm_eligible(
                    mesh, b, x.shape[-1], lp[family], impl
                ):
                    a_q, a_s = shared_quantize(x)
                    w_st = lp[family]
                    N = w_st.q.shape[1] if hasattr(w_st, "q") else w_st.qp.shape[1]
                    y = sharded_qmatmul_stacked(
                        li, a_q, a_s, w_st, mesh=mesh, impl=impl
                    )
                    return y.reshape(*x.shape[:-1], N).astype(x.dtype)
                if family in _row_tp_fams and mesh_s8_gemm_row_eligible(
                    mesh, b, x.shape[-1], lp[family], impl
                ):
                    # Per-shard K-slice quantization happens in-body (a
                    # global-K row scale cannot be shared here), so no memo.
                    w_st = lp[family]
                    y = sharded_qmatmul_stacked_row(
                        li, x.reshape(-1, x.shape[-1]), w_st, mesh=mesh
                    )
                    return y.reshape(
                        *x.shape[:-1], w_st.q.shape[1]
                    ).astype(x.dtype)
                # Ineligible families/shapes: weight-only dq (the
                # GSPMD-partitionable path).
                return qmatmul(x, w, subscripts, impl="dq")
            a_pre = (
                shared_quantize(x)
                if memo is not None and s8_stacked_eligible(x, lp[family], impl)
                else None
            )
            return qmatmul_stacked(
                x, lp[family], li, subscripts, impl=impl, a_pre=a_pre
            )
        return qmatmul(x, w, subscripts, impl=impl)

    # Decode-kernel eligibility: int8 BSHD unique cache with lane-major flat
    # scales, single-token queries, prefix-length masking (the ring pool's
    # wrapped windows stay on XLA). ``impl="xla"`` is the exact escape hatch
    # (the kernel re-quantizes q and p, ~0.5 % RMS noise). Under a mesh the
    # kernel runs per shard (sharded_decode_attention_cached): the cache
    # keeps 4D scales there (flat lane-major scales fold heads into lanes,
    # unsplittable by a head sharding) and the shard body flattens its
    # LOCAL 4D shard for free.
    from hydragen_tpu.ops.decode import decode_kernel_supported

    _dec_common = (
        t == 1
        and cache.unique_bshd
        and spec.unique_history
        and history_mask is None
        and spec.impl != "xla"
        and cfg.head_dim % 128 == 0
    )
    use_dec_kernel = (
        _dec_common
        and cache.flat_scales
        and not spec.sharded
        # Mosaic scale-BlockSpec legality (round-3 sweep7b postmortem):
        # a legal row batch must exist for this (rows, buffer-rows) pair.
        and decode_kernel_supported(b, cache.unique_k.shape[1])
        and jax.default_backend() == "tpu"
    )
    use_dec_kernel_mesh = False
    if _dec_common and spec.sharded and mesh is not None and cache.quantized:
        from hydragen_tpu.parallel.shard_attn import (
            mesh_decode_kernel_eligible,
        )

        use_dec_kernel_mesh = (
            not cache.flat_scales
            and mesh_decode_kernel_eligible(
                mesh, b, cache.unique_k.shape[1], nh, nkv, cache.unique_bits
            )
            and _mesh_kernels_on()
        )

    def layer(h, xs):
        # NB: scatter-before-attend (write each layer's token, then read
        # history+own from the cache — the reference's decode ordering,
        # llama.py:564-587) was tried and reverted: it serialized the
        # unique-cache DMA behind the same layer's qkv matmul and cost
        # ~4 ms/step at 7B bs256. Reads stay prefetchable; writes follow.
        (li, wq, wk, wv, wo, gate, up, down, in_n, post_n, biases, lvl_kv, ukv) = xs
        memo = {}  # shared-activation quantization cache (see qmm)
        resid = h
        x = rms_norm(h, in_n, cfg.rms_norm_eps)

        q = qmm(x, wq, "bth,hd->btd", family="wq", li=li, memo=memo)
        k = qmm(x, wk, "bth,hd->btd", family="wk", li=li, memo=memo)
        v = qmm(x, wv, "bth,hd->btd", family="wv", li=li, memo=memo)
        if has_bias:
            bq, bk, bv, bo = biases
            q, k, v = q + bq, k + bk, v + bv
        # BHSD layout for attention + caches.
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if spec.disable_attention:
            attn = q
        else:
            attn = None
            outs, lses = [], []
            if not spec.disable_hydragen:
                for j, ((lk, lv_), lens) in enumerate(zip(lvl_kv, level_lens)):
                    sb = level_sb[j]
                    if shared_cached[j] == "mesh":
                        # Per-shard cached kernel (fold happens inside the
                        # shard body; outputs come back unfolded).
                        from hydragen_tpu.parallel.shard_attn import (
                            sharded_shared_cached_attention,
                        )

                        lvl = active_levels[j]
                        o, l = sharded_shared_cached_attention(
                            li, q, lvl.k, lvl.v, lens, mesh=mesh,
                            k_scale_all=lvl.k_scale,
                            v_scale_all=lvl.v_scale,
                        )
                        outs.append(o)
                        lses.append(l)
                        continue
                    if shared_cached[j]:
                        from hydragen_tpu.ops.flash import (
                            flash_attention_cached_bhsd,
                        )

                        lvl = active_levels[j]
                        bq_ = fold_queries_for_shared(q, sb)
                        o, l = flash_attention_cached_bhsd(
                            li, bq_, lvl.k, lvl.v, kv_seq_lens=lens,
                            k_scale_all=lvl.k_scale,
                            v_scale_all=lvl.v_scale,
                        )
                        outs.append(unfold_shared_out(o, b, t))
                        lses.append(unfold_shared_lse(l, b, t))
                        continue
                    s_lvl = lk[0].shape[2]
                    if _mesh_level_attn_ok(
                        mesh, spec, b, nh, nkv, sb, s_lvl, t
                    ):
                        # shard_map'd Pallas kernel: fold + kernel run
                        # per (dp, sp, tp) shard, exact LSE merge over
                        # sp (parallel/shard_attn.py).
                        from hydragen_tpu.parallel.shard_attn import (
                            sharded_level_attention,
                        )

                        o, l = sharded_level_attention(
                            q, lk, lv_, lens, mesh=mesh
                        )
                        outs.append(o)
                        lses.append(l)
                        continue
                    bq_ = fold_queries_for_shared(q, sb)
                    # (payload, scale) pairs pass through: the Pallas
                    # kernels dequantize in-register; XLA fuses the
                    # up-front dequant into the einsum operand read.
                    o, l = _attention(
                        bq_, lk, lv_, causal=False,
                        kv_seq_lens=lens, impl=impl,
                    )
                    outs.append(unfold_shared_out(o, b, t))
                    lses.append(unfold_shared_lse(l, b, t))
            if ukv is not None:
                uks = ukv[0][1]
                uvs = ukv[1][1]
                if (
                    (use_dec_kernel or use_dec_kernel_mesh)
                    and uks is not None
                    and t == 1
                ):
                    # Int8 MXU decode kernel reading straight out of the
                    # stacked cache buffers (layer picked by scalar
                    # prefetch): feeding per-layer slices instead made
                    # XLA materialize the whole 67 MB slice per operand
                    # per layer (~13 ms/step at 7B bs256).
                    # Fused epilogue: this step's own-token KV rides in
                    # as one extra softmax column per row and the shared
                    # partial(s) merge via LSE at emit — the kernel
                    # emits the FINAL attention, dropping combine_lse
                    # (its 3-partial merge relayed each partial out in
                    # f32 every layer, xplane-verified) and the analytic
                    # own-token partial from the decode step.
                    if len(outs) > 1:
                        sh = combine_lse_with_stats(outs, lses)
                    elif outs:
                        sh = (outs[0], lses[0])
                    else:
                        sh = None
                    if use_dec_kernel_mesh:
                        from hydragen_tpu.parallel.shard_attn import (
                            sharded_decode_attention_cached,
                        )

                        attn, _ = sharded_decode_attention_cached(
                            li, q, cache.unique_k, cache.unique_v,
                            kv_seq_lens=history_lens,
                            k_scale4_all=cache.unique_k_scale,
                            v_scale4_all=cache.unique_v_scale,
                            mesh=mesh,
                            own_kv=(k, v),
                            shared_partial=sh,
                            kv_bits=cache.unique_bits,
                        )
                    else:
                        from hydragen_tpu.ops.decode import (
                            decode_attention_cached,
                        )

                        attn, _ = decode_attention_cached(
                            li, q, cache.unique_k, cache.unique_v,
                            kv_seq_lens=history_lens,
                            k_scale_all=cache.unique_k_scale,
                            v_scale_all=cache.unique_v_scale,
                            own_kv=(k, v),
                            shared_partial=sh,
                            kv_bits=cache.unique_bits,
                        )
                else:
                    if uks is not None and cache.flat_scales:
                        # Per-layer flat slice [b, U*nkv] -> the XLA
                        # path's [b, U, nkv] view. int4 views carry the
                        # full allocated window (see ukv_view4).
                        U = (
                            cache.max_unique_seq_len
                            if cache.unique_bits == 4
                            else spec.unique_filled
                        )
                        uks = uks.reshape(b, U, nkv)
                        uvs = uvs.reshape(b, U, nkv)
                    o, l = _attention(
                        q, (ukv[0][0], uks) if uks is not None else ukv[0],
                        (ukv[1][0], uvs) if uvs is not None else ukv[1],
                        causal=False,
                        kv_seq_lens=None if history_mask is not None else history_lens,
                        kv_mask=history_mask, impl=impl,
                        kv_bshd=cache.unique_bshd,
                        kv_bits=cache.unique_bits,
                    )
                    outs.append(o)
                    lses.append(l)
            # Causal self-attention over the current input's KV (skipped
            # when the decode kernel already merged the own token).
            if attn is not None:
                pass
            elif t == 1:
                # Decode: softmax over a single own-token KV is the
                # identity — out = v, lse = q·k·scale. Computing this
                # analytically avoids a per-layer kernel launch.
                scale = 1.0 / math.sqrt(hd)
                group = nh // nkv
                qg = q.astype(jnp.float32).reshape(b, nkv, group, 1, hd)
                kf = k.astype(jnp.float32)
                l = (
                    jnp.einsum("bkgmd,bkmd->bkgm", qg, kf) * scale
                ).reshape(b, nh, 1)
                o = jnp.broadcast_to(
                    v[:, :, None], (b, nkv, group, 1, hd)
                ).reshape(b, nh, 1, hd).astype(q.dtype)
            elif _mesh_causal_attn_ok(mesh, spec, b, nh, nkv, t):
                from hydragen_tpu.parallel.shard_attn import (
                    sharded_causal_attention,
                )

                o, l = sharded_causal_attention(q, k, v, mesh=mesh)
            else:
                o, l = _attention(q, k, v, causal=True, kv_seq_lens=None, impl=impl)
            if attn is None:
                outs.append(o)
                lses.append(l)
                attn = combine_lse(outs, lses)

        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        attn = qmm(attn, wo, "btd,dh->bth", family="wo", li=li, memo=memo)
        if has_bias:
            attn = attn + biases[3]
        h = resid + attn

        resid = h
        x = rms_norm(h, post_n, cfg.rms_norm_eps)
        g = qmm(x, gate, "bth,hi->bti", family="gate", li=li, memo=memo)
        u = qmm(x, up, "bth,hi->bti", family="up", li=li, memo=memo)
        m = qmm(
            jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u, down,
            "bti,ih->bth", family="down", li=li, memo=memo,
        )
        h = resid + m

        if quantize_new_kv:
            from hydragen_tpu.ops.quant import quantize_kv, quantize_kv4

            qfn = quantize_kv4 if quantize_new_kv == 4 else quantize_kv
            kq, ks = qfn(k)
            vq, vs = qfn(v)
            return h, ((kq, ks), (vq, vs))
        return h, ((k, None), (v, None))

    biases = (
        (lp["bq"], lp["bk"], lp["bv"], lp["bo"])
        if has_bias
        else (jnp.zeros((cfg.num_hidden_layers, 0)),) * 4
    )
    xs = (
        jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32),
        lp["wq"], lp["wk"], lp["wv"], lp["wo"],
        lp["gate"], lp["up"], lp["down"],
        lp["input_norm"], lp["post_attn_norm"],
        biases,
        tuple(zip(level_ks, level_vs)),
        (uk, uv) if uk is not None else None,
    )

    if fill_level is not None:
        # Shared-prefill fast path: write each layer's new KV straight into
        # the level's (donated) buffers inside the scan carry — the stacked
        # [L, b, hkv, t, hd] new-KV array of the default path is a full
        # second copy of the level living beside the destination until the
        # post-scan fill (4.4 GB at 7B/16K int8 — the term that kept every
        # 16K x 7B sweep cell "exceeds HBM" through round 5). The level
        # being filled is never read during its own prefill (it is not in
        # active_levels), so every read of the buffers precedes the first
        # carry write and XLA keeps the updates in place.
        assert inplace_slot is None
        lvl_f = cache.shared[fill_level]
        assert b <= lvl_f.max_batch_size and t <= lvl_f.max_seq_len
        assert (quantize_new_kv == 8) == lvl_f.quantized, (
            "fill_level expects quantize_new_kv to match the level store"
        )

        def layer_fill(carry, xs_li):
            h, kb, vb, ksb, vsb = carry
            li = xs_li[0]
            h, ((kq, ks), (vq, vs)) = layer(h, xs_li)
            idx = (li, 0, 0, 0, 0)
            kb = jax.lax.dynamic_update_slice(kb, kq[None], idx)
            vb = jax.lax.dynamic_update_slice(vb, vq[None], idx)
            if ksb is not None:
                ksb = jax.lax.dynamic_update_slice(ksb, ks[None], idx[:4])
                vsb = jax.lax.dynamic_update_slice(vsb, vs[None], idx[:4])
            return (h, kb, vb, ksb, vsb), None

        init = (h, lvl_f.k, lvl_f.v, lvl_f.k_scale, lvl_f.v_scale)
        (h, kb, vb, ksb, vsb), _ = jax.lax.scan(layer_fill, init, xs)
        if spec.sharded and mesh is not None:
            # Pin the outputs to the POST-FILL convention the decode step
            # is compiled against: kv-heads over tp, sequence REPLICATED
            # over sp/dp. (The stacked fill path ended here too — GSPMD
            # dropped the allocation's sp seq split when writing the
            # level — and test_comm's pinned 2-all-reduce/layer decode
            # surface depends on it: an sp-sharded level makes the XLA
            # decode read pay a 3-collective split-K softmax merge per
            # layer. Levels are small by construction — replication over
            # sp is the measured-right trade, and the shard_map'd level
            # kernels slice a replicated buffer locally for free.)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from hydragen_tpu.parallel.sharding import cache_pspecs

            head_shard = tuple(cache_pspecs(cfg, mesh, cache)
                               .shared[fill_level].k)[2]

            def wsc(x, nd):
                if x is None:
                    return None
                s = P(*(head_shard if i == 2 else None for i in range(nd)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)
                )

            kb, vb = wsc(kb, 5), wsc(vb, 5)
            ksb, vsb = wsc(ksb, 4), wsc(vsb, 4)
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        return h, (kb, vb, ksb, vsb)

    if inplace_slot is not None:
        # Decode fast path: Python loop (fully static per-layer slices), new
        # KVs written per layer AFTER the loop. All reads hit the original
        # buffers (this step's token is never in its own history), so the
        # buffers' last use precedes the first update and XLA keeps every
        # dynamic-update-slice in place — and the unique-cache reads stay
        # free to prefetch ahead of the layer's matmuls.
        assert t == 1, "inplace_slot is a single-token decode path"
        from hydragen_tpu.core.cache import write_decode_token_layer

        pin4 = (
            cache.unique_bits == 4
            and not spec.sharded
            and jax.default_backend() == "tpu"
        )
        if pin4:
            # Pin the int4 cache buffers to the default descending layout
            # inside the decode loop body. The nibble RMW's byte-row slab
            # writes ([1, B, 1, hkv, hd] at a varying token row) make TPU
            # layout assignment prefer a B-inner-of-token layout
            # {4,3,1,2,0} for the whole DUS chain — and with it the while
            # CARRY — at some buffer shapes (72 byte rows: yes; the bench
            # shape's 64: no), while the Pallas decode kernel requires the
            # default: the conflict materialized full 2.25 GB relayout
            # copies of the cache at entry, exit, AND per Pallas operand
            # (OOM at the 7B bs256 sweep cell,
            # results/r5_measure/sweep7b_kv4_c.log + probe_layout.log).
            # Constraining the value before the reads AND after every
            # layer's write forces every link of the chain — hence the
            # carry — to the default layout, where all the constraints
            # are no-ops and no copy survives.
            from jax.experimental.layout import Layout, with_layout_constraint

            def pin(x):
                return with_layout_constraint(
                    x, Layout(major_to_minor=tuple(range(x.ndim)))
                )

            cache = cache._replace(
                unique_k=pin(cache.unique_k), unique_v=pin(cache.unique_v)
            )

        new_kvs = []
        for li in range(cfg.num_hidden_layers):
            xs_li = jax.tree.map(lambda a, li=li: a[li], xs)
            h, ((k1, _), (v1, _)) = layer(h, xs_li)
            new_kvs.append((k1, v1))
        for li, (k1, v1) in enumerate(new_kvs):
            cache = write_decode_token_layer(
                cache, li, k1, v1, inplace_slot, gather_kernel=pin4
            )
            if pin4:
                cache = cache._replace(
                    unique_k=pin(cache.unique_k),
                    unique_v=pin(cache.unique_v),
                )
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        return h, cache

    # Decode with int8 weights unrolls the layer loop: each dequant-matmul
    # fusion then binds its weight slice at a static offset, letting XLA's
    # latency-hiding scheduler prefetch the next layer's int8 payload during
    # the current layer's compute (measured +6% decode on v5e; a scanned body
    # reads weights through a dynamic-slice, which blocks that). bf16 decode
    # and prefill keep the rolled scan — measured faster there, and
    # compilation is 24x cheaper.
    from hydragen_tpu.ops.quant import Quantized4Tensor, is_quantized_weight

    quantized = is_quantized_weight(lp["wq"])
    # int4 weights under the dq fallback keep the ROLLED scan: each layer's
    # plane-dequant emits ~45 MB bf16 transients per projection, and an
    # unrolled loop lets XLA keep many layers' transients alive at once
    # (HBM OOM at 7B bs256, results/r3_measure/bench_int4.log). The w4a8
    # kernel path reads the packed payload directly and keeps the unroll —
    # EXCEPT under a mesh, where the row-parallel families (o/down) always
    # fall back to the dq plane-dequant inside qmm and the rolled scan must
    # stay (same transient-OOM mode).
    int4_dq = isinstance(lp["wq"], Quantized4Tensor) and (
        spec.matmul != "w4a8" or spec.sharded
    )
    unroll = cfg.num_hidden_layers if (t == 1 and quantized and not int4_dq) else 1
    h, ((new_k, nks), (new_v, nvs)) = jax.lax.scan(layer, h, xs, unroll=unroll)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if quantize_new_kv:
        return h, (new_k, nks), (new_v, nvs)
    return h, new_k, new_v


def logits_from_hidden(
    params, cfg: ModelConfig, hidden: jax.Array, seq_lens: jax.Array | None = None,
    full_logits: bool = False,
):
    """LM head; last-token-only unless full_logits (llama.py:976-996).

    Deliberately ALWAYS the weight-only dq path, even when the engine runs
    projections in w8a8 (ForwardSpec.matmul): logits feed sampling directly,
    the head is the quality-critical matmul, and at decode it is <2 % of
    the step.
    """
    if full_logits:
        to_head = hidden
    elif seq_lens is not None:
        idx = (seq_lens - 1).astype(jnp.int32)
        to_head = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)
    else:
        to_head = hidden[:, -1:]
    logits = qmatmul(to_head, params["lm_head"], "bth,hv->btv")
    return logits.astype(jnp.float32)
