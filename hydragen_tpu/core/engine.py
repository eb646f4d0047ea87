"""HydragenLlama: the generation engine (reference-parity API, TPU execution).

Counterpart of ``HydragenLlamaForCausalLM`` (/root/reference/hydragen/llama.py:875-1422):
``setup_caches`` / ``append_shared`` / ``process_unique`` / ``generate`` with
``shared_cache_op``, ``starting_logits``, ``return_logits``,
``token_overrides`` and the ``disable_*`` benchmark flags.

Execution model: every mode (shared prefill / unique prefill / the whole
multi-token decode loop) is one jitted function over functional pytrees with
donated cache buffers. Specialization is keyed on static attributes — mode,
active level count, per-level filled lengths, disable flags — the same key
set the reference's CUDA-graph wrapper checks before re-capturing
(llama.py:797-810); a changed key here simply compiles a new program, cached
thereafter. The decode loop is a ``lax.scan`` over steps (sampling included),
the TPU equivalent of replaying a captured decode graph with zero host
overhead per token.
"""

from __future__ import annotations

import os

from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from hydragen_tpu.core.cache import (
    KVCache,
    allocate_cache,
    copy_shared_to_unique,
    fill_shared_level,
    set_shared_level_buffers,
    repeat_unique_for_samples,
    shared_len_for_batch,
    update_unique_decode,
    update_unique_prefill,
)
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import (
    ForwardSpec,
    logits_from_hidden,
    model_forward,
)


class SharedCacheOp:
    WIPE = "wipe"
    EXTEND = "extend"
    PRESERVE = "preserve"


def _finished_mask(tokens_np, eos_token_id, stop_sequences):
    """``[b, T]`` bool — row i has finished at or before column j.

    A row finishes at the column where it emits ``eos_token_id`` or where
    any of ``stop_sequences`` (token-id lists) completes as a suffix of its
    generated stream. Matching is within the generated tokens only
    (sequences never span into the prompt). Beyond-reference: the
    reference supports only single-token EOS (README.md:486 lists stop
    strings as unsupported).
    """
    b, T = tokens_np.shape
    fin = np.zeros((b, T), dtype=bool)
    if eos_token_id is not None:
        fin |= tokens_np == eos_token_id
    for s in stop_sequences or ():
        s = np.asarray(s, dtype=tokens_np.dtype)
        L = len(s)
        if L == 0 or L > T:
            continue
        # fin[:, j] |= stream[j-L+1 : j+1] == s  (suffix match per column);
        # sliding windows via stride tricks keeps this O(b*T*L) numpy-only.
        win = np.lib.stride_tricks.sliding_window_view(tokens_np, L, axis=1)
        fin[:, L - 1:] |= (win == s).all(axis=-1)
    return np.logical_or.accumulate(fin, axis=1)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """HF TopPLogitsWarper semantics (llama.py:999-1023): keep the smallest
    set of top tokens with cumulative prob > top_p (at least one)."""
    sorted_idx = jnp.argsort(logits, axis=-1)  # ascending
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    remove_sorted = remove_sorted.at[..., -1:].set(False)
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, sorted_idx, remove_sorted, axis=-1, inplace=False)
    return jnp.where(remove, -jnp.inf, logits)


def sample_from_logits(
    logits: jax.Array,
    rng: jax.Array,
    temperature: float,
    top_p: Optional[float],
    num_samples: int = 1,
) -> jax.Array:
    """Sample ``[b, num_samples]`` token ids (llama.py:1025-1046)."""
    if top_p is not None:
        logits = apply_top_p(logits, top_p)
    if temperature == 0:
        tok = jnp.argmax(logits, axis=-1, keepdims=True)
        return jnp.repeat(tok, num_samples, axis=-1)
    b = logits.shape[0]
    samples = jax.random.categorical(
        rng, logits / temperature, shape=(num_samples, b)
    )
    return samples.T.astype(jnp.int32)


# Outside the decode scan, sampling runs once per generate call — jitted so
# the top-p sort/cumsum chain is one dispatch, not an eager op-by-op cascade.
_sample_first = jax.jit(
    sample_from_logits, static_argnames=("temperature", "top_p", "num_samples")
)


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("cfg", "spec", "full_logits", "has_pad", "mesh"),
    donate_argnames=("cache",),
)
def _shared_prefill_step(params, cache, input_ids, seq_lens, cfg, spec, full_logits, has_pad, mesh=None):
    b, t = input_ids.shape
    shared_lens = shared_len_for_batch(
        cache, spec.num_used_levels, b, spec.level_batch or None
    )
    if has_pad:
        local_pos = jnp.minimum(jnp.arange(t)[None, :], seq_lens[:, None] - 1)
    else:
        seq_lens = jnp.full((b,), t, dtype=jnp.int32)
        local_pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)).astype(jnp.int32)
    pos = shared_lens[:, None] + local_pos

    # Quantize new KV inside the layer scan when the level stores int8 (the
    # stacked bf16 transient of a long prefill otherwise dominates peak HBM
    # — 8.6 GB at 7B/16K, OOMed the round-4 sweep's 16K column). When even
    # the POST-quantize stack is HBM-material, additionally write each
    # layer's KV straight into the level buffers inside the scan carry
    # (fill_level): the stack is a full second copy of the level (4.4 GB
    # at 7B/16K int8) living beside the destination until the post-scan
    # fill — it kept the 16K x 7B cells "exceeds HBM" through round 5.
    # Size-gated because the stacked path measured ~1 % faster end-to-end
    # at the 2K north star (8,527 vs 8,42x-8,47x tok/s) — small prefills
    # keep it; the threshold only needs to separate "noise" from "OOM".
    level = cache.shared[spec.num_used_levels]
    qbits = 8 if level.quantized else None
    L = cfg.num_hidden_layers
    stack_bytes = (
        L * b * cfg.num_key_value_heads * t * cfg.head_dim
        * (1 + 4 / cfg.head_dim if qbits else 2) * 2  # k and v
    )
    fill_min = float(os.environ.get("HYDRAGEN_FILL_LEVEL_MIN_MB", "768"))
    if stack_bytes > fill_min * 1e6:
        hidden, (kb, vb, ksb, vsb) = model_forward(
            params, cfg, cache, input_ids, pos, local_pos, spec, mesh=mesh,
            quantize_new_kv=qbits, fill_level=spec.num_used_levels,
        )
        cache = set_shared_level_buffers(
            cache, spec.num_used_levels, kb, vb, ksb, vsb, seq_lens
        )
    else:
        hidden, nk, nv = model_forward(
            params, cfg, cache, input_ids, pos, local_pos, spec, mesh=mesh,
            quantize_new_kv=qbits,
        )
        cache = fill_shared_level(cache, spec.num_used_levels, nk, nv, seq_lens)
    logits = logits_from_hidden(
        params, cfg, hidden, seq_lens if has_pad else None, full_logits
    )
    return logits, cache


@partial(
    jax.jit,
    static_argnames=("cfg", "spec", "has_pad", "mesh"),
    donate_argnames=("cache",),
)
def _unique_prefill_step(params, cache, input_ids, seq_lens, cfg, spec, has_pad, mesh=None):
    b, t = input_ids.shape
    shared_lens = shared_len_for_batch(
        cache, spec.num_used_levels, b, spec.level_batch or None
    )
    pos = shared_lens[:, None] + jnp.arange(t)[None, :]
    if spec.disable_hydragen:
        # Shared prefix was copied to the front of the unique cache; unique
        # positions are global and the copied prefix is attention "history".
        unique_pos = pos
        history_lens = shared_lens
    else:
        unique_pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)).astype(jnp.int32)
        history_lens = None

    # In-scan KV quantization (see _shared_prefill_step): decisive for the
    # disable_hydragen baseline, whose full-prefix rows otherwise stack
    # [L, b, hkv, prefix, hd] bf16 transients.
    qbits = cache.unique_bits if cache.quantized else None
    hidden, nk, nv = model_forward(
        params, cfg, cache, input_ids, pos, unique_pos, spec,
        history_lens=history_lens, mesh=mesh, quantize_new_kv=qbits,
    )
    if spec.disable_hydragen:
        # All rows share one prefix length (enforced by generate): contiguous
        # block update at a dynamic offset after the copied shared prefix.
        cache = update_unique_prefill(cache, nk, nv, start=shared_lens[0])
    else:
        cache = update_unique_prefill(cache, nk, nv)
    logits = logits_from_hidden(params, cfg, hidden, seq_lens if has_pad else None)
    return logits, cache


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "spec", "steps", "temperature", "top_p", "use_overrides",
        "return_logits", "uniform_pos", "mesh",
    ),
    donate_argnames=("cache",),
)
def _decode_steps(
    params, cache, first_token, start_pos, start_unique_pos, rng,
    overrides, cfg, spec, steps, temperature, top_p, use_overrides,
    return_logits, uniform_pos=False, mesh=None,
):
    """The hot loop (llama.py:1351-1380) as a single scanned program."""

    def step(carry, xs):
        cache, tok, rng, i = carry
        override = xs
        pos = (start_pos + i)[:, None]
        upos = start_unique_pos + i
        # All rows share the slot: the in-place path writes each layer's
        # token inside the (unrolled) forward — no stacked new-KV array, no
        # relayout, no whole-cache update (see model_forward). Gated to
        # int8 weights (whose decode already unrolls the layer loop; bf16
        # prefers the rolled scan — 24x cheaper compile, measured faster)
        # and off for the disable_hydragen ablation, whose full-prefix rows
        # make the unrolled loop's dequant transients exceed HBM.
        from hydragen_tpu.ops.quant import is_quantized_weight

        w_quantized = is_quantized_weight(params["layers"]["wq"])
        if uniform_pos and w_quantized and not spec.disable_hydragen:
            hidden, cache = model_forward(
                params, cfg, cache, tok, pos, upos[:, None], spec,
                history_lens=upos, inplace_slot=upos[0], mesh=mesh,
            )
        else:
            hidden, nk, nv = model_forward(
                params, cfg, cache, tok, pos, upos[:, None], spec,
                history_lens=upos, mesh=mesh,
            )
            # Same int4 layout defenses as the in-place path (see
            # models/llama.py pin4): byte-row reads via the Pallas row
            # copy + default-layout pins on the written buffers, so the
            # nibble RMW cannot flip the scan carry to the B-inner layout
            # that relayout-copies the whole cache per step.
            pin4 = (
                uniform_pos
                and cache.unique_bits == 4
                and cache.unique_bshd
                and not spec.sharded
                and jax.default_backend() == "tpu"
            )
            cache = update_unique_decode(
                cache, upos, nk, nv, uniform=uniform_pos, gather_kernel=pin4
            )
            if pin4:
                from jax.experimental.layout import (
                    Layout,
                    with_layout_constraint,
                )

                def pin(x):
                    return with_layout_constraint(
                        x, Layout(major_to_minor=tuple(range(x.ndim)))
                    )

                cache = cache._replace(
                    unique_k=pin(cache.unique_k), unique_v=pin(cache.unique_v)
                )
        # lm_head stays on the weight-only dq path even under w8a8: logits
        # feed sampling directly, the head is the quality-critical matmul,
        # and at decode it is <2 % of the step.
        logits = logits_from_hidden(params, cfg, hidden)[:, 0]
        rng, sub = jax.random.split(rng)
        nxt = sample_from_logits(logits, sub, temperature, top_p, 1)
        tok_next = override[:, None] if use_overrides else nxt
        out = (nxt[:, 0], logits) if return_logits else (nxt[:, 0], jnp.zeros((0,), jnp.float32))
        return (cache, tok_next, rng, i + 1), out

    init = (cache, first_token, rng, jnp.int32(0))
    (cache, next_tok, rng, _), (toks, logits_seq) = jax.lax.scan(
        step, init, overrides, length=steps
    )
    # next_tok/rng are the carry a follow-up chunk resumes from (EOS
    # early-exit runs the decode in chunks with a host check between).
    return toks.T, logits_seq, cache, next_tok, rng  # toks [b, steps]


@partial(
    jax.jit, static_argnames=("num_used", "batch_size", "batch_sizes"),
    donate_argnames=(),
)
def _shared_len(cache, num_used, batch_size, batch_sizes=None):
    return shared_len_for_batch(cache, num_used, batch_size, batch_sizes)


_copy_shared_to_unique = jax.jit(
    copy_shared_to_unique, static_argnames=("total_num_sequences", "sb"),
    donate_argnames=("cache",),
)
_repeat_unique = jax.jit(
    repeat_unique_for_samples, static_argnames=("current_size", "num_samples"),
    donate_argnames=("cache",),
)


def _pad_to_bucket(input_ids, seq_lens, bucket: int, cap: int):
    """Right-pad ``input_ids`` to a bucket multiple (clamped to ``cap``),
    synthesizing true ``seq_lens`` if absent. Returns (ids, seq_lens,
    padded: bool); the padding is masked downstream via seq_lens."""
    t = int(input_ids.shape[1])
    if not bucket or t % bucket == 0:
        return input_ids, seq_lens, False
    tb = min(-(-t // bucket) * bucket, cap)
    if tb <= t:
        return input_ids, seq_lens, False
    if seq_lens is None:
        seq_lens = jnp.full((input_ids.shape[0],), t, dtype=jnp.int32)
    return jnp.pad(input_ids, ((0, 0), (0, tb - t))), seq_lens, True


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class HydragenLlama:
    """Stateful wrapper: params + cache + host-side level stack discipline."""

    def __init__(
        self,
        config: ModelConfig,
        params,
        impl: Optional[str] = None,
        mesh=None,
        quantization: Optional[str] = None,
        prefill_bucket: int = 128,
        eos_chunk: int = 32,
    ):
        if quantization is not None:
            from hydragen_tpu.ops.quant import (
                Quantized4Tensor,
                QuantizedTensor,
                quantize_params,
            )

            assert quantization in ("int8", "w8a8", "int4", "w4a8", "mixed"), (
                f"unknown quantization {quantization!r}"
            )
            bits = 4 if quantization in ("int4", "w4a8") else 8
            want = Quantized4Tensor if bits == 4 else QuantizedTensor
            if not isinstance(params["layers"]["wq"], want):
                assert not isinstance(
                    params["layers"]["wq"], (QuantizedTensor, Quantized4Tensor)
                ), (
                    f"params already quantized at a different width than "
                    f"{quantization!r}"
                )
                params = quantize_params(
                    params, bits=bits,
                    # N-tile alignment pays only on the s8 GEMM paths; the
                    # weight-only dq einsum would just do +2.3 % MXU work.
                    pad_mlp=quantization in ("w8a8", "w4a8", "mixed"),
                    # "mixed" = the measured decode-optimal per-family mix:
                    # int8 weights (dq qkv/o, s8-GEMM gate/up) + INT4 down
                    # (the K-heavy projection is the one family where the
                    # w4a8 kernel wins at decode M — 93 vs 153 us/layer on
                    # the 7B M=256 ladder, docs/results_v5e.md).
                    bits4_families=("down",) if quantization == "mixed" else (),
                )
        self.config = config
        self.params = params
        self.impl = impl
        # "w8a8": activations quantized per row at runtime and matmuls run
        # on the MXU's native s8 path (ops/gemm.py) instead of the
        # weight-only dequant-fused bf16 path. Mutable: a jit
        # specialization key via ForwardSpec.
        self.matmul_impl = (
            "w8a8" if quantization == "mixed"
            else quantization if quantization in ("w8a8", "w4a8") else "dq"
        )
        self.mesh = None
        self.cache: Optional[KVCache] = None
        self.num_used_levels = 0
        self.level_filled: List[int] = []
        self.level_batch: List[int] = []
        # Shared-prefill inputs are right-padded up to a multiple of
        # prefill_bucket (seq_lens mask the padding): level_filled is a jit
        # specialization key, so without bucketing every distinct document
        # length compiles a fresh program for prefill AND every subsequent
        # decode/unique-prefill spec (SURVEY §7's compile-per-shape risk;
        # a 16K needles doc costs ~49 s of compile). 0 disables.
        self.prefill_bucket = prefill_bucket
        # Decode runs in eos_chunk-step scanned chunks with a host EOS check
        # between chunks when eos_token_id is set (reference breaks the loop,
        # llama.py:1337-1373); a single full-length scan otherwise. 0 disables.
        self.eos_chunk = eos_chunk
        self._disable_hydragen = False
        self._disable_attention = False
        if mesh is not None:
            self.shard(mesh)

    def shard(self, mesh):
        """Place params (and the cache, if allocated) on a device mesh.

        The TPU-native ``apply_tp`` (/root/reference/hydragen/tp.py:127-132):
        once inputs carry ``NamedSharding``s, every jitted step runs SPMD and
        GSPMD inserts the reference's per-layer all-reduces over ICI.
        """
        from hydragen_tpu.parallel import shard_cache, shard_params

        self.mesh = mesh
        self.params = shard_params(self.params, self.config, mesh)
        if self.cache is not None:
            self.cache = shard_cache(self.cache, self.config, mesh)

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_name_or_path: str, dtype: str = "bfloat16", **kw):
        from hydragen_tpu.models import hf

        # Quantization happens host-side during conversion so bf16 originals
        # never occupy device HBM alongside the int8 copies.
        cfg, params = hf.from_pretrained(
            model_name_or_path, dtype=dtype, quantization=kw.get("quantization")
        )
        return cls(cfg, params, **kw)

    @classmethod
    def from_hf_model(cls, hf_model, dtype: str = "bfloat16", **kw):
        from hydragen_tpu.models import hf

        cfg, params = hf.from_hf_model(hf_model, dtype=dtype)
        return cls(cfg, params, **kw)

    @classmethod
    def from_pretrained_tp(
        cls, model_name_or_path: str, tp: int = 0, dp: int = 1,
        dtype: str = "bfloat16", **kw,
    ):
        """Load + shard over a (dp, tp) mesh in one call.

        Parity with the reference's ``from_pretrained_tp`` (tp.py:135-178),
        minus the offline per-rank weight files (make_tp_files.py): under
        JAX's single-controller model the host loads once and
        ``jax.device_put`` scatters shards directly, so no ``{rank}.pt``
        stage exists.
        """
        from hydragen_tpu.parallel import make_mesh

        import jax

        if tp <= 0:
            tp = jax.device_count() // dp
        return cls.from_pretrained(
            model_name_or_path, dtype=dtype, mesh=make_mesh(tp=tp, dp=dp), **kw
        )

    def graph(self, *args, **kwargs):
        """API-parity shim (llama.py:898): CUDA-graph capture is replaced by
        jit specialization — compilation happens on first call and is cached
        on the same static attributes the reference's graph wrapper checks."""
        return self

    # -- cache management (llama.py:921-955, 1048-1071) ---------------------

    def setup_caches(
        self,
        max_unique_batch_size: int,
        max_unique_seq_length: int,
        max_shared_batch_sizes: Sequence[int] = (),
        max_shared_seq_lengths: Sequence[int] = (),
        cache_dtype=None,
        kv_quant: Optional[str] = None,
        unique_bshd: Optional[bool] = None,
        shared_kv_quant: str = "follow",
    ):
        """Pre-allocate all cache buffers (llama.py:921-955).

        kv_quant="int8" stores KV payloads int8 with per-(token, head) fp32
        scales — halves KV HBM footprint and decode-attention bandwidth.
        kv_quant="int4" nibble-packs the UNIQUE cache (quantize_kv4):
        another 2x on the dominant unique-read HBM term, read on the XLA
        attention path (planar-split dots, ops/reference.py); opt-in —
        gate quality with scripts/quality.py / tests/test_quant.py.
        unique_bshd: token-dim-outside-tile unique layout (see
        allocate_cache); None = auto by head geometry.
        shared_kv_quant: "follow" (default; shared levels match kv_quant),
        "none" (keep shared levels in the compute dtype — the shared prefix
        is read once per step regardless of batch, so int8 buys it little
        bandwidth while its dequant costs a VPU pass per score; "none" is
        the fast AND more exact choice at long prefixes), or "int8".
        """
        assert kv_quant in (None, "int8", "int4"), (
            f"unknown kv_quant {kv_quant!r}"
        )
        assert shared_kv_quant in ("follow", "none", "int8")
        if shared_kv_quant == "follow":
            # int4 applies to the unique cache only; "follow" gives the
            # shared levels int8 (the closest shared precision).
            shared_quantized = True if kv_quant == "int4" else None
        else:
            shared_quantized = shared_kv_quant == "int8"
        cfg = self.config
        # Round up so decode-kernel KV blocks tile cleanly.
        max_unique_seq_length = -(-max_unique_seq_length // 16) * 16
        self.cache = allocate_cache(
            cfg.num_hidden_layers,
            max_unique_batch_size,
            max_unique_seq_length,
            list(max_shared_batch_sizes),
            list(max_shared_seq_lengths),
            cfg.num_key_value_heads,
            cfg.head_dim,
            dtype=cache_dtype or cfg.jax_dtype,
            quantized=kv_quant in ("int8", "int4"),
            unique_bshd=unique_bshd,
            unique_bits=4 if kv_quant == "int4" else 8,
            # Flat lane-major scales fold the kv-head dim into lanes, which
            # a head-sharded mesh cannot split — keep the 4D layout there.
            flat_scales=False if self.mesh is not None else None,
            shared_quantized=shared_quantized,
        )
        self.num_used_levels = 0
        self.level_filled = []
        self.level_batch = []
        if self.mesh is not None:
            from hydragen_tpu.parallel import shard_cache

            self.cache = shard_cache(self.cache, cfg, self.mesh)

    def empty_shared_cache(self):
        self.truncate_shared_caches(0)

    def truncate_shared_caches(self, new_num: int):
        assert new_num <= len(self.cache.shared)
        self.num_used_levels = min(new_num, self.num_used_levels)
        self.level_filled = self.level_filled[: self.num_used_levels]
        self.level_batch = self.level_batch[: self.num_used_levels]

    def get_shared_cache_len(self, batch_size: int) -> jax.Array:
        return _shared_len(
            self.cache, self.num_used_levels, batch_size,
            tuple(self.level_batch) or None,
        )

    def get_num_used_shared_caches(self) -> int:
        return self.num_used_levels

    # -- specs --------------------------------------------------------------

    def _spec(self, mode: str, unique_history: bool) -> ForwardSpec:
        # Note: when disable_hydragen is set the levels are still carried in
        # the spec (position bookkeeping needs shared lengths) but the layer
        # body skips the level partials — XLA dead-code-eliminates the reads.
        return ForwardSpec(
            mode=mode,
            num_used_levels=self.num_used_levels,
            level_filled=tuple(self.level_filled),
            unique_history=unique_history,
            unique_filled=self.cache.max_unique_seq_len if unique_history else 0,
            disable_hydragen=self._disable_hydragen,
            disable_attention=self._disable_attention,
            impl=self.impl,
            sharded=self.mesh is not None,
            # Kept under meshes too (round 5): column-parallel families run
            # the s8 GEMMs per shard via shard_map (parallel/shard_gemm.py);
            # row-parallel/ineligible families fall back to dq inside qmm.
            matmul=self.matmul_impl,
            level_batch=tuple(self.level_batch),
        )

    # -- prefill entry points (llama.py:1073-1145) --------------------------

    def append_shared(self, input_ids, seq_lens=None, full_logits: bool = False):
        """Prefill a new shared level; returns its last-token logits.

        The level may be filled with *fewer* prefixes than allocated
        (reference SharedCache.fill, llama.py:120-167); subsequent batches
        must be divisible by the filled count. Inputs are right-padded to a
        ``prefill_bucket`` multiple (masked via seq_lens) so two documents of
        similar length reuse one compiled program.
        """
        assert self.cache is not None, "call setup_caches first"
        assert self.num_used_levels < len(self.cache.shared), "no free shared level"
        input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
        level = self.cache.shared[self.num_used_levels]
        b, t = input_ids.shape
        assert b <= level.max_batch_size, (
            f"level {self.num_used_levels} allocated for {level.max_batch_size} "
            f"prefixes, got {b}"
        )
        assert t <= level.max_seq_len, (
            f"level {self.num_used_levels} holds {level.max_seq_len} tokens, got {t}"
        )
        if seq_lens is not None:
            seq_lens = jnp.asarray(seq_lens, dtype=jnp.int32)
        input_ids, seq_lens, padded = _pad_to_bucket(
            input_ids, seq_lens, self.prefill_bucket, level.max_seq_len
        )
        has_pad = seq_lens is not None
        orig_t, t = t, int(input_ids.shape[1])
        spec = ForwardSpec(
            mode="shared_prefill",
            num_used_levels=self.num_used_levels,
            level_filled=tuple(self.level_filled),
            unique_history=False,
            unique_filled=0,
            disable_hydragen=False,
            disable_attention=self._disable_attention,
            impl=self.impl,
            sharded=self.mesh is not None,
            # Kept under meshes too (round 5): column-parallel families run
            # the s8 GEMMs per shard via shard_map (parallel/shard_gemm.py);
            # row-parallel/ineligible families fall back to dq inside qmm.
            matmul=self.matmul_impl,
            level_batch=tuple(self.level_batch),
        )
        logits, self.cache = _shared_prefill_step(
            self.params, self.cache, input_ids, seq_lens, self.config, spec,
            full_logits, has_pad, mesh=self.mesh,
        )
        self.num_used_levels += 1
        self.level_filled.append(t)
        self.level_batch.append(b)
        if full_logits and padded:
            # Bucketing padded the width; trailing columns are pad-position
            # logits — return the caller's true width.
            logits = logits[:, :orig_t]
        return logits

    def process_unique(self, input_ids, seq_lens=None):
        """Prefill per-sequence suffixes into the unique cache."""
        assert self.cache is not None
        input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
        has_pad = seq_lens is not None
        if has_pad:
            seq_lens = jnp.asarray(seq_lens, dtype=jnp.int32)
        spec = self._spec(
            "unique_prefill",
            unique_history=self._disable_hydragen and self.num_used_levels > 0,
        )
        logits, self.cache = _unique_prefill_step(
            self.params, self.cache, input_ids, seq_lens, self.config, spec,
            has_pad, mesh=self.mesh,
        )
        return logits

    # -- generation (llama.py:1156-1396) -------------------------------------

    def generate(
        self,
        input_ids: Union[None, jax.Array, np.ndarray, list] = None,
        seq_lens=None,
        starting_logits=None,
        num_return_sequences: int = 1,
        max_new_tokens: int = 5,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        eos_token_id: Optional[int] = None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
        return_logits: bool = False,
        shared_cache_op: str = SharedCacheOp.PRESERVE,
        disable_hydragen: bool = False,
        disable_attention: bool = False,
        disable_hierarchy: bool = False,
        token_overrides=None,
        seed: int = 0,
    ):
        assert self.cache is not None, "call setup_caches first"
        assert (input_ids is None) or (starting_logits is None)
        assert not (input_ids is None and starting_logits is None)
        if temperature < 0:
            raise ValueError(f"temperature must be non-negative, got {temperature}")
        # Normalize early: callers naturally pass ndarrays (every other token
        # argument accepts them) and ndarray truthiness raises.
        stop_sequences = tuple(
            tuple(int(t) for t in s) for s in stop_sequences
        ) if stop_sequences is not None else ()

        if input_ids is None:
            input_ids = []
        if isinstance(input_ids, (jnp.ndarray, np.ndarray)):
            input_ids = [input_ids]
        input_ids = [jnp.asarray(x, dtype=jnp.int32) for x in input_ids]

        if disable_attention:
            self._disable_attention = True

        if shared_cache_op == SharedCacheOp.WIPE:
            self.empty_shared_cache()

        og_levels = self.num_used_levels

        num_new_levels = len(input_ids) + (1 if num_return_sequences > 1 else 0)
        total_levels = og_levels + num_new_levels
        if disable_hydragen:
            assert total_levels == 2, "disable_hydragen supports exactly 2 levels"
            if len(input_ids) >= 1 and (num_return_sequences > 1 or len(input_ids) == 2):
                assert input_ids[0].shape[0] == 1
        if disable_hierarchy:
            assert total_levels == 3 and num_return_sequences > 1

        if seq_lens is None:
            seq_lens = [None] * len(input_ids)
        elif isinstance(seq_lens, (jnp.ndarray, np.ndarray)):
            seq_lens = [seq_lens]

        if len(input_ids) > 0:
            total_batch = int(input_ids[-1].shape[0]) * num_return_sequences
        else:
            total_batch = int(starting_logits.shape[0]) * num_return_sequences

        # Hierarchy split (llama.py:1277-1288).
        if num_return_sequences > 1 and not (disable_hierarchy or disable_hydragen):
            shared_ids, shared_lens_in = input_ids, seq_lens
            suffix_ids, suffix_lens = None, None
        elif len(input_ids) > 0:
            shared_ids, shared_lens_in = input_ids[:-1], seq_lens[:-1]
            suffix_ids, suffix_lens = input_ids[-1], seq_lens[-1]
        else:
            shared_ids, shared_lens_in, suffix_ids, suffix_lens = [], [], None, None

        if starting_logits is not None:
            starting_logits = jnp.asarray(starting_logits)[:, None, :]

        for sid, slen in zip(shared_ids, shared_lens_in):
            starting_logits = self.append_shared(sid, slen)

        if disable_hydragen:
            if self.cache is not None and self.cache.unique_bits == 4:
                raise ValueError(
                    "disable_hydragen is unsupported with kv_quant='int4': "
                    "the copied prefix would need traced-offset nibble "
                    "packs (run the ablation with kv_quant='int8')"
                )
            self._disable_hydragen = True
            if self.num_used_levels > 0:
                self.cache = _copy_shared_to_unique(
                    self.cache, total_batch, self.level_batch[0]
                )

        # Decode positions are uniform when no per-row lens were given OR
        # they are all equal (callers like scripts/needles.py pass explicit
        # lens even for rectangular batches — treating those as ragged
        # would force the scatter write path and reject int4 KV). Checked
        # on the host before bucketing pads: a static jit key either way.
        suffix_uniform = suffix_lens is None or bool(
            np.all(np.asarray(suffix_lens) == np.asarray(suffix_lens).flat[0])
        )
        if suffix_ids is not None:
            # Bucket the suffix width like append_shared does: unique-prefill
            # programs are keyed on t, so e.g. needles question batches of
            # varying lengths reuse one compiled program per bucket. Padding
            # KV past seq_lens is garbage but never attended (history_lens
            # masks it) and decode overwrites it from position seq_len on.
            # (Not in the disable_hydragen ablation: there the suffix block
            # is written at a dynamic offset after the copied prefix, and a
            # padded width could overflow the row.)
            bucket = 0 if disable_hydragen else self.prefill_bucket
            suffix_ids, suffix_lens, _ = _pad_to_bucket(
                jnp.asarray(suffix_ids, dtype=jnp.int32), suffix_lens,
                bucket, self.cache.max_unique_seq_len,
            )
            starting_logits = self.process_unique(suffix_ids, suffix_lens)
            suffix_batch = int(suffix_ids.shape[0])
            if num_return_sequences > 1:
                self.cache = _repeat_unique(
                    self.cache, suffix_batch, num_return_sequences
                )

        # First token (llama.py:1310-1320).
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        prefill_logits = starting_logits[:, -1]
        raw_first = _sample_first(
            prefill_logits, sub, temperature, top_p, num_return_sequences
        )
        first_token = raw_first.reshape(-1, 1)  # [total_batch, 1]

        logits_out = None
        if return_logits:
            logits_out = [jnp.repeat(prefill_logits, num_return_sequences, axis=0)]

        # Decode start positions (llama.py:1327-1335).
        start_pos = self.get_shared_cache_len(total_batch).astype(jnp.int32)
        if suffix_ids is not None:
            if suffix_lens is not None:
                sl = jnp.asarray(suffix_lens, dtype=jnp.int32)
            else:
                sl = jnp.full((suffix_ids.shape[0],), suffix_ids.shape[1], jnp.int32)
            start_pos = start_pos + jnp.repeat(sl, num_return_sequences)
        if disable_hydragen:
            start_unique_pos = start_pos
        elif suffix_ids is not None:
            start_unique_pos = jnp.repeat(sl, num_return_sequences).astype(jnp.int32)
        else:
            start_unique_pos = jnp.zeros((total_batch,), dtype=jnp.int32)

        use_overrides = token_overrides is not None
        if use_overrides:
            token_overrides = jnp.asarray(token_overrides, dtype=jnp.int32)
            input_first = token_overrides[:, 0:1]
            overrides_xs = token_overrides[:, 1:max_new_tokens].T
        else:
            input_first = first_token
            overrides_xs = jnp.zeros((max_new_tokens - 1, total_batch), jnp.int32)

        steps = max_new_tokens - 1
        if steps > 0:
            spec = self._spec("decode", unique_history=True)
            # Decode positions are uniform across rows unless the suffix
            # prefill was ragged (then per-row scatter is required).
            uniform_pos = suffix_uniform

            # EOS early-exit (llama.py:1337-1373): decode in fixed-size
            # scanned chunks with one host check between chunks, so a batch
            # that finishes at token 3 of max_new=256 pays ~1 chunk, not the
            # full budget. Without an eos the whole budget is one scan.
            # token_overrides force-replay a fixed stream: a *sampled* EOS
            # must not cut the replay short (the remaining forced steps and
            # their logits would be lost), so overrides run one full scan.
            stops_active = (
                (eos_token_id is not None or stop_sequences)
                and not use_overrides
            )
            chunk = self.eos_chunk if stops_active else 0
            if not chunk or chunk >= steps:
                plan = [steps]
            else:
                plan = [chunk] * (steps // chunk)
                if steps % chunk:
                    plan.append(steps % chunk)

            tok_chunks = [first_token]
            cur_tok = input_first
            done = 0
            # Incremental inter-chunk matching: carry a per-row finished
            # vector plus the last (max_stop_len - 1) tokens, and rematch
            # only [tail, new chunk] each boundary — O(chunk) host work per
            # boundary (not a full-stream rescan), while stop sequences
            # spanning a chunk boundary still match inside the window.
            fin_rows = None
            max_l = max((len(s) for s in stop_sequences), default=1)
            tail = np.asarray(first_token)
            for c in plan:
                toks, step_logits, self.cache, cur_tok, rng = _decode_steps(
                    self.params, self.cache, cur_tok, start_pos + done,
                    start_unique_pos + done, rng, overrides_xs[done : done + c],
                    self.config, spec, c, temperature, top_p, use_overrides,
                    return_logits, uniform_pos=uniform_pos, mesh=self.mesh,
                )
                done += c
                tok_chunks.append(toks)
                if return_logits:
                    logits_out.extend(list(step_logits))
                if stops_active and len(plan) > 1:
                    window = np.concatenate([tail, np.asarray(toks)], axis=1)
                    fin = _finished_mask(window, eos_token_id, stop_sequences)
                    hit = fin[:, -1]  # finished anywhere in the window
                    fin_rows = hit if fin_rows is None else (fin_rows | hit)
                    if fin_rows.all():
                        break
                    tail = window[:, window.shape[1] - (max_l - 1):] \
                        if max_l > 1 else window[:, :0]
            tokens = jnp.concatenate(tok_chunks, axis=1)
        else:
            tokens = first_token

        # Early-stop semantics (llama.py:1337-1373): the reference breaks the
        # loop when all rows have finished, without appending the final
        # sampled token; replicate by truncating at the first column where
        # every row has hit EOS or completed a stop sequence.
        if (eos_token_id is not None or stop_sequences) and tokens.shape[1] > 1:
            tokens_np = np.asarray(tokens)
            fin = _finished_mask(tokens_np, eos_token_id, stop_sequences)
            all_done = fin.all(axis=0)
            keep = tokens_np.shape[1]
            if all_done.any():
                keep = max(1, int(np.argmax(all_done)))
            tokens = jnp.asarray(tokens_np[:, :keep])
            if return_logits:
                logits_out = logits_out[:keep]

        # Epilogue (llama.py:1384-1391).
        if shared_cache_op == SharedCacheOp.PRESERVE:
            self.truncate_shared_caches(og_levels)
        if disable_hydragen:
            self._disable_hydragen = False
        if disable_attention:
            self._disable_attention = False

        if return_logits:
            return tokens, logits_out
        return tokens
