"""The Hydragen attention op: shared-prefix decomposition + inter-sequence batching.

TPU-native re-design of ``/root/reference/hydragen/attention.py:177-392``.

For a batch of ``b`` sequences whose KV history factors into a stack of shared
levels (level ``i`` holds ``sb_i`` distinct prefixes, ``sb_i | b``) plus a
per-sequence unique suffix, attention is computed per level and merged exactly
via log-sum-exp:

1.  **Inter-sequence batching**: queries of all ``b // sb_i`` sequences that
    share prefix ``j`` of level ``i`` are folded into the query-length
    dimension, so prefix attention is one big matmul per shared sequence —
    the prefix KV is read from HBM once for the whole group and the MXU sees
    a tall M dimension even at decode (``nq == 1``).
2.  **Unique suffix**: causal self-attention during prefill
    (``seq_lens=None``) or length-masked attention over the mutable unique KV
    cache during decode (``seq_lens`` given).
3.  ``combine_lse`` merges all partials exactly.

Differences from the CUDA reference, by TPU design:
- No packed varlen path. Ragged shared levels are right-padded + ``seq_lens``
  masks; the kernels skip fully-masked KV blocks, so padding costs HBM
  capacity but almost no bandwidth/compute.
- The internal canonical layout is BHSD (see ``ops/reference.py``); the
  public op keeps the reference's BSHD signature.
"""

from __future__ import annotations

from typing import Sequence

import jax


from hydragen_tpu.ops.combine import combine_lse
from hydragen_tpu.ops.reference import attention_bhsd


def pallas_wins(m: int, s: int) -> bool:
    """The measured Pallas-vs-XLA crossover for a (folded-M, KV-length)
    attention read: Pallas once the score matrix is big enough that XLA
    materializes it in HBM — always at M >= 256, from M >= 128 once the KV
    stream is long (measured M=128/S=16K: pallas 420 us vs XLA 604 us; at
    M=64 XLA still fuses the softmax and wins 3x). The SINGLE source of
    truth — the cached-read gate (models/llama.py _shared_cached_ok) and the
    shard_map gates (_mesh_level_attn_ok) apply the same rule to their
    per-call / per-shard shapes, so retuning it here retunes every path.
    """
    return (m >= 256 and s >= 1024) or (m >= 128 and s >= 8192)


def _pick_impl(impl: str | None) -> str:
    if impl is not None:
        return impl
    if jax.default_backend() == "tpu":
        try:  # Pallas kernels are available on TPU; dispatch is shape-aware.
            from hydragen_tpu.ops import flash  # noqa: F401

            return "auto"
        except ImportError:
            return "xla"
    return "xla"


def _attention(q, k, v, *, causal, kv_seq_lens, impl, kv_mask=None,
               kv_bshd=False, kv_bits=8):
    """Dispatch a single BHSD (out, lse) attention to the selected backend.

    ``k``/``v`` may each be an ``(int8 payload, f32 scale)`` pair for a
    quantized KV source: the Pallas kernels dequantize in-register (halved
    KV bandwidth); the XLA path dequantizes up front and lets the compiler
    fuse the convert+multiply into the attention einsum's operand read.

    ``impl="auto"`` picks per call site from the (static) shapes: the Pallas
    kernels win when the score matrix is large (long-prefix prefill — 1.7x
    measured at M=4096, S=16K on v5e) because XLA materializes masked fp32
    scores in HBM there; at decode scale (M small) XLA's fused
    matvec-softmax chain is faster than a grid of small kernel blocks, so
    small calls go to XLA.
    """
    k, ks = k if isinstance(k, tuple) else (k, None)
    v, vs = v if isinstance(v, tuple) else (v, None)
    if kv_mask is not None or kv_bshd or kv_bits != 8:
        # Arbitrary masks, the BSHD unique-cache layout, and INT4 token-
        # packed payloads (ops/quant.quantize_kv4 + cache write paths)
        # exist only on the XLA path (the Pallas kernels dequantize int8).
        impl = "xla"
    elif impl == "auto":
        M, s = q.shape[2], k.shape[2]
        impl = "pallas" if pallas_wins(M, s) else "xla"
    if impl == "xla":
        return attention_bhsd(
            q, k, v, causal=causal, kv_seq_lens=kv_seq_lens, kv_mask=kv_mask,
            k_scale=ks, v_scale=vs, kv_bshd=kv_bshd, kv_bits=kv_bits,
        )
    elif impl == "pallas":
        from hydragen_tpu.ops.flash import flash_attention_bhsd

        return flash_attention_bhsd(
            q, k, v, causal=causal, kv_seq_lens=kv_seq_lens,
            k_scale=ks, v_scale=vs,
        )
    else:
        raise ValueError(f"unknown attention impl {impl!r}")


def fold_queries_for_shared(q: jax.Array, sb: int) -> jax.Array:
    """Inter-sequence batching: [b, hq, nq, d] -> [sb, hq, (b//sb)*nq, d]."""
    b, hq, nq, d = q.shape
    sps = b // sb
    return (
        q.reshape(sb, sps, hq, nq, d).transpose(0, 2, 1, 3, 4).reshape(sb, hq, sps * nq, d)
    )


def unfold_shared_out(s_out: jax.Array, b: int, nq: int) -> jax.Array:
    """Inverse of fold_queries_for_shared for [sb, hq, sps*nq, d] outputs."""
    sb, hq, _, d = s_out.shape
    sps = b // sb
    return (
        s_out.reshape(sb, hq, sps, nq, d).transpose(0, 2, 1, 3, 4).reshape(b, hq, nq, d)
    )


def unfold_shared_lse(s_lse: jax.Array, b: int, nq: int) -> jax.Array:
    sb, hq, _ = s_lse.shape
    sps = b // sb
    return s_lse.reshape(sb, hq, sps, nq).transpose(0, 2, 1, 3).reshape(b, hq, nq)


def hydragen_attention_bhsd(
    q: jax.Array,
    k: jax.Array | None,
    v: jax.Array | None,
    shared_ks: Sequence[jax.Array],
    shared_vs: Sequence[jax.Array],
    shared_seq_lens: Sequence[jax.Array | None],
    seq_lens: jax.Array | None = None,
    *,
    impl: str | None = None,
):
    """Canonical-layout Hydragen attention.

    Args:
        q: ``[b, hq, nq, d]``.
        k, v: ``[b, hkv, kv_len, d]`` unique-per-sequence KV (or None/empty).
        shared_ks/vs: per level ``[sb_i, hkv, slen_i, d]``, ``b % sb_i == 0``.
        shared_seq_lens: per level ``[sb_i]`` int32 or None (= full length).
        seq_lens: ``[b]`` true unique lengths, or None => causal self-attend.
        impl: "xla" | "pallas" | None (auto: pallas on TPU).

    Returns:
        ``[b, hq, nq, d]`` in q's dtype.
    """
    impl = _pick_impl(impl)
    b, hq, nq, d = q.shape
    assert len(shared_ks) == len(shared_vs) == len(shared_seq_lens)

    has_unique = k is not None and k.shape[2] > 0
    outs, lses = [], []

    for sk, sv, slens in zip(shared_ks, shared_vs, shared_seq_lens):
        sb = sk.shape[0]
        assert b % sb == 0, f"shared batch {sb} must divide batch {b}"
        batched_q = fold_queries_for_shared(q, sb)
        s_out, s_lse = _attention(
            batched_q, sk, sv, causal=False, kv_seq_lens=slens, impl=impl
        )

        s_out = unfold_shared_out(s_out, b, nq)
        if not has_unique and len(shared_ks) == 1:
            return s_out
        outs.append(s_out)
        lses.append(unfold_shared_lse(s_lse, b, nq))

    if has_unique:
        if seq_lens is None:
            u_out, u_lse = _attention(q, k, v, causal=True, kv_seq_lens=None, impl=impl)
        else:
            u_out, u_lse = _attention(
                q, k, v, causal=False, kv_seq_lens=seq_lens, impl=impl
            )
        outs.append(u_out)
        lses.append(u_lse)

    assert outs, "hydragen_attention needs at least one KV source"
    return combine_lse(outs, lses)


def hydragen_attention(
    q: jax.Array,
    k: jax.Array | None,
    v: jax.Array | None,
    shared_ks: Sequence[jax.Array],
    shared_vs: Sequence[jax.Array],
    shared_seq_lens: Sequence[jax.Array | None],
    seq_lens: jax.Array | None = None,
    *,
    impl: str | None = None,
):
    """Public BSHD op (reference-parity signature, attention.py:177-226).

    q ``[b, nq, hq, d]``; k/v ``[b, kvlen, hkv, d]``; shared levels
    ``[sb_i, slen_i, hkv, d]``. Returns ``[b, nq, hq, d]``.
    """
    t = lambda x: x.transpose(0, 2, 1, 3) if x is not None else None
    out = hydragen_attention_bhsd(
        t(q), t(k), t(v),
        [t(x) for x in shared_ks],
        [t(x) for x in shared_vs],
        shared_seq_lens,
        seq_lens,
        impl=impl,
    )
    return out.transpose(0, 2, 1, 3)
