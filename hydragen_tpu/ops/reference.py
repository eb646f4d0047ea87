"""Pure-JAX (XLA) attention with log-sum-exp output.

This is the numerical oracle for the Pallas kernels and also the fallback
compute path on non-TPU backends. It plays the role the external flash-attn
package plays in the reference (``/root/reference/hydragen/flash.py:163-350``):
a batched attention that returns ``(out, lse)`` so partial attentions over
different KV sources can be exactly merged with ``combine_lse``.

Layout conventions:
- The **internal canonical layout is BHSD**: ``q [b, hq, m, d]``,
  ``k/v [b, hkv, s, d]``, ``out [b, hq, m, d]``, ``lse [b, hq, m]`` (fp32).
  On TPU, HBM tiling packs the last two dims into (sublane, lane) tiles, so
  keeping ``(seq, head_dim)`` innermost avoids padding tiny GQA/MQA head
  counts up to 8 sublanes (an up-to-8x KV-cache HBM waste in a
  ``[..., s, hkv, hd]`` layout). It also makes GQA query-head folding into
  the matmul M dimension a pure reshape.
- The **public API mirrors the reference's BSHD** (``[batch, len, heads,
  dim]``) via thin transpose wrappers.

Unlike flash-attn there is no packed varlen layout: ragged batches are always
expressed as right-padded arrays plus ``kv_seq_lens`` masks, which maps
directly onto TPU static shapes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.quant import unpack4

# Large negative instead of -inf so exp(mask - mask) never yields NaN.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


@partial(jax.jit, static_argnames=("causal", "scale", "kv_bshd", "kv_bits"))
def attention_bhsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_seq_lens: jax.Array | None = None,
    scale: float | None = None,
    kv_mask: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    kv_bshd: bool = False,
    kv_bits: int = 8,
):
    """Canonical-layout attention returning ``(out, lse)``.

    Args:
        q: ``[b, hq, m, d]`` queries.
        k: ``[b, hkv, s, d]`` keys (GQA: ``hq % hkv == 0``; query head ``h``
            reads kv head ``h // (hq//hkv)``).
        v: ``[b, hkv, s, d]`` values.
        causal: query at position ``i`` attends kv positions
            ``j <= i + (s - m)`` (diagonal aligned to the end).
        kv_seq_lens: optional ``[b]`` int; kv positions ``>= len`` masked.
        scale: softmax scale, default ``1/sqrt(d)``.
        kv_mask: optional ``[b, s]`` bool; False positions masked. Used by
            the ring-slot continuous-batching pool, whose valid tokens form
            a wrapped window rather than a prefix (core/batching.py).
        k_scale, v_scale: optional ``[b, hkv, s]`` f32 — k/v hold int8
            payloads. The per-token scales commute out of both dots (onto
            score and probability columns), so the payload feeds the einsum
            through a bare convert — which XLA fuses into the dot operand —
            and no dequantized bf16 copy is ever materialized in HBM
            (measured 3x on the decode unique-cache read at 7B bs256).
        kv_bits: 4 = k/v are INT4 nibble packs along the TOKEN axis
            (core/cache.py write paths: byte row j holds token j low,
            token j + S/2 high; S/2 byte rows represent S logical tokens,
            so payload seq length is halved — head_dim packing would halve
            the minor dim to 64 and XLA's (8, 128) tiling would pad it
            straight back). The score dot runs once per nibble plane and
            the planes concatenate on the OUTPUT s axis (natural token
            order); the value dot contracts the two contiguous s halves
            separately and sums. The unpack (two shifts) is elementwise on
            each dot operand; scales (full logical-S length) commute
            identically to int8.
        kv_bshd: k/v (and their scales) arrive ``[b, s, hkv, d]`` /
            ``[b, s, hkv]`` — the unique cache's write-optimal layout
            (core/cache.py allocate_cache). Only the einsum subscripts
            change; the math is identical.

    Returns:
        out ``[b, hq, m, d]`` (q.dtype), lse ``[b, hq, m]`` (float32) =
        natural-log sum of ``exp(scale * q.k)`` over unmasked positions
        (``-inf`` for fully-masked rows).
    """
    b, hq, m, d = q.shape
    if kv_bshd:
        _, sp, hkv, dk = k.shape
    else:
        _, hkv, sp, dk = k.shape
    assert dk == d, f"kv head_dim {dk} != q head_dim {d}"
    assert hq % hkv == 0, f"GQA requires hq % hkv == 0, got {hq} {hkv}"
    group = hq // hkv
    assert kv_bits in (8, 4)
    int4 = kv_bits == 4
    assert not int4 or k_scale is not None, "int4 KV requires scales"
    s = 2 * sp if int4 else sp  # logical token count

    if scale is None:
        scale = 1.0 / math.sqrt(d)

    assert (k_scale is None) == (v_scale is None)
    qf = q.astype(jnp.float32) * scale
    qg = qf.reshape(b, hkv, group, m, d)
    k_sub = "bskd" if kv_bshd else "bksd"
    if int4:
        klo, khi = unpack4(k)  # int8 planes: tokens [0, sp) / [sp, 2sp)
        scores = jnp.concatenate(
            [
                jnp.einsum(f"bkgmd,{k_sub}->bkgms", qg, klo.astype(jnp.float32)),
                jnp.einsum(f"bkgmd,{k_sub}->bkgms", qg, khi.astype(jnp.float32)),
            ],
            axis=-1,  # output s axis — natural token order, not contracted
        )
    else:
        kf = k.astype(jnp.float32)
        scores = jnp.einsum(f"bkgmd,{k_sub}->bkgms", qg, kf)  # [b,hkv,g,m,s]
    if k_scale is not None:
        ksf = k_scale.astype(jnp.float32)
        if kv_bshd:
            ksf = ksf.transpose(0, 2, 1)
        scores = scores * ksf[:, :, None, None, :]

    mask = jnp.ones((b, 1, 1, m, s), dtype=bool)
    if causal:
        qpos = jnp.arange(m)[:, None] + (s - m)
        kpos = jnp.arange(s)[None, :]
        mask = mask & (kpos <= qpos)[None, None, None]
    if kv_seq_lens is not None:
        kpos = jnp.arange(s)
        mask = mask & (kpos[None, :] < kv_seq_lens[:, None])[:, None, None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, None, :]

    scores = jnp.where(mask, scores, MASK_VALUE)

    mx = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.maximum(mx, -1e30)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)

    pn = p / l_safe
    if v_scale is not None:
        vsf = v_scale.astype(jnp.float32)
        if kv_bshd:
            vsf = vsf.transpose(0, 2, 1)
        pn = pn * vsf[:, :, None, None, :]
    if int4:
        vlo, vhi = unpack4(v)
        # s is CONTRACTED here: the two contiguous halves dot separately.
        o = (
            jnp.einsum(f"bkgms,{k_sub}->bkgmd", pn[..., :sp],
                       vlo.astype(jnp.float32))
            + jnp.einsum(f"bkgms,{k_sub}->bkgmd", pn[..., sp:],
                         vhi.astype(jnp.float32))
        )
    else:
        o = jnp.einsum(f"bkgms,{k_sub}->bkgmd", pn, v.astype(jnp.float32))
    out = o.reshape(b, hq, m, d).astype(q.dtype)

    lse = m_safe[..., 0] + jnp.log(l_safe[..., 0])  # [b, hkv, grp, m]
    lse = jnp.where(l[..., 0] == 0.0, -jnp.inf, lse).reshape(b, hq, m)

    return out, lse


def attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_seq_lens: jax.Array | None = None,
    scale: float | None = None,
):
    """Public BSHD wrapper: q ``[b, m, hq, d]``, k/v ``[b, s, hkv, d]``.

    Returns out ``[b, m, hq, d]``, lse ``[b, m, hq]``.
    """
    out, lse = attention_bhsd(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=causal,
        kv_seq_lens=kv_seq_lens,
        scale=scale,
    )
    return out.transpose(0, 2, 1, 3), lse.transpose(0, 2, 1)
