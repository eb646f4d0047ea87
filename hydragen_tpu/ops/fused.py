"""Fused Hydragen decode attention: one kernel per layer for all KV sources.

The decomposed decode path launches, per layer, one kernel per shared level
plus one for the unique cache and then merges with ``combine_lse``
(mirroring /root/reference/hydragen/attention.py:177-392). On TPU the decode
loop is latency-sensitive — every extra kernel launch and HBM round-trip of
``(out, lse)`` partials costs more than the math — so this kernel computes

    softmax over [ shared_prefix(level 0) ++ unique_suffix(row) ]

in a single online-softmax pass per (row-chunk, kv-head) grid cell:

- **Stage 1 (shared)**: all rows in the chunk share prefix ``j``, so prefix
  KV blocks are read once per chunk and the matmul M-dim is
  ``rows*group*mq`` — inter-sequence batching exactly as the standalone op.
- **Stage 2 (unique)**: the chunk's rows' own KV is processed block-
  diagonally (same trick as the row-batched decode kernel): the redundant
  FLOPs are free because this stage is HBM-bound.

The LSE merge across the two stages is implicit in the shared online-softmax
state (m, l) — no partials ever hit HBM. The current token's own KV is still
merged outside (it is computed in-layer, after RoPE, and never cached until
the step completes); that merge is one cheap VPU op.

Supports one shared level (the overwhelmingly common case and every
benchmark protocol of the reference); deeper hierarchies fall back to the
decomposed path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydragen_tpu.ops.flash import LN2, LOG2E

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_CLAMP = -1e30  # see ops/flash.py: exp-max clamp replaces the p-mask pass
LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _largest_divisor_le(n: int, cap: int) -> int:
    for c in range(min(n, cap), 0, -1):
        if n % c == 0:
            return c
    return 1


def _fused_kernel(
    lidx_ref,       # scalar prefetch: [1] layer index (0 when unstacked)
    slens_ref,      # scalar prefetch: [sb] shared lens
    cmax_ref,       # scalar prefetch: [nchunks] per-chunk max unique len
    q_ref,          # [Rc, 1, Gm, dp]
    sk_ref,         # [1, 1, bk_s, dp]  (leading L dim consumed by BlockSpec)
    sv_ref,         # [1, 1, bk_s, dp]
    uk_ref,         # [Rc, 1, bk_u, dp]
    uv_ref,         # [Rc, 1, bk_u, dp]
    *rest,          # [sks, svs ([1,1,1,1,bk_s] f32), uks, uvs
                    # ([1,Rc,1,1,bk_u])] when quantized, then ulens_ref
                    # ([Rc,1] int32 VMEM), o_ref, lse_ref, m_scr, l_scr,
                    # acc_scr
    hkv: int,
    sps: int,
    rc: int,
    gm: int,
    bk_s: int,
    bk_u: int,
    n_s: int,
    n_u: int,
    s_len: int,
    u_len: int,
    scale: float,
    quantized: bool = False,
):
    if quantized:
        (sks_ref, svs_ref, uks_ref, uvs_ref, ulens_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    else:
        ulens_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

    ch = pl.program_id(0)
    ki = pl.program_id(1)
    c = ch // hkv
    mc = rc * gm

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def online_update(s, mask, v, vcols=None):
        # s: [mc, N] fp32 scores (pre-mask); v: [N, dp]; vcols: [1, N]
        # per-column v dequant scales (already zeroed where invalid).
        if scale != 1.0:  # caller pre-scales q
            s = s * scale
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:, 0:1]
        l_prev = l_scr[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        # exp2 space (q pre-scale carries LOG2E, ops/flash.py discipline).
        alpha = jnp.exp2(m_prev - m_next)
        # Clamped max: masked (NEG_INF) scores underflow exp2 to exactly 0.
        p = jnp.exp2(s - jnp.maximum(m_next, NEG_CLAMP))
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        if vcols is not None:
            p = p * vcols
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    j = (c * rc) // sps
    slimit = slens_ref[j]

    in_shared = ki < n_s
    run_shared = jnp.logical_and(in_shared, ki * bk_s < slimit)

    @pl.when(run_shared)
    def _shared():
        q = q_ref[...].reshape(mc, q_ref.shape[-1])
        k = sk_ref[0, 0, 0]
        if quantized:
            k = k.astype(q.dtype)  # int8 values are exact in bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [mc, bk_s]
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        inb = ki * bk_s + cols < slimit
        if quantized:
            # Per-token k scale onto score columns; masked-out columns hit
            # NEG_INF below so possible NaN padding is benign.
            s = s * sks_ref[0, 0, 0]
        mask = inb
        v = sv_ref[0, 0, 0]
        vcols = None
        if quantized:
            v = v.astype(q.dtype)
            vcols = svs_ref[0, 0, 0]
            vcols = jnp.where(
                ki * bk_s + jax.lax.broadcasted_iota(jnp.int32, vcols.shape, 1)
                < slimit, vcols, 0.0,
            )
        vrows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(ki * bk_s + vrows < s_len, v, jnp.zeros((), v.dtype))
        online_update(s, mask, v, vcols)

    uki = ki - n_s
    ulimit = cmax_ref[c]
    run_unique = jnp.logical_and(ki >= n_s, uki * bk_u < ulimit)

    @pl.when(run_unique)
    def _unique():
        q = q_ref[...].reshape(mc, q_ref.shape[-1])
        k = uk_ref[0, :, 0].reshape(rc * bk_u, uk_ref.shape[-1])
        if quantized:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [mc, rc*bk_u]
        if quantized:
            from hydragen_tpu.ops.flash import _flatten_rows_to_lanes

            s = s * _flatten_rows_to_lanes(uks_ref[0, :, 0, 0], rc, bk_u)
        mrows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ri = mrows // gm          # chunk-local row of the query
        rj = cols // bk_u         # chunk-local row of the key
        kpos = uki * bk_u + (cols % bk_u)
        ul2 = ulens_ref[...]                          # [rc, 1]

        # Mosaic supports neither >=2D gathers nor sublane->lane reshapes, so
        # expand the per-row length vector with a one-hot MXU matmul:
        # onehot[i, r] = (i // reps == r); onehot @ lens -> lens per row.
        def expand(reps, out_rows):
            oi = jax.lax.broadcasted_iota(jnp.int32, (out_rows, rc), 0) // reps
            oc = jax.lax.broadcasted_iota(jnp.int32, (out_rows, rc), 1)
            onehot = (oi == oc).astype(jnp.float32)
            return jax.lax.dot_general(
                onehot, ul2.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [out_rows, 1] f32 (exact for lens < 2^24)

        own_len = expand(gm, mc)                      # [mc, 1]
        mask = jnp.logical_and(ri == rj, kpos.astype(jnp.float32) < own_len)

        v = uv_ref[0, :, 0].reshape(rc * bk_u, uv_ref.shape[-1])
        vcols = None
        if quantized:
            from hydragen_tpu.ops.flash import _flatten_rows_to_lanes

            v = v.astype(q.dtype)
            vcols = _flatten_rows_to_lanes(uvs_ref[0, :, 0, 0], rc, bk_u)
            # Per-column validity: col c belongs to chunk row c // bk_u with
            # kv position uki*bk_u + c % bk_u; zero scales past that row's
            # length (covers possible NaN padding past the array too).
            ci = jax.lax.broadcasted_iota(jnp.int32, vcols.shape, 1)
            lens_cols = _flatten_rows_to_lanes(
                jnp.broadcast_to(ul2.astype(jnp.float32), (rc, bk_u)), rc, bk_u
            )
            vpos = (uki * bk_u + (ci % bk_u)).astype(jnp.float32)
            vcols = jnp.where(vpos < lens_cols, vcols, 0.0)
        # Zero only rows beyond the *array* (unspecified padding of the last
        # block; may be NaN and 0*NaN would poison p@v). Rows within the
        # array but past a sequence's length hold finite stale values and are
        # already killed by p == 0.
        vrows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        in_array = uki * bk_u + (vrows % bk_u) < u_len
        v = jnp.where(in_array, v, jnp.zeros((), v.dtype))
        online_update(s, mask, v, vcols)

    @pl.when(ki == n_s + n_u - 1)
    def _emit():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scr[...] / l_safe).astype(o_ref.dtype).reshape(o_ref.shape)
        m = m_scr[:, 0:1]  # base-2 running max; LSE stays natural-log
        lse = jnp.where(l == 0.0, -jnp.inf, m * LN2 + jnp.log(l_safe))
        lse_ref[...] = jnp.broadcast_to(lse, (mc, LANES)).astype(jnp.float32).reshape(
            lse_ref.shape
        )


def _fused_call(
    lidx: jax.Array,          # [1] layer index into the stacked caches
    q: jax.Array,             # [b, hq, 1, d]
    shared_k: jax.Array,      # [L, sb, hkv, S, d]
    shared_v: jax.Array,
    shared_lens: jax.Array | None,
    unique_k: jax.Array,      # [L, b, hkv, U, d]
    unique_v: jax.Array,
    unique_lens: jax.Array,   # [b]
    scale: float | None,
    block_k_shared: int | None,
    block_k_unique: int | None,
    interpret: bool | None,
    shared_scales=None,   # (k_scale, v_scale) [L, sb, hkv, S] f32 for int8 KV
    unique_scales=None,   # (k_scale, v_scale) [L, b, hkv, U] f32
):
    quantized = shared_scales is not None
    assert (shared_scales is None) == (unique_scales is None), (
        "int8 KV quantization applies to the whole cache"
    )
    b, hq, mq, d = q.shape
    _, sb, hkv, S, _ = shared_k.shape
    _, _, _, U, _ = unique_k.shape
    assert mq == 1, "fused decode kernel handles single-query decode"
    assert b % sb == 0 and hq % hkv == 0
    sps = b // sb
    gm = (hq // hkv) * mq
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dp = max(_round_up(d, LANES), LANES)
    bk_s = block_k_shared or min(512, max(LANES, _round_up(min(S, 512), LANES)))
    bk_u = block_k_unique or min(256, max(LANES, _round_up(min(U, 256), LANES)))

    # Rows per chunk: cap the unique-stage KV block (~Rc*bk_u*dp*2B) and the
    # matmul M dim; must divide sps so a chunk never spans two prefixes.
    cap = max(1, min(64, 4096 // max(1, gm) // 16))  # <= 64 rows
    rc = _largest_divisor_le(sps, cap)
    nchunks = b // rc
    mc = rc * gm

    n_s = -(-S // bk_s)
    n_u = -(-U // bk_u)

    if shared_lens is None:
        shared_lens = jnp.full((sb,), S, jnp.int32)
    else:
        shared_lens = jnp.minimum(shared_lens.astype(jnp.int32), S)
    unique_lens = jnp.minimum(unique_lens.astype(jnp.int32), U)
    chunk_max = jnp.max(unique_lens.reshape(nchunks, rc), axis=1)

    # GQA fold: [b, hq, 1, d] -> [b, hkv, gm, d] (pure reshape in BHSD). The
    # big stacked caches are NOT padded — the cached fast path requires
    # d == dp so the kernel DMAs straight out of the cache buffers; only the
    # small per-step q is padded when d < 128 (test-sized heads).
    qf = q.reshape(b, hkv, gm, d)
    # Pre-scale q once instead of every score (VPU-bound); LOG2E folded in
    # for the exp2-space softmax (ops/flash.py discipline).
    qf = (qf.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    scale = 1.0
    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    if d != dp:
        pad5 = ((0, 0), (0, 0), (0, 0), (0, 0), (0, dp - d))
        shared_k = jnp.pad(shared_k, pad5)
        shared_v = jnp.pad(shared_v, pad5)
        unique_k = jnp.pad(unique_k, pad5)
        unique_v = jnp.pad(unique_v, pad5)
    ul2 = unique_lens[:, None]

    def q_index(ch, ki, li, sl, cm):
        return (ch // hkv, ch % hkv, 0, 0)

    def skv_index(ch, ki, li, sl, cm):
        c = ch // hkv
        j = (c * rc) // sps
        last = jnp.maximum((sl[j] + bk_s - 1) // bk_s - 1, 0)
        return (li[0], j, ch % hkv, jnp.minimum(ki, last), 0)

    def ukv_index(ch, ki, li, sl, cm):
        c = ch // hkv
        uki = jnp.clip(ki - n_s, 0, n_u - 1)
        last = jnp.maximum((cm[c] + bk_u - 1) // bk_u - 1, 0)
        return (li[0], c, ch % hkv, jnp.minimum(uki, last), 0)

    def ulens_index(ch, ki, li, sl, cm):
        return (ch // hkv, 0)

    def sscale_index(ch, ki, li, sl, cm):
        i = skv_index(ch, ki, li, sl, cm)
        return (i[0], i[1], i[2], 0, i[3])

    def uscale_index(ch, ki, li, sl, cm):
        i = ukv_index(ch, ki, li, sl, cm)
        return (i[0], i[1], i[2], 0, i[3])

    kernel = functools.partial(
        _fused_kernel,
        hkv=hkv, sps=sps, rc=rc, gm=gm, bk_s=bk_s, bk_u=bk_u,
        n_s=n_s, n_u=n_u, s_len=S, u_len=U, scale=scale,
        quantized=quantized,
    )

    in_specs = [
        pl.BlockSpec((rc, 1, gm, dp), q_index),
        pl.BlockSpec((1, 1, 1, bk_s, dp), skv_index),
        pl.BlockSpec((1, 1, 1, bk_s, dp), skv_index),
        pl.BlockSpec((1, rc, 1, bk_u, dp), ukv_index),
        pl.BlockSpec((1, rc, 1, bk_u, dp), ukv_index),
    ]
    operands = [lidx, shared_lens, chunk_max, qp, shared_k, shared_v,
                unique_k, unique_v]
    if quantized:
        # Unit dim before the token axis: the block's last-two dims become
        # (1 = full-dim, bk) — the Mosaic-legal per-token scale row layout.
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, bk_s), sscale_index),
            pl.BlockSpec((1, 1, 1, 1, bk_s), sscale_index),
            pl.BlockSpec((1, rc, 1, 1, bk_u), uscale_index),
            pl.BlockSpec((1, rc, 1, 1, bk_u), uscale_index),
        ]
        operands += [
            shared_scales[0].astype(jnp.float32)[:, :, :, None, :],
            shared_scales[1].astype(jnp.float32)[:, :, :, None, :],
            unique_scales[0].astype(jnp.float32)[:, :, :, None, :],
            unique_scales[1].astype(jnp.float32)[:, :, :, None, :],
        ]
    in_specs.append(pl.BlockSpec((rc, 1), ulens_index))
    operands.append(ul2)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nchunks * hkv, n_s + n_u),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((rc, 1, gm, dp), q_index),
                pl.BlockSpec((rc, 1, gm, LANES), q_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((mc, LANES), jnp.float32),
                pltpu.VMEM((mc, LANES), jnp.float32),
                pltpu.VMEM((mc, dp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, gm, dp), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, gm, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    out = out[..., :d].reshape(b, hq, mq, d)
    lse = lse[..., 0].reshape(b, hq, mq)
    return out.astype(q.dtype), lse


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_k_shared", "block_k_unique", "interpret"),
)
def fused_hydragen_decode_bhsd(
    q: jax.Array,            # [b, hq, 1, d]
    shared_k: jax.Array,     # [sb, hkv, S, d]
    shared_v: jax.Array,
    shared_lens: jax.Array | None,   # [sb] or None (= full S)
    unique_k: jax.Array,     # [b, hkv, U, d]
    unique_v: jax.Array,
    unique_lens: jax.Array,  # [b]
    *,
    scale: float | None = None,
    block_k_shared: int | None = None,
    block_k_unique: int | None = None,
    interpret: bool | None = None,
    shared_scales=None,
    unique_scales=None,
):
    """(out [b, hq, 1, d], lse [b, hq, 1] fp32) over shared ++ unique KV.

    int8 KV: pass ``shared_scales``/``unique_scales`` as (k_scale, v_scale)
    pairs ([sb, hkv, S] / [b, hkv, U] f32); payloads are then int8."""
    addL = lambda pair: None if pair is None else (pair[0][None], pair[1][None])
    return _fused_call(
        jnp.zeros((1,), jnp.int32),
        q, shared_k[None], shared_v[None], shared_lens,
        unique_k[None], unique_v[None], unique_lens,
        scale, block_k_shared, block_k_unique, interpret,
        addL(shared_scales), addL(unique_scales),
    )


def fused_hydragen_decode_cached(
    layer_idx: jax.Array,     # scalar int32
    q: jax.Array,             # [b, hq, 1, d]
    shared_k: jax.Array,      # [L, sb, hkv, S, d] — the cache buffer itself
    shared_v: jax.Array,
    shared_lens: jax.Array | None,
    unique_k: jax.Array,      # [L, b, hkv, U, d] — the cache buffer itself
    unique_v: jax.Array,
    unique_lens: jax.Array,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
    shared_scales=None,   # (k_scale, v_scale) [L, sb, hkv, S] f32 for int8 KV
    unique_scales=None,   # (k_scale, v_scale) [L, b, hkv, U] f32
):
    """Layer-indexed variant reading straight from the stacked KV caches.

    Inside the per-layer loop of a jitted decode step, slicing the caches
    and handing the slice to a pallas_call materializes ~tens of MB per
    layer per step (XLA cannot fuse through the kernel boundary). This
    variant takes the *whole* cache plus the layer index as scalar prefetch:
    the BlockSpec index maps lead with the layer coordinate, so only the
    blocks actually attended are ever DMA'd. With int8 KV the payload blocks
    are half the bytes and dequantization happens in-register.
    """
    return _fused_call(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        q, shared_k, shared_v, shared_lens, unique_k, unique_v, unique_lens,
        scale, None, None, interpret, shared_scales, unique_scales,
    )
