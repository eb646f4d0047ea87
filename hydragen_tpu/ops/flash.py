"""Pallas TPU flash-attention kernel returning ``(out, lse)``.

One kernel replaces all three of the reference's attention kernels
(/root/reference/hydragen/flash.py:163-350):

- ``flash_attention`` (C1, non-causal batched)  -> ``causal=False``
- ``flash_attention`` (causal prefill)          -> ``causal=True``
- ``flash_attention_seqlen`` (C3, the Triton split-K decode kernel over the
  mutable unique cache)                          -> ``kv_seq_lens=[b]``

plus the varlen path (C2): ragged shared levels are right-padded and masked
by ``kv_seq_lens`` instead of flash-attn's packed ``cu_seqlens`` layout.

TPU-native design notes:

- **GQA head folding**: queries ``[b, hq, m, d]`` are reshaped (pure reshape,
  thanks to the BHSD layout) to ``[b, hkv, g*m, d]`` so the matmul M-dim is
  ``g*m`` — the analogue of flash.py:176-178's folding of extra q-heads into
  the query-length dim, required to feed the 128x128 MXU at ``m == 1``.
- **Online softmax** with fp32 running max / sum / accumulator in VMEM
  scratch; the output is divided by ``l`` once at the end.
- **Block skipping**: ``kv_seq_lens`` rides scalar prefetch; the K/V
  BlockSpec index maps clamp the kv-block index to the last in-bounds block,
  so fully-masked blocks issue *no new DMA* (Pallas skips re-fetch when the
  mapped block is unchanged) and ``@pl.when`` skips their compute. This is
  the TPU equivalent of split-K's early exit and is what makes padded shared
  levels cheap. The causal path clamps by the q-block diagonal the same way
  (the tile-skip of flash attention).
- The split-K *reduction* of the reference (flash.py:76-160) is unnecessary:
  its LSE-merge math is exactly ``combine_lse``, which is where cross-source
  merging already happens.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
# Clamp floor for the exp argument's running max: exp(NEG_INF - NEG_CLAMP)
# underflows to exactly 0, so masked scores need no second `where` after the
# exp — one VPU pass saved per score element — while any real score
# (|s| << 1e30) keeps m_next > NEG_CLAMP and the clamp is a no-op.
NEG_CLAMP = -1e30
LANES = 128
# The kernels run their online softmax in exp2 space (the reference's
# flash-attn discipline, flash.py:124-160): callers fold LOG2E into the
# q pre-scale, every per-score exp becomes the VPU-native exp2 (a plain
# exp lowers to exp2 + a multiply pass over the whole score block), and
# the natural-log LSE is recovered at emit as m*LN2 + log(l).
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# Row-block height for 2D per-token scale operands (see _kernel scale_row):
# 8 sublanes is always Mosaic-legal and each 8-cell group of the grid
# shares one block, so the extra DMA is bounded at 8x a tiny stream.
SCALE_ROWS = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _env_block(name: str) -> int | None:
    """Tuning override (HYDRAGEN_FLASH_BLOCK_M / _K) for the default block
    sizes below — lets the flatness/roofline sweeps tune kernel tiling from
    the environment without touching call sites. Read at trace time; the
    jit caches key on ``block_*=None``, so a changed env var needs a fresh
    process (the sweep scripts run one config per process anyway)."""
    v = os.environ.get(name)
    return int(v) if v else None


def _flatten_rows_to_lanes(x2d: jax.Array, rows: int, width: int) -> jax.Array:
    """[rows, width] -> [1, rows*width] with segment r = x2d[r, :].

    Mosaic cannot reshape sublanes into lanes, so the flatten is built from
    layout-legal ops: tile along lanes, mask each lane segment to its source
    sublane, reduce over sublanes. Used to turn a per-(row, token) KV-scale
    block into the per-score-column scale vector of the row-batched kernels.
    """
    tiled = jnp.concatenate([x2d] * rows, axis=1)  # [rows, rows*width]
    seg = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 1) // width
    sub = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 0)
    return jnp.sum(jnp.where(seg == sub, tiled, 0.0), axis=0, keepdims=True)


def _kernel(
    lens_ref,  # scalar prefetch: [b] int32 kv lengths
    q_ref,     # [1, block_m, dp]
    k_ref,     # [1, block_k, dp]  (int8 when quantized)
    v_ref,     # [1, block_k, dp]
    *rest,     # [kscale_ref, vscale_ref] when quantized (each
               # [SCALE_ROWS, block_k] f32 when scale_row is given, else
               # [1, 1, block_k]), then o_ref, lse_ref, m_scr, l_scr, acc_scr
    hkv: int,
    q_len: int,
    kv_len: int,
    block_m: int,
    block_k: int,
    num_kv_blocks: int,
    causal: bool,
    scale: float,
    quantized: bool = False,
    scale_row=None,
):
    """``scale_row``: when given, the per-token dequant scales arrive as 2D
    ``[SCALE_ROWS, block_k]`` blocks of the flat ``[rows, s]`` scale array
    (a FREE leading-merge reshape of the stored layout) and this callable
    returns the block-local row to read. The previous ``[rows, 1, s]``
    unit-middle-dim operand forced XLA to stage the whole array in a
    degenerate T(1,128) layout (~13 ms per 8 MB array per staging at the 7B
    level scales, r5 trace). Unit-dim path kept for rows % SCALE_ROWS != 0.
    """
    if quantized:
        kscale_ref, vscale_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

        def k_scale_row():
            if scale_row is not None:
                return kscale_ref[pl.ds(scale_row(), 1), :]  # [1, block_k]
            return kscale_ref[0]

        def v_scale_row():
            if scale_row is not None:
                return vscale_ref[pl.ds(scale_row(), 1), :]
            return vscale_ref[0]
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

    ki = pl.program_id(2)
    mi = pl.program_id(1)
    b_idx = pl.program_id(0) // hkv

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    limit = lens_ref[b_idx]
    block_start = ki * block_k

    # Compute-skip for fully out-of-bounds blocks (paired with the index-map
    # clamp that avoids their DMA).
    run = block_start < limit
    # Causal diagonal aligned to the END (oracle convention: query i attends
    # kv j <= i + (kv_len - q_len); identical to top-left when kv_len==q_len).
    diag_off = kv_len - q_len
    if causal:
        # Folded q row r corresponds to q position r % q_len (GQA fold is
        # head-major, position-minor). Highest q position in this q block:
        lo = mi * block_m
        hi = lo + block_m - 1
        max_qpos = jnp.where(lo // q_len == hi // q_len, hi % q_len, q_len - 1)
        run = jnp.logical_and(run, block_start <= max_qpos + diag_off)

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        if quantized:
            # int8 payload values are exact in bf16; the per-token dequant
            # scale commutes out of the dot and lands on the score COLUMNS —
            # [block_m, block_k] multiplies instead of [block_k, dp], and the
            # scale block lives in lanes so the layout is legal.
            # (Running BOTH dots on the s8 MXU instead — in-kernel q/prob
            # requantization, the decode kernel's trick — was built and
            # measured SLOWER everywhere on v5e: 95 vs 86 us at the 7B-2K
            # decode read, 842 vs 726 us at causal prefill; the kernel is
            # serial-drain-bound per grid cell, not MXU-bound, and the extra
            # requant passes lengthen exactly that chain.)
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_m, block_k]
        if scale != 1.0:  # wrappers pre-scale q by scale*LOG2E; direct
            s = s * scale  # callers must fold LOG2E into `scale` themselves
        if quantized:
            s = s * k_scale_row()  # [1, block_k] broadcast over rows

        def update(s, p_cols, v_zero):
            """Online-softmax step in exp2 space (s carries LOG2E from the q
            pre-scale). The exp2's max is clamped to NEG_CLAMP so masked
            (NEG_INF) scores underflow to exactly 0 without a second `where`
            over the score block — at decode scale this kernel is VPU-bound
            on exactly these passes."""
            m_prev = m_scr[:, 0:1]
            l_prev = l_scr[:, 0:1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.maximum(m_next, NEG_CLAMP))
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

            m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

            v = v_ref[0]
            if quantized:
                # v's per-token scale moves onto p's columns (same commute).
                v = v.astype(q.dtype)
                p = p * p_cols()
            if v_zero:
                # Zero out-of-bounds V rows: the final block may read past
                # the array (unspecified padding, possibly NaN) and 0 * NaN
                # would poison the matmul.
                vrows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                v = jnp.where(
                    block_start + vrows < limit, v, jnp.zeros((), v.dtype)
                )
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[...] = acc_scr[...] * alpha + pv

        # Fully in-bounds blocks skip masking entirely (most blocks, most of
        # the time); only the boundary blocks pay the iota/compare/select
        # passes.
        is_full = block_start + block_k <= limit
        if causal:
            lo = mi * block_m
            hi = lo + block_m - 1
            min_qpos = jnp.where(lo // q_len == hi // q_len, lo % q_len, 0)
            is_full = jnp.logical_and(
                is_full, block_start + block_k - 1 <= min_qpos + diag_off
            )

        @pl.when(is_full)
        def _full():
            update(s, v_scale_row if quantized else None, False)

        @pl.when(jnp.logical_not(is_full))
        def _partial():
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_k), 1)
            kpos = block_start + cols
            mask = kpos < limit
            if causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_m, block_k), 0
                )
                qpos = (mi * block_m + rows) % q_len
                mask = jnp.logical_and(mask, kpos <= qpos + diag_off)
            sm = jnp.where(mask, s, NEG_INF)

            def p_cols():
                # Zero scales past the row's length: the final partial block
                # may read unspecified (NaN) padding and p==0 there would
                # not save the product.
                vs = v_scale_row()
                return jnp.where(
                    block_start
                    + jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
                    < limit, vs, 0.0,
                )

            update(sm, p_cols if quantized else None, True)

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        m = m_scr[:, 0:1]  # base-2 running max; LSE stays natural-log
        lse = jnp.where(l == 0.0, -jnp.inf, m * LN2 + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(jnp.float32)


def _decode_kernel(
    lens_ref,  # scalar prefetch: [b] int32 kv lengths
    q_ref,     # [R, Mp, dp]
    k_ref,     # [R, block_k, dp]  (int8 when quantized)
    v_ref,     # [R, block_k, dp]
    *rest,     # [kscale_ref, vscale_ref] when quantized (each
               # [R, block_k] f32 when scales_2d else [R, 1, block_k]),
               # then o_ref, lse_ref, m_scr, l_scr, acc_scr
    hkv: int,
    rows: int,      # R: batch-rows per grid cell
    mp: int,        # padded M per row
    block_k: int,
    num_kv_blocks: int,
    scale: float,
    quantized: bool = False,
    scales_2d: bool = False,
):
    """Row-batched decode attention (non-causal, length-masked).

    Processes R batch rows per grid cell. Each row attends only its own KV,
    but both matmuls are issued as single large block-diagonal-masked matmuls
    ([R*Mp, d] @ [d, R*block_k]): the R x redundant FLOPs are free because
    decode attention is HBM-bandwidth-bound, while the large DMA blocks and
    R x fewer grid cells keep the memory pipeline busy. This replaces the
    reference's Triton split-K decode kernel (flash.py:37-281) — the TPU
    bottleneck is DMA efficiency, not SM occupancy, so batching rows beats
    splitting K.
    """
    if quantized:
        kscale_ref, vscale_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

    ki = pl.program_id(1)
    bi = pl.program_id(0)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Per-cell upper bound over its rows' lengths.
    limit = jnp.int32(0)
    for r in range(rows):
        limit = jnp.maximum(limit, lens_ref[(bi * rows + r) // hkv])
    block_start = ki * block_k

    @pl.when(block_start < limit)
    def _compute():
        q = q_ref[...].reshape(rows * mp, q_ref.shape[-1])
        k = k_ref[...].reshape(rows * block_k, k_ref.shape[-1])
        if quantized:
            k = k.astype(q.dtype)  # int8 values are exact in bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [R*Mp, R*block_k]
        if scale != 1.0:  # caller pre-scales q (by scale*LOG2E)
            s = s * scale
        if quantized:
            # Per-token dequant scale, flattened to the score-column layout
            # (block-diagonal: column c belongs to row c // block_k).
            ks = kscale_ref[...] if scales_2d else kscale_ref[:, 0]
            s = s * _flatten_rows_to_lanes(ks, rows, block_k)

        mrows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ri = mrows // mp
        rj = cols // block_k
        kpos = block_start + (cols % block_k)
        # Block-diagonal (own-row) + per-row length mask.
        lens_by_r = [lens_ref[(bi * rows + r) // hkv] for r in range(rows)]
        own_len = jnp.full_like(ri, lens_by_r[0])
        for r in range(1, rows):
            own_len = jnp.where(ri == r, lens_by_r[r], own_len)
        mask = jnp.logical_and(ri == rj, kpos < own_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]
        l_prev = l_scr[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        # exp2 space (q pre-scale carries LOG2E). Clamped max: masked
        # (NEG_INF) scores underflow to exactly 0, no second `where` pass
        # needed (see NEG_CLAMP).
        p = jnp.exp2(s - jnp.maximum(m_next, NEG_CLAMP))
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = v_ref[...].reshape(rows * block_k, v_ref.shape[-1])
        if quantized:
            v = v.astype(q.dtype)
            vs0 = vscale_ref[...] if scales_2d else vscale_ref[:, 0]
            vs = _flatten_rows_to_lanes(vs0, rows, block_k)
            # Zero scales past each row's length (possible NaN padding in
            # the final partial block; p==0 would not save 0*NaN).
            vcols = jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
            vsl = jnp.full_like(vcols, lens_by_r[0])
            for r in range(1, rows):
                vsl = jnp.where(vcols // block_k == r, lens_by_r[r], vsl)
            vs = jnp.where(block_start + (vcols % block_k) < vsl, vs, 0.0)
            p = p * vs
        vrows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        vri = vrows // block_k
        vlen = jnp.full_like(vri, lens_by_r[0])
        for r in range(1, rows):
            vlen = jnp.where(vri == r, lens_by_r[r], vlen)
        v = jnp.where(block_start + (vrows % block_k) < vlen, v, jnp.zeros((), v.dtype))
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scr[...] / l_safe).astype(o_ref.dtype).reshape(o_ref.shape)
        m = m_scr[:, 0:1]  # base-2 running max; LSE stays natural-log
        lse = jnp.where(l == 0.0, -jnp.inf, m * LN2 + jnp.log(l_safe))
        lse_ref[...] = jnp.broadcast_to(lse, (rows * mp, LANES)).astype(
            jnp.float32
        ).reshape(lse_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_m", "block_k", "interpret"),
)
def flash_attention_bhsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_seq_lens: jax.Array | None = None,
    scale: float | None = None,
    block_m: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Flash attention in the canonical BHSD layout.

    Args / returns match ``ops.reference.attention_bhsd`` exactly (it is the
    oracle): q ``[b, hq, m, d]``, k/v ``[b, hkv, s, d]``; returns
    (out ``[b, hq, m, d]``, lse ``[b, hq, m]`` fp32).

    ``k_scale``/``v_scale`` (``[b, hkv, s]`` f32) enable the quantized-KV
    path: k/v hold int8 payloads and dequantization happens in-register
    (the reference's in-kernel dequant pattern, xformers_stuff.py:431-530,
    rebuilt for the TPU: scales ride their own small blocks and commute onto
    score/probability columns instead of the payload). Halves KV HBM traffic.
    """
    b, hq, m, d = q.shape
    _, hkv, s, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # GQA fold (pure reshape in BHSD).
    M = group * m
    qf = q.reshape(b, hkv, M, d)
    # Pre-scale q ONCE ([M, d] elements) instead of scaling every score
    # ([M, S]): the kernel is VPU-bound on per-score passes at long S, and
    # the oracle applies the same q-side scaling. LOG2E rides along so the
    # kernel's softmax runs on the VPU-native exp2 (see LOG2E above).
    qf = (qf.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    scale = 1.0

    # Pad head_dim to the 128-lane tile and M to a sublane-friendly block.
    dp = max(_round_up(d, LANES), LANES)
    if block_m is None:
        block_m = _env_block("HYDRAGEN_FLASH_BLOCK_M") or min(
            512, max(16, _round_up(M, 16))
        )
    Mp = _round_up(M, block_m)
    if block_k is None:
        # Bigger K tiles amortize the per-block online-softmax rescale and
        # DMA overhead (measured at the 7B north star: bench 6,780 tok/s at
        # block_k=2048 vs 6,705 at 1024 vs 6,369 at the old 512; at 16K
        # prefix 15.7 / 17.3 / 22.4 ms/step — r4_measure bench_w8a8_bk* and
        # flat16k_*). Causal grids keep finer tiles (diagonal-block skipping
        # is block-granular); the VPU-register product block_m*block_k is
        # capped at the known-good 512Ki scores.
        if causal:
            _cap = 1024 if s >= 8192 else 512
        else:
            _cap = max(512, min(2048, (512 * 1024) // block_m))
            if s >= 8192:
                # Long non-causal streams amortize per-block drains with a
                # coarser K tile (1.3B-16K decode read: 263.6 us at 4096 vs
                # 291.1 at 2048; 8192 exceeds scoped VMEM at block_m=256).
                _cap = max(_cap, min(4096, (1024 * 1024) // block_m))
        block_k = _env_block("HYDRAGEN_FLASH_BLOCK_K") or min(
            _cap, max(LANES, _round_up(min(s, _cap), LANES))
        )
        # An env/explicit block beyond the stream length would PAD the KV
        # stream (measured 2x at S=2048 under a forced 4096 tile); clamp.
    block_k = min(block_k, max(LANES, _round_up(s, LANES)))
    num_kv_blocks = -(-s // block_k)

    quantized = k_scale is not None
    assert (k_scale is None) == (v_scale is None)

    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, Mp - M), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dp - d)))

    qp = qp.reshape(b * hkv, Mp, dp)
    kp = kp.reshape(b * hkv, s, dp)
    vp = vp.reshape(b * hkv, s, dp)
    if quantized:
        # Flat [rows, s] — a free leading-merge of the stored layout. The
        # generic path ships SCALE_ROWS-row 2D blocks (dynamic row read,
        # see _kernel scale_row); when the row count is not a legal sublane
        # block it falls back to the [rows, 1, s] unit-middle-dim form,
        # which costs a degenerate T(1,128) staging relayout.
        ksf = k_scale.astype(jnp.float32).reshape(b * hkv, s)
        vsf = v_scale.astype(jnp.float32).reshape(b * hkv, s)

    if kv_seq_lens is None:
        lens = jnp.full((b,), s, dtype=jnp.int32)
    else:
        lens = jnp.minimum(kv_seq_lens.astype(jnp.int32), s)

    # Decode shapes (tiny M, per-row KV) use the row-batched kernel: the
    # per-(row, head) grid of the generic kernel starves the DMA pipeline.
    # (NB: at M <= 8 and large b*hkv the XLA commuted-scale path in
    # ops/reference.py beats both Pallas decode forms — a per-(row, query)
    # matvec kernel was tried and lost 10x to its serialized inner loop —
    # so impl="auto" routes those shapes to XLA, not here.)
    if not causal and M <= 32:
        B = b * hkv
        R = next((r for r in (16, 8, 4, 2, 1) if B % r == 0), 1)
        if R > 1:
            mp_dec = _round_up(M, 8)
            # Keep R-row K+V blocks (double-buffered) within scoped VMEM:
            # the long-S 1024 default above is sized for the 1-row generic
            # kernel, not R-row blocks.
            itemsize = 1 if quantized else 2
            bk_cap = (6 << 20) // max(2 * 2 * R * dp * itemsize, 1)
            bk_dec = max(LANES, (min(block_k, bk_cap) // LANES) * LANES)
            return _flash_decode_call(
                qf, k, v, lens, hkv=hkv, group=group, m=m, mp=mp_dec,
                rows=R, block_k=bk_dec, dp=dp, d=d, scale=scale,
                interpret=interpret,
                scales=(ksf, vsf) if quantized else None,
            )

    # NB: in BlockSpec index maps, scalar-prefetch refs come AFTER the grid
    # indices (in kernel bodies they come first).
    def q_index(bh, mi, ki, lens_ref):
        return (bh, mi, 0)

    def _last_block(bh, mi, lens_ref):
        # Clamp to the last in-bounds block: out-of-bounds grid steps re-map
        # to an already-fetched block => no DMA, and compute is skipped.
        limit = lens_ref[bh // hkv]
        last = jnp.maximum((limit + block_k - 1) // block_k - 1, 0)
        if causal:
            lo = mi * block_m
            hi = lo + block_m - 1
            max_qpos = jnp.where(lo // m == hi // m, hi % m, m - 1)
            # Clamp at 0: with the end-aligned diagonal and kv_len < q_len a
            # fully-masked q block would otherwise map to block index -1
            # (compute is skipped either way, but the DMA index must be valid).
            last = jnp.minimum(
                last, jnp.maximum((max_qpos + (s - m)) // block_k, 0)
            )
        return last

    def kv_index(bh, mi, ki, lens_ref):
        return (bh, jnp.minimum(ki, _last_block(bh, mi, lens_ref)), 0)

    def scale_index(bh, mi, ki, lens_ref):
        return (bh, 0, jnp.minimum(ki, _last_block(bh, mi, lens_ref)))

    def scale_index_2d(bh, mi, ki, lens_ref):
        return (bh // SCALE_ROWS, jnp.minimum(ki, _last_block(bh, mi, lens_ref)))

    def out_index(bh, mi, ki, lens_ref):
        return (bh, mi, 0)

    def lse_index(bh, mi, ki, lens_ref):
        return (bh, mi, 0)

    grid = (b * hkv, Mp // block_m, num_kv_blocks)
    scales_2d = quantized and (b * hkv) % SCALE_ROWS == 0

    kernel = functools.partial(
        _kernel,
        hkv=hkv,
        q_len=m,
        kv_len=s,
        block_m=block_m,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        causal=causal,
        scale=scale,
        quantized=quantized,
        scale_row=(
            (lambda: pl.program_id(0) % SCALE_ROWS) if scales_2d else None
        ),
    )

    in_specs = [
        pl.BlockSpec((1, block_m, dp), q_index),
        pl.BlockSpec((1, block_k, dp), kv_index),
        pl.BlockSpec((1, block_k, dp), kv_index),
    ]
    operands = [lens, qp, kp, vp]
    if quantized:
        if scales_2d:
            in_specs += [
                pl.BlockSpec((SCALE_ROWS, block_k), scale_index_2d),
                pl.BlockSpec((SCALE_ROWS, block_k), scale_index_2d),
            ]
            operands += [ksf, vsf]
        else:
            in_specs += [
                pl.BlockSpec((1, 1, block_k), scale_index),
                pl.BlockSpec((1, 1, block_k), scale_index),
            ]
            operands += [ksf.reshape(b * hkv, 1, s), vsf.reshape(b * hkv, 1, s)]

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_m, dp), out_index),
                # lse is lane-broadcast to satisfy Mosaic's (8, 128) trailing
                # block-dim rule (same trick as jax's flash kernel residuals).
                pl.BlockSpec((1, block_m, LANES), lse_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_m, LANES), jnp.float32),
                pltpu.VMEM((block_m, LANES), jnp.float32),
                pltpu.VMEM((block_m, dp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, Mp, dp), q.dtype),
            jax.ShapeDtypeStruct((b * hkv, Mp, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    out = out[:, :M, :d].reshape(b, hkv, group, m, d).reshape(b, hq, m, d)
    lse = lse[:, :M, 0].reshape(b, hkv, group, m).reshape(b, hq, m)
    return out.astype(q.dtype), lse


def _flash_decode_call(
    qf, k, v, lens, *, hkv, group, m, mp, rows, block_k, dp, d, scale,
    interpret, scales=None,
):
    """Launch the row-batched decode kernel. qf: [b, hkv, M, d] folded q.

    ``scales``: (k_scale, v_scale) each ``[b*hkv, s]`` f32 for int8 KV."""
    b = qf.shape[0]
    M = qf.shape[2]
    s = k.shape[2]
    B = b * hkv
    num_kv_blocks = -(-s // block_k)
    quantized = scales is not None

    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, mp - M), (0, dp - d))).reshape(B, mp, dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(B, s, dp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(B, s, dp)

    def q_index(bi, ki, lens_ref):
        return (bi, 0, 0)

    def _last_block(bi, lens_ref):
        limit = lens_ref[(bi * rows) // hkv]
        for r in range(1, rows):
            limit = jnp.maximum(limit, lens_ref[(bi * rows + r) // hkv])
        return jnp.maximum((limit + block_k - 1) // block_k - 1, 0)

    def kv_index(bi, ki, lens_ref):
        return (bi, jnp.minimum(ki, _last_block(bi, lens_ref)), 0)

    # 2D flat scale blocks ([rows, block_k] of the [B, s] array — the stored
    # layout, staged copy-free) whenever the row batch is a legal sublane
    # block; the [B, 1, s] unit-dim fallback forces a degenerate T(1,128)
    # staging relayout (see _kernel's scale_row note).
    scales_2d = quantized and (rows % 8 == 0 or rows == B)

    def scale_index(bi, ki, lens_ref):
        return (bi, 0, jnp.minimum(ki, _last_block(bi, lens_ref)))

    def scale_index_2d(bi, ki, lens_ref):
        return (bi, jnp.minimum(ki, _last_block(bi, lens_ref)))

    kernel = functools.partial(
        _decode_kernel,
        hkv=hkv,
        rows=rows,
        mp=mp,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        scale=scale,
        quantized=quantized,
        scales_2d=scales_2d,
    )

    in_specs = [
        pl.BlockSpec((rows, mp, dp), q_index),
        pl.BlockSpec((rows, block_k, dp), kv_index),
        pl.BlockSpec((rows, block_k, dp), kv_index),
    ]
    operands = [lens, qp, kp, vp]
    if quantized:
        if scales_2d:
            in_specs += [
                pl.BlockSpec((rows, block_k), scale_index_2d),
                pl.BlockSpec((rows, block_k), scale_index_2d),
            ]
            operands += list(scales)
        else:
            in_specs += [
                pl.BlockSpec((rows, 1, block_k), scale_index),
                pl.BlockSpec((rows, 1, block_k), scale_index),
            ]
            operands += [sc.reshape(B, 1, s) for sc in scales]

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // rows, num_kv_blocks),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((rows, mp, dp), q_index),
                pl.BlockSpec((rows, mp, LANES), q_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows * mp, LANES), jnp.float32),
                pltpu.VMEM((rows * mp, LANES), jnp.float32),
                pltpu.VMEM((rows * mp, dp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, mp, dp), qf.dtype),
            jax.ShapeDtypeStruct((B, mp, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    hq = hkv * group
    out = out[:, :M, :d].reshape(b, hkv, group, m, d).reshape(b, hq, m, d)
    lse = lse[:, :M, 0].reshape(b, hkv, group, m).reshape(b, hq, m)
    return out.astype(qf.dtype), lse


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_m", "block_k", "interpret"),
)
def flash_attention_cached_bhsd(
    layer: jax.Array,
    q: jax.Array,
    k_all: jax.Array,
    v_all: jax.Array,
    *,
    kv_seq_lens: jax.Array | None = None,
    k_scale_all: jax.Array | None = None,
    v_scale_all: jax.Array | None = None,
    scale: float | None = None,
    block_m: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """Non-causal flash attention reading ONE layer of stacked KV buffers.

    The shared-level analogue of ``ops.decode.decode_attention_cached``: the
    operands are the engine's raw stacked level buffers and the layer index
    rides scalar prefetch into the BlockSpec index maps. Feeding per-layer
    slices to ``flash_attention_bhsd`` instead makes XLA materialize each
    layer's slice as a fusion output per operand per step (~4.5 ms/step at
    7B bs256 decode, xplane-verified) just to stage the pallas operand.

    Args:
        layer: scalar int32 layer index.
        q: ``[sb, hq, m, d]`` (folded) queries.
        k_all, v_all: ``[L, sb, hkv, S, d]`` stacked level buffers (int8
            payload when scales are given). ``d`` must be a 128 multiple —
            padding the stacked buffer would copy the whole cache.
        kv_seq_lens: ``[sb]`` valid lengths (None = all S). Blocks past a
            row's length are neither DMA'd nor computed (index-map clamp), so
            the allocated S padding costs only empty grid iterations.
        k_scale_all, v_scale_all: ``[L, sb, hkv, S]`` f32 per-token scales.

    Returns ``(out [sb, hq, m, d], lse [sb, hq, m] f32)`` — equal to
    ``flash_attention_bhsd`` on the layer's slice.
    """
    b, hq, m, d = q.shape
    L, SB, hkv, s, _ = k_all.shape
    assert hq % hkv == 0
    assert b <= SB, f"folded batch {b} exceeds allocated level batch {SB}"
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    M = group * m
    qf = q.reshape(b, hkv, M, d)
    # Fold LOG2E into the q pre-scale: the shared _kernel softmax runs in
    # exp2 space (see LOG2E above).
    qf = (qf.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    scale = 1.0

    dp = max(_round_up(d, LANES), LANES)
    assert d == dp, "head_dim must be a 128-lane multiple for the cached form"
    if block_m is None:
        block_m = _env_block("HYDRAGEN_FLASH_BLOCK_M") or min(
            512, max(16, _round_up(M, 16))
        )
    Mp = _round_up(M, block_m)
    if block_k is None:
        # Bigger K tiles amortize the per-block online-softmax rescale and
        # DMA overhead (measured at the 7B north star: bench 6,780 tok/s at
        # block_k=2048 vs 6,705 at 1024 vs 6,369 at the old 512; at 16K
        # prefix 15.7 / 17.3 / 22.4 ms/step — r4_measure bench_w8a8_bk* and
        # flat16k_*). This entry point is always non-causal (shared-level
        # reads); the VPU-register product block_m*block_k is capped at the
        # known-good 512Ki scores.
        _cap = max(512, min(2048, (512 * 1024) // block_m))
        block_k = _env_block("HYDRAGEN_FLASH_BLOCK_K") or min(
            _cap, max(LANES, _round_up(min(s, _cap), LANES))
        )
    num_kv_blocks = -(-s // block_k)

    quantized = k_scale_all is not None
    assert (k_scale_all is None) == (v_scale_all is None)

    B = b * hkv
    # Rows are indexed li*B_all + bh: with b <= SB the first b batch rows of
    # each layer line up with the folded-query grid rows.
    B_all = SB * hkv
    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, Mp - M), (0, 0))).reshape(B, Mp, dp)
    # Leading-dim merges only — no copy of the stacked cache.
    kp = k_all.reshape(L * B_all, s, dp)
    vp = v_all.reshape(L * B_all, s, dp)
    scales_2d = quantized and (L * B_all) % SCALE_ROWS == 0
    if quantized:
        # Flat [L*B_all, s]: free leading-merge of the stored [L, sb, hkv, S]
        # f32 scales. The old [L*B_all, 1, s] unit-dim operand made XLA stage
        # the WHOLE array in a degenerate T(1,128) relayout (~13 ms per 8 MB
        # array per staging at the 7B level scales, r5 trace).
        ksf = k_scale_all.astype(jnp.float32).reshape(L * B_all, s)
        vsf = v_scale_all.astype(jnp.float32).reshape(L * B_all, s)

    if kv_seq_lens is None:
        lens = jnp.full((b,), s, dtype=jnp.int32)
    else:
        lens = jnp.minimum(kv_seq_lens.astype(jnp.int32), s)
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)

    def q_index(bh, mi, ki, lens_ref, li_ref):
        return (bh, mi, 0)

    def _last_block(bh, lens_ref):
        limit = lens_ref[bh // hkv]
        return jnp.maximum((limit + block_k - 1) // block_k - 1, 0)

    def kv_index(bh, mi, ki, lens_ref, li_ref):
        return (
            li_ref[0] * B_all + bh,
            jnp.minimum(ki, _last_block(bh, lens_ref)),
            0,
        )

    def scale_index(bh, mi, ki, lens_ref, li_ref):
        return (
            li_ref[0] * B_all + bh,
            0,
            jnp.minimum(ki, _last_block(bh, lens_ref)),
        )

    def scale_index_2d(bh, mi, ki, lens_ref, li_ref):
        return (
            (li_ref[0] * B_all + bh) // SCALE_ROWS,
            jnp.minimum(ki, _last_block(bh, lens_ref)),
        )

    def _kernel_cached(lens_ref, li_ref, *args, **kw):
        if scales_2d:
            # Block-local scale row: absolute flat row modulo the block
            # height (absolute-row arithmetic holds even when B_all is not
            # a SCALE_ROWS multiple of the layer stride).
            kw["scale_row"] = lambda: (
                li_ref[0] * B_all + pl.program_id(0)
            ) % SCALE_ROWS
        _kernel(lens_ref, *args, **kw)

    kernel = functools.partial(
        _kernel_cached,
        hkv=hkv,
        q_len=m,
        kv_len=s,
        block_m=block_m,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        causal=False,
        scale=scale,
        quantized=quantized,
    )

    in_specs = [
        pl.BlockSpec((1, block_m, dp), q_index),
        pl.BlockSpec((1, block_k, dp), kv_index),
        pl.BlockSpec((1, block_k, dp), kv_index),
    ]
    operands = [lens, li, qp, kp, vp]
    if quantized:
        if scales_2d:
            in_specs += [
                pl.BlockSpec((SCALE_ROWS, block_k), scale_index_2d),
                pl.BlockSpec((SCALE_ROWS, block_k), scale_index_2d),
            ]
            operands += [ksf, vsf]
        else:
            in_specs += [
                pl.BlockSpec((1, 1, block_k), scale_index),
                pl.BlockSpec((1, 1, block_k), scale_index),
            ]
            operands += [
                ksf.reshape(L * B_all, 1, s), vsf.reshape(L * B_all, 1, s)
            ]

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Mp // block_m, num_kv_blocks),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_m, dp), q_index),
                pl.BlockSpec((1, block_m, LANES), q_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_m, LANES), jnp.float32),
                pltpu.VMEM((block_m, LANES), jnp.float32),
                pltpu.VMEM((block_m, dp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, dp), q.dtype),
            jax.ShapeDtypeStruct((B, Mp, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    out = out[:, :M, :d].reshape(b, hkv, group, m, d).reshape(b, hq, m, d)
    lse = lse[:, :M, 0].reshape(b, hkv, group, m).reshape(b, hq, m)
    return out.astype(q.dtype), lse


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_seq_lens: jax.Array | None = None,
    scale: float | None = None,
):
    """Public BSHD wrapper (reference-parity layout, flash.py:284-306)."""
    out, lse = flash_attention_bhsd(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=causal,
        kv_seq_lens=kv_seq_lens,
        scale=scale,
    )
    return out.transpose(0, 2, 1, 3), lse.transpose(0, 2, 1)
