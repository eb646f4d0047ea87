"""Pallas int8 decode-attention kernel over the BSHD unique cache.

The round-3 attack on the north-star serial stack (VERDICT r2 item 1): at 7B
batch-256 decode, the unique-cache read ran ~2x its HBM bandwidth floor on
the XLA commuted-scale path. This kernel streams each row's int8 KV exactly
once, in the cache's native BSHD layout (``[L, b, s, hkv, d]`` — the layout
whose single-token decode writes are tile-exact), and keeps BOTH attention
matmuls on the MXU's *native int8 path*.

Design drivers (all measured on v5e, see docs/results_v5e.md):

- **Native s8 MXU**: Mosaic's s8xs8 -> i32 ``dot_general`` runs at
  ~116 TOP/s, while converting the int8 payload to bf16 first costs
  ~585 G elem/s on the VPU — at the 7B shapes the payload conversion alone
  (~134 M elem/layer) would exceed the whole read's DMA floor. So the
  *small* operands are quantized instead — q per row (in-kernel, one scalar
  scale) and the softmax probabilities per row — and K/V are never
  converted.
- **Head batching**: all of a row's kv heads ride one dot — q ``[hq, d]``
  against the row's KV block flattened to ``[block_s*hkv, d]``. Only
  ``col % hkv == row // group`` score entries are meaningful; the redundant
  MXU FLOPs are free (the read is bandwidth-bound).
- **Row batching**: grid-cell overhead measured ~0.5 us/cell, so one cell
  processes ``row_batch`` rows with an in-kernel ``fori_loop`` over per-row
  dots (NOT one giant cross-row dot — that would square the score
  redundancy). Measured ladder at b=256/hkv=32/s=64: 1024 cells 622 us
  -> 256 cells 270 us -> 32 cells ~222 us vs 336 us for the XLA path,
  169 us floor.
- **Row sub-unrolling**: each loop body traces ``_row_sub_unroll`` rows
  back-to-back so Mosaic's list scheduler overlaps the rows' independent
  MXU->VPU chains — a 1-row body drains the MXU pipe twice per row
  (measured 248 us vs a 180 us full-unroll at the 7B bs-256 shape, but
  full unroll costs ~20 min of Mosaic compile and a depth-3
  carried-value software pipeline measured 327 us — loop-carried
  [cg, W] tensors round-trip through VMEM).
- **Whole-cache operands, layer picked by scalar prefetch**: the model
  passes the UNSLICED ``[L, ...]`` cache buffers and the layer index rides
  scalar prefetch into the BlockSpec index maps. Feeding per-layer slices
  instead made XLA materialize the whole 67 MB slice as a fusion output
  per operand per layer (~13 ms/step at 7B bs256, xplane-verified) just to
  stage the pallas operand.
- **Lane-major flat scales**: per-token dequant scales arrive
  ``[L, b, s*hkv]`` (token-major, head-minor — the score-column order), the
  engine cache's native storage (core/cache.py flat_scales), so the dequant
  commute is one broadcast multiply. The ``[b, s, hkv]`` layout pads hkv up
  to the 128-lane tile (4x scale bandwidth at hkv=32) and would need an
  illegal sublane->lane reshape in-kernel.
- The probability quantization (p*vscale -> s8 against a per-row max) adds
  ~0.4 % RMS noise — the same order as the int8 KV quantization itself; the
  ce-delta quality gate (scripts/quality.py) is the arbiter, and
  ``impl="xla"`` remains the exact escape hatch.

Reference anchor: the Triton split-K decode kernel this replaces
(/root/reference/hydragen/flash.py:37-281) and its in-kernel int4 dequant
pattern (xformers_stuff.py:431-530).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydragen_tpu.ops.flash import (
    LANES, LN2, LOG2E, NEG_CLAMP, NEG_INF, _round_up,
)
from hydragen_tpu.ops.quant import unpack4


def chunk_kv_scales(scale: jax.Array, c: int) -> jax.Array:
    """[..., s, hkv] f32 -> [..., hkv/c, s*c] lane-major chunk layout.

    Element (j, t*c + i) holds scale(token t, kv head j*c + i). With
    ``c == hkv`` (the shipped configuration) this is a pure trailing-dims
    merge — exactly the engine's flat_scales storage minus the unit dim.
    """
    *lead, s, hkv = scale.shape
    assert hkv % c == 0
    x = scale.reshape(*lead, s, hkv // c, c)
    x = jnp.moveaxis(x, -2, -3)  # [..., hkv/c, s, c]
    return x.reshape(*lead, hkv // c, s * c)


def unchunk_kv_scales(chunked: jax.Array, c: int) -> jax.Array:
    """Inverse of chunk_kv_scales: [..., hkv/c, s*c] -> [..., s, hkv]."""
    *lead, nc, sc = chunked.shape
    s = sc // c
    x = chunked.reshape(*lead, nc, s, c)
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, s, nc * c)


def _row_sub_unroll(rows: int) -> int:
    """How many rows each fori-loop body traces back-to-back (see the
    sub-unroll note in ``_compute``). ``HYDRAGEN_DECODE_SUB`` caps it; the
    value must divide ``rows``. Default 8 (round 5): bench 7,826 vs 7,758
    tok/s at 4; the ~520 s cold Mosaic compile is amortized by the
    persistent compile cache (set 4 for one-shot cold runs)."""
    env = os.environ.get("HYDRAGEN_DECODE_SUB")
    cap = int(env) if env else 8
    for s in (8, 4, 2):
        if s <= cap and rows % s == 0:
            return s
    return 1


def _decode_cached_kernel(
    lens_ref,    # scalar prefetch: [b] int32 kv lengths
    li_ref,      # scalar prefetch: [1] int32 layer index (used in index maps)
    q_ref,       # [R, cg, dp] float (bf16/f32)
    k_ref,       # [1, R, block_s, c, dp] int8
    v_ref,       # [1, R, block_s, c, dp] int8
    kscale_ref,  # [1, R, block_s*c] f32
    vscale_ref,  # [1, R, block_s*c] f32
    *rest,       # [ks_hi, vs_hi (1, R, block_s*c) f32 when kv_bits=4],
                 # merge: [k1, v1 (R, c, dp) bf16, o_sh (R, cg, dp) bf16,
                 #         lse_sh (R, cg, 1) f32], then
                 # o_ref (R, cg, dp), lse_ref (R, cg, LANES) f32, scratches
    c: int,
    group: int,
    rows: int,
    block_s: int,
    num_s_blocks: int,
    sm_scale: float,
    merge_own: bool = False,
    merge_shared: bool = False,
    kv_bits: int = 8,
):
    if kv_bits == 4:
        # Token-planar pack: each byte block carries TWO token ranges —
        # [j0, j0+block_s) in the low nibbles and [Sp+j0, ...) in the high
        # (Sp = num_s_blocks * block_s byte rows). The planes unpack
        # in-register and concatenate on sublanes into one [2W, dp]
        # operand, so both attention dots stay single s8 MXU launches; the
        # high plane's scales ride two extra refs (the flat scale array is
        # token-indexed over the LOGICAL 2*Sp positions).
        kshi_ref, vshi_ref = rest[0], rest[1]
        rest = rest[2:]
    n_extra = (2 if merge_own else 0) + (2 if merge_shared else 0)
    extra, (o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest[:n_extra], rest[n_extra:]
    if merge_own:
        k1_ref, v1_ref = extra[0], extra[1]
    if merge_shared:
        osh_ref, lsesh_ref = extra[-2], extra[-1]
    bi = pl.program_id(0)
    si = pl.program_id(1)
    cg = c * group
    W = block_s * c

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    block_start = si * block_s

    # The whole cell is skipped only when EVERY row is out of range; rows
    # individually out of range are handled by the length bias (their
    # blocks become all-masked no-ops in the online softmax).
    limit_max = jnp.int32(0)
    for r in range(rows):
        limit_max = jnp.maximum(limit_max, lens_ref[bi * rows + r])

    W2 = 2 * W if kv_bits == 4 else W
    sp_tokens = num_s_blocks * block_s  # byte rows == low-plane token count

    @pl.when(block_start < limit_max)
    def _compute():
        # Trace-time constants shared by all rows. Lane w of the (possibly
        # plane-concatenated) score row: kv head w % c (W % c == 0, so the
        # pattern is plane-invariant); token = block_start + (w % W) // c
        # + Sp * (w // W) (the high plane's tokens sit Sp later).
        col_head = jax.lax.broadcasted_iota(jnp.int32, (cg, W2), 1) % c
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (cg, W2), 0) // group
        diag = col_head == row_kv
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
        col_tok = (w_iota % W) // c + (w_iota // W) * sp_tokens

        # Sub-unrolled row loop: each fori iteration processes `sub` rows
        # traced back-to-back. A 1-row body consumes each MXU result
        # immediately, draining the MXU pipe twice per row — measured
        # 248 us vs the 169 us DMA floor at the 7B bs-256 decode shape —
        # while a FULL Python unroll (Mosaic's list scheduler overlaps the
        # rows' independent MXU/VPU chains) ran 180 us but cost ~20 min of
        # compile. `sub` rows per body buys most of that overlap at ~sub x
        # body compile cost. (A depth-3 software pipeline with [cg, W2]
        # loop carries was tried and measured *slower* — 327 us — the
        # carried tensors round-trip through VMEM each iteration.)
        def one_row(r):
            lo = r * cg
            limit = lens_ref[bi * rows + r]
            # In-kernel q quantization: one scalar scale per row (cheap —
            # q is [cg, dp]); doing this in XLA cost a multi-pass prologue
            # per layer.
            qf = q_ref[r].astype(jnp.float32) * sm_scale
            qmax = jnp.max(jnp.abs(qf))
            qs = jnp.maximum(qmax, 1e-20) / 127.0
            q8 = jnp.round(qf / qs).astype(jnp.int8)

            k2 = k_ref[0, r].reshape(W, k_ref.shape[-1])   # [W, dp] s8
            if kv_bits == 4:
                k2 = jnp.concatenate(unpack4(k2), axis=0)  # [2W, dp] s8
            s_i = jax.lax.dot_general(
                q8, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                              # [cg, W2] i32
            ks_row = kscale_ref[0, pl.ds(r, 1)]            # [1, W]
            if kv_bits == 4:
                ks_row = jnp.concatenate(
                    [ks_row, kshi_ref[0, pl.ds(r, 1)]], axis=1
                )                                          # [1, 2W]
            s = s_i.astype(jnp.float32) * (ks_row * qs)

            # One fused mask select (diag AND in-range) instead of a
            # lenbias add + two selects — these per-score VPU passes are
            # the kernel's compute side.
            mask = jnp.logical_and(diag, block_start + col_tok < limit)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_scr[pl.ds(lo, cg), 0:1]
            l_prev = l_scr[pl.ds(lo, cg), 0:1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            # exp2 space: sm_scale carries LOG2E (see ops.flash.LOG2E).
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.maximum(m_next, NEG_CLAMP))  # masked -> 0
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[pl.ds(lo, cg)] = jnp.broadcast_to(m_next, (cg, LANES))
            l_scr[pl.ds(lo, cg)] = jnp.broadcast_to(l_next, (cg, LANES))

            # PV on the int8 MXU: fold the per-token v scale into p, then
            # re-quantize p against its per-row max (<=0.5/127 relative
            # noise — the int8-KV error's own order).
            vs_row = vscale_ref[0, pl.ds(r, 1)]            # [1, W]
            if kv_bits == 4:
                vs_row = jnp.concatenate(
                    [vs_row, vshi_ref[0, pl.ds(r, 1)]], axis=1
                )
            pv = p * vs_row                                # [cg, W2]
            pmax = jnp.max(pv, axis=1, keepdims=True)
            pmax_safe = jnp.where(pmax <= 0.0, 1.0, pmax)
            pq = jnp.round(pv * (127.0 / pmax_safe)).astype(jnp.int8)
            v2 = v_ref[0, r].reshape(W, v_ref.shape[-1])   # [W, dp] s8
            if kv_bits == 4:
                v2 = jnp.concatenate(unpack4(v2), axis=0)  # [2W, dp] s8
            o_i = jax.lax.dot_general(
                pq, v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                              # [cg, dp] i32
            o_f = o_i.astype(jnp.float32) * (pmax_safe / 127.0)
            acc_scr[pl.ds(lo, cg)] = acc_scr[pl.ds(lo, cg)] * alpha + o_f

        sub = _row_sub_unroll(rows)

        def body(j, _):
            for t in range(sub):
                one_row(j * sub + t)
            return 0

        jax.lax.fori_loop(0, rows // sub, body, 0, unroll=False)

    @pl.when(si == num_s_blocks - 1)
    def _emit():
        # GQA head-expansion one-hot (oh[i, j] = 1 iff q-row i uses kv head
        # j): expanding [c, dp] own-token KV to [cg, dp] rides one tiny MXU
        # matmul — Mosaic has no sublane repeat/gather (CLAUDE.md limits).
        if merge_own and group > 1:
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (cg, c), 1)
                == jax.lax.broadcasted_iota(jnp.int32, (cg, c), 0) // group
            ).astype(jnp.float32)

        def ebody(r, _):
            lo = r * cg
            m = m_scr[pl.ds(lo, cg), 0:1]
            l = l_scr[pl.ds(lo, cg), 0:1]
            acc = acc_scr[pl.ds(lo, cg)]
            if merge_own:
                # This step's own token: softmax over one column is exact in
                # the online state — one more (score, value) pair per row.
                # (exp2 space: sm_scale carries LOG2E, matching m.)
                qf = q_ref[r].astype(jnp.float32) * sm_scale
                if group > 1:
                    k1e = jax.lax.dot(oh, k1_ref[r].astype(jnp.float32))
                    v1e = jax.lax.dot(oh, v1_ref[r].astype(jnp.float32))
                else:
                    k1e = k1_ref[r].astype(jnp.float32)
                    v1e = v1_ref[r].astype(jnp.float32)
                s_own = jnp.sum(qf * k1e, axis=1, keepdims=True)
                m_new = jnp.maximum(m, s_own)
                alpha = jnp.exp2(m - m_new)
                p_own = jnp.exp2(s_own - m_new)
                l = alpha * l + p_own
                acc = acc * alpha + p_own * v1e
                m = m_new
            m_nat = m * LN2  # back to natural log for the LSE interface
            if merge_shared:
                # Exact LSE merge with the shared-prefix partial (the XLA
                # combine_lse relayed each partial out in f32 per layer —
                # ~6 copies/layer at 7B bs256, xplane-verified). lse_sh is
                # natural-log (the kernel LSE invariant), so merge there.
                lse_sh = jnp.maximum(lsesh_ref[r][:, 0:1], NEG_INF)
                osh = osh_ref[r].astype(jnp.float32)
                l_safe = jnp.maximum(l, 1e-38)
                lse1 = jnp.where(l > 0.0, m_nat + jnp.log(l_safe), NEG_INF)
                m12 = jnp.maximum(jnp.maximum(lse1, lse_sh), NEG_CLAMP)
                e1 = jnp.where(l > 0.0, jnp.exp(m_nat - m12), 0.0)
                w2 = jnp.exp(lse_sh - m12)
                num = e1 * acc + w2 * osh
                den = e1 * l + w2
                den_safe = jnp.where(den == 0.0, 1.0, den)
                o_ref[r] = (num / den_safe).astype(o_ref.dtype)
                lse = jnp.where(den == 0.0, -jnp.inf, m12 + jnp.log(den_safe))
            else:
                l_safe = jnp.where(l == 0.0, 1.0, l)
                o_ref[r] = (acc / l_safe).astype(o_ref.dtype)
                lse = jnp.where(l == 0.0, -jnp.inf, m_nat + jnp.log(l_safe))
            lse_ref[r] = jnp.broadcast_to(lse, (cg, LANES)).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, rows, ebody, 0, unroll=False)


def decode_kernel_supported(b: int, B: int) -> bool:
    """Can the cached decode kernel run at this (rows, buffer-rows) pair?

    Mosaic requires each BlockSpec's second-to-last block dim to be a
    multiple of 8 or equal to the array dim. The flat scale operands are
    ``[L, B, S*hkv]`` blocked ``(1, R, block_s*hkv)``, so the row batch R
    must satisfy ``R % 8 == 0 or R == B`` — reachable iff ``b % 8 == 0`` or
    ``b == B`` (R must also divide b). Round-3 postmortem: the auto picker
    chose R=4 at b=32 (7B sweep) and at the bs-8 no-sharing baseline, which
    Mosaic rejects at lowering (results/r3_measure/sweep7b.log)."""
    return b % 8 == 0 or b == B


def _legal_row_batches(b: int, B: int) -> list[int]:
    return [
        r for r in range(1, b + 1)
        if b % r == 0 and (r % 8 == 0 or r == B)
    ]


# Scoped-vmem limit is 16 MB; measured pass/fail boundary on v5e:
# single-block grids (block_s == S) DOUBLE-buffer streamed operands
# (S=112/R=8 compiles at ~15.3 MB by this estimate; S=128/R=8 rejected at
# 17.12 MB — r3 unique_s128_auto), while multi-block grids TRIPLE-buffer
# them (b=8/S=2128/block_s=76: rejected at 16.13 MB, exactly 3x KV + extras
# — r4 bench_w4a8 baseline postmortem).
_VMEM_BUDGET = int(15.5 * (1 << 20))


def _kernel_vmem_bytes(
    R: int, t: int, hkv: int, dp: int, cg: int, kv_bits: int,
    merge_own: bool, merge_shared: bool, num_s_blocks: int = 1,
) -> int:
    """Conservative scoped-VMEM estimate for one grid cell's buffers."""
    nbuf = 2 if num_s_blocks == 1 else 3  # Mosaic pipelining depth
    kv = nbuf * 2 * R * t * hkv * dp  # k+v int8 blocks
    n_sc = 4 if kv_bits == 4 else 2  # int4 adds the two high-plane refs
    sc = nbuf * n_sc * R * t * hkv * 4  # f32 scale blocks
    fixed = 2 * R * cg * dp * 2  # q + out (bf16)
    fixed += R * cg * (dp + 2 * LANES) * 4  # acc/m/l scratch (f32)
    fixed += 2 * R * cg * LANES * 4  # lse out (f32, buffered)
    if kv_bits == 4:
        fixed += 4 * t * hkv * dp  # unpacked [2W, dp] k2/v2 temporaries
    if merge_own:
        fixed += 2 * 2 * R * hkv * dp * 2  # k1/v1 bf16, buffered
    if merge_shared:
        fixed += 2 * R * cg * (dp * 2 + 4)  # o_sh bf16 + lse_sh f32
    # Pipelined row loop: the carried scores/probs ([cg, W2] i32 + s8)
    # live across iterations.
    fixed += cg * (2 if kv_bits == 4 else 1) * t * hkv * 5
    return kv + sc + fixed


def _pick_blocks(
    b: int, B: int, S: int, hkv: int, dp: int, cg: int, kv_bits: int,
    merge_own: bool, merge_shared: bool,
    block_s: int | None, row_batch: int | None,
    interpret: bool = False,
) -> tuple[int, int]:
    """Joint (row_batch, block_s) selection: Mosaic-legal and VMEM-safe.

    Legality: R must divide b and satisfy ``R % 8 == 0 or R == B`` (scale
    BlockSpec rule — see decode_kernel_supported); block_s must divide S
    and satisfy ``(block_s*hkv) % 128 == 0 or block_s == S``. Among legal
    pairs, prefer R=8 (measured best cell-overhead/VMEM tradeoff) and the
    largest block_s whose estimated footprint fits the 16 MB scoped-VMEM
    limit. An explicit ``block_s`` argument is honored verbatim (tests
    drive exact grids in interpret mode); ``HYDRAGEN_DECODE_BLOCK_S`` only
    caps — an oversized request degrades to the largest legal fit."""
    if block_s is not None:
        assert S % block_s == 0, f"cache S={S} must tile by block_s={block_s}"
    if row_batch is not None:
        assert b % row_batch == 0, f"row_batch {row_batch} must divide batch {b}"
        assert interpret or row_batch % 8 == 0 or row_batch == B, (
            f"row_batch {row_batch} illegal for buffer rows B={B}: Mosaic "
            "needs the blocked row dim % 8 == 0 or == the array dim"
        )
        rs = [row_batch]
    else:
        legal = (
            [r for r in range(1, b + 1) if b % r == 0] if interpret
            else _legal_row_batches(b, B)
        )
        if not legal:
            raise ValueError(
                f"decode kernel unsupported at b={b}, B={B} (need b % 8 == 0 "
                "or b == B); gate callers with decode_kernel_supported()"
            )
        ge8 = [r for r in legal if r >= 8]
        rs = [min(ge8)] if ge8 else [max(legal)]
        # Fallback ladder: if the preferred R cannot fit VMEM at any legal
        # block_s, try the remaining legal Rs smallest-first.
        rs += sorted(r for r in legal if r not in rs)

    if block_s is not None:
        cands = [block_s]  # explicit block: honored verbatim
        cap = block_s
    else:
        cands = [
            t for t in range(S, 0, -1)
            if S % t == 0 and ((t * hkv) % LANES == 0 or t == S)
        ]
        env = os.environ.get("HYDRAGEN_DECODE_BLOCK_S")
        cap = int(env) if env else min(S, max(8, 4096 // hkv))
    def fits(R, t):
        return _kernel_vmem_bytes(
            R, t, hkv, dp, cg, kv_bits, merge_own, merge_shared,
            num_s_blocks=S // t,
        ) <= _VMEM_BUDGET

    for R in rs:
        for t in cands:
            if t > cap:
                continue
            if fits(R, t):
                return R, t
        # A cap below every fitting candidate must not brick the call:
        # retry uncapped before shrinking R.
        for t in cands:
            if fits(R, t):
                return R, t
    if block_s is not None and row_batch is not None:
        return rs[0], block_s  # fully explicit: the caller owns the risk
    raise ValueError(
        f"no (row_batch, block_s) fits scoped VMEM at b={b}, S={S}, "
        f"hkv={hkv}, d={dp} (candidates {cands[-3:]})"
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_s", "row_batch", "interpret", "kv_bits"),
)
def decode_attention_cached(
    layer: jax.Array,
    q: jax.Array,
    k_all: jax.Array,
    v_all: jax.Array,
    *,
    kv_seq_lens: jax.Array,
    k_scale_all: jax.Array,
    v_scale_all: jax.Array,
    own_kv: tuple[jax.Array, jax.Array] | None = None,
    shared_partial: tuple[jax.Array, jax.Array] | None = None,
    scale: float | None = None,
    block_s: int | None = None,
    row_batch: int | None = None,
    interpret: bool | None = None,
    kv_bits: int = 8,
):
    """Int8/int4 decode attention reading ONE layer of the stacked BSHD cache.

    Args:
        layer: scalar int32 — which layer's slice to attend (rides scalar
            prefetch into the BlockSpec index maps, so the operands are the
            raw cache buffers and no per-layer slice is ever materialized).
        q: ``[b, hq, 1, d]`` queries (bf16/f32; quantized in-kernel per row,
            ~0.3 % score noise).
        k_all, v_all: ``[L, B, S, hkv, d]`` **int8** cache buffers (B >= b).
        kv_seq_lens: ``[b]`` int32 valid lengths. Payload/scales beyond each
            row's length must be finite (the engine's caches are zeroed).
        k_scale_all, v_scale_all: ``[L, B, S*hkv]`` f32 flat lane-major
            scales (the cache's flat_scales storage). With ``kv_bits=4``
            the payloads are token-planar nibble packs (S here is the BYTE
            row count; the scales and kv_seq_lens cover the LOGICAL 2*S
            tokens) — the kernel unpacks both planes in-register and keeps
            the single-launch structure, halving the read's HBM traffic.
        own_kv: optional ``(k1, v1)`` each ``[b, hkv, 1, d]`` float — this
            step's own-token KV, merged in-kernel as one extra softmax
            column per row (replaces the analytic own-token partial + one
            XLA combine input per layer).
        shared_partial: optional ``(o_sh [b, hq, 1, d], lse_sh [b, hq, 1]
            f32)`` — a pre-computed attention partial (the shared-prefix
            read, pre-combined across levels), merged exactly via LSE at
            emit. With both merges the kernel emits the FINAL attention and
            ``combine_lse`` drops out of the decode layer entirely.

    Returns:
        out ``[b, hq, 1, d]`` (q.dtype), lse ``[b, hq, 1]`` f32 (of the
        merged result). Matches ``ops.reference.attention_bhsd(...,
        kv_bshd=True)`` (+ combine_lse of the merge inputs) on the layer's
        slice, up to int8 quantization noise of q and p (~0.5 % RMS).
    """
    b, hq, m, d = q.shape
    L, B, S, hkv, _ = k_all.shape
    assert m == 1, "decode kernel handles single-position queries"
    assert hq % hkv == 0
    assert k_all.dtype == jnp.int8 and v_all.dtype == jnp.int8
    assert b <= B
    assert kv_bits in (8, 4)
    s_logical = 2 * S if kv_bits == 4 else S  # S = byte rows when int4
    group = hq // hkv
    c = hkv
    cg = c * group
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dp = max(_round_up(d, LANES), LANES)
    assert d == dp, "head_dim must be a 128-lane multiple for the cached kernel"
    # Joint Mosaic-legal, VMEM-safe (row_batch, block_s) selection. Smaller
    # blocks let the clamped index maps skip DMA for the yet-unfilled tail
    # of the decode window at the cost of more grid cells;
    # HYDRAGEN_DECODE_BLOCK_S / the explicit args cap the block for tuning.
    R, block_s = _pick_blocks(
        b, B, S, hkv, dp, cg, kv_bits,
        own_kv is not None, shared_partial is not None,
        block_s, row_batch, interpret=interpret,
    )
    num_s_blocks = S // block_s

    qf = q.reshape(b, hq, d)
    lens = jnp.minimum(kv_seq_lens.astype(jnp.int32), s_logical)
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)

    merge_ops, merge_specs = [], []
    merge_own = own_kv is not None
    merge_shared = shared_partial is not None
    if merge_own:
        k1, v1 = own_kv
        assert k1.shape == (b, hkv, 1, d) and v1.shape == (b, hkv, 1, d)
        merge_ops += [k1.reshape(b, c, d), v1.reshape(b, c, d)]
        merge_specs += [
            pl.BlockSpec((R, c, dp), lambda bi, si, *_: (bi, 0, 0)),
        ] * 2
    if merge_shared:
        o_sh, lse_sh = shared_partial
        assert o_sh.shape == (b, hq, 1, d) and lse_sh.shape == (b, hq, 1)
        merge_ops += [
            o_sh.reshape(b, cg, d),
            lse_sh.astype(jnp.float32).reshape(b, cg, 1),
        ]
        merge_specs += [
            pl.BlockSpec((R, cg, dp), lambda bi, si, *_: (bi, 0, 0)),
            pl.BlockSpec((R, cg, 1), lambda bi, si, *_: (bi, 0, 0)),
        ]

    def last_block(lens_ref, bi, rows=R):
        lim = lens_ref[bi * rows]
        for r in range(1, rows):
            lim = jnp.maximum(lim, lens_ref[bi * rows + r])
        if kv_bits == 4:
            # Byte row j serves logical tokens j and j + S: tokens past S
            # live in rows [0, lim - S), tokens below in [0, min(lim, S)) —
            # the furthest byte row needed is min(lim, S) - 1.
            lim = jnp.minimum(lim, S)
        return jnp.maximum((lim + block_s - 1) // block_s - 1, 0)

    def kv_index(bi, si, lens_ref, li_ref):
        return (li_ref[0], bi, jnp.minimum(si, last_block(lens_ref, bi)), 0, 0)

    def sc_index(bi, si, lens_ref, li_ref):
        return (li_ref[0], bi, jnp.minimum(si, last_block(lens_ref, bi)))

    kernel = functools.partial(
        _decode_cached_kernel,
        c=c, group=group, rows=R, block_s=block_s,
        # LOG2E folded in: the kernel softmax runs on the VPU-native exp2
        # (the q-quantization chain is scale-invariant, so the int8 path is
        # untouched); LSE is converted back to natural log at emit.
        num_s_blocks=num_s_blocks, sm_scale=scale * LOG2E,
        merge_own=merge_own, merge_shared=merge_shared, kv_bits=kv_bits,
    )

    # int4: the high plane's scales ride two extra refs — the flat scale
    # arrays are token-indexed over 2*S logical positions, so in W-lane
    # block units the high plane's blocks start at num_s_blocks.
    hi_scale_ops, hi_scale_specs = [], []
    if kv_bits == 4:
        assert k_scale_all.shape[-1] == 2 * S * c, (
            k_scale_all.shape, S, c
        )

        def sc_hi_index(bi, si, lens_ref, li_ref):
            return (
                li_ref[0], bi,
                num_s_blocks + jnp.minimum(si, last_block(lens_ref, bi)),
            )

        hi_scale_ops = [k_scale_all, v_scale_all]
        hi_scale_specs = [
            pl.BlockSpec((1, R, block_s * c), sc_hi_index),
            pl.BlockSpec((1, R, block_s * c), sc_hi_index),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b // R, num_s_blocks),
            in_specs=[
                pl.BlockSpec((R, cg, dp), lambda bi, si, *_: (bi, 0, 0)),
                pl.BlockSpec((1, R, block_s, c, dp), kv_index),
                pl.BlockSpec((1, R, block_s, c, dp), kv_index),
                pl.BlockSpec((1, R, block_s * c), sc_index),
                pl.BlockSpec((1, R, block_s * c), sc_index),
                *hi_scale_specs,
                *merge_specs,
            ],
            out_specs=[
                pl.BlockSpec((R, cg, dp), lambda bi, si, *_: (bi, 0, 0)),
                pl.BlockSpec((R, cg, LANES), lambda bi, si, *_: (bi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((R * cg, LANES), jnp.float32),
                pltpu.VMEM((R * cg, LANES), jnp.float32),
                pltpu.VMEM((R * cg, dp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, cg, dp), q.dtype),
            jax.ShapeDtypeStruct((b, cg, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, li, qf, k_all, v_all, k_scale_all, v_scale_all,
      *hi_scale_ops, *merge_ops)

    out = out.reshape(b, hq, m, d)
    lse = lse[:, :, 0].reshape(b, hq, m)
    return out.astype(q.dtype), lse


def gather_token_row_cached(
    layer: jax.Array | None,
    row: jax.Array,
    buf: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Read byte row ``row`` of layer ``layer`` from a stacked BSHD cache
    buffer ``[L, B, S, hkv, d]`` -> ``[B, hkv, d]``, via a one-block Pallas
    copy instead of an XLA dynamic-slice. ``layer=None`` reads the row of
    EVERY layer -> ``[L, B, hkv, d]`` (grid over L, one block each — a
    single [L, B, 1, hkv, d] block would exceed scoped VMEM at 7B scale);
    that form serves the batched decode write (update_unique_decode).

    Exists for exactly one reason: the int4 in-place decode write's nibble
    RMW needs the byte row's current value, and an XLA dynamic-slice of a
    ``[1, B, 1, hkv, d]`` slab at a varying token row makes TPU layout
    assignment prefer a B-inner-of-token layout {4,3,1,2,0} for the WHOLE
    buffer at some shapes (72 byte rows: yes; 64: no) — in tension with the
    decode kernel's required default layout, it materialized full 2.25 GB
    relayout copies of the cache per decode step and OOMed the 7B bs256
    sweep cell (results/r5_measure/probe_layout*.log). A custom call is a
    hard default-layout boundary on both sides, so reading the row here
    leaves XLA with only dynamic-update-slices, which follow the (pinned)
    default carry layout.
    """
    L, B, S, hkv, d = buf.shape
    if interpret is None:
        # Keyed on the actual devices, not jax.default_backend():
        # test_decode_kernel force-routes the decode kernel on CPU by
        # patching default_backend, and this helper must then interpret.
        interpret = jax.devices()[0].platform != "tpu"

    if layer is None:
        idx = jnp.asarray(row, jnp.int32).reshape((1,))

        def kern_all(idx_ref, in_ref, out_ref):
            del idx_ref
            out_ref[...] = in_ref[:, :, 0]

        return pl.pallas_call(
            kern_all,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(L,),
                in_specs=[
                    pl.BlockSpec(
                        (1, B, 1, hkv, d),
                        lambda l, idx_ref: (l, 0, idx_ref[0], 0, 0),
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, B, hkv, d), lambda l, idx_ref: (l, 0, 0, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((L, B, hkv, d), buf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(idx, buf)

    idx = jnp.stack(
        [
            jnp.asarray(layer, jnp.int32).reshape(()),
            jnp.asarray(row, jnp.int32).reshape(()),
        ]
    )

    def kern(idx_ref, in_ref, out_ref):
        del idx_ref
        out_ref[...] = in_ref[0, :, 0]

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(
                    (1, B, 1, hkv, d),
                    lambda i, idx_ref: (idx_ref[0], 0, idx_ref[1], 0, 0),
                )
            ],
            out_specs=pl.BlockSpec(
                (B, hkv, d), lambda i, idx_ref: (0, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, hkv, d), buf.dtype),
        interpret=interpret,
    )(idx, buf)


def decode_attention_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_seq_lens: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    scale: float | None = None,
    block_s: int | None = None,
    row_batch: int | None = None,
    interpret: bool | None = None,
    scales_chunked: bool = False,
    own_kv: tuple[jax.Array, jax.Array] | None = None,
    shared_partial: tuple[jax.Array, jax.Array] | None = None,
):
    """Single-layer convenience wrapper over ``decode_attention_cached``.

    q ``[b, hq, 1, d]``; k/v ``[b, s, hkv, d]`` int8; k_scale/v_scale
    ``[b, s, hkv]`` f32 (or pre-flattened ``[b, s*hkv]`` / ``[b, 1, s*hkv]``
    when ``scales_chunked``). Used by tests and microbenchmarks; the engine
    calls the cached form on the raw buffers.
    """
    b, s, hkv, d = k.shape

    def flat(sc):
        if scales_chunked:
            return sc.astype(jnp.float32).reshape(b, s * hkv)
        return chunk_kv_scales(sc.astype(jnp.float32), hkv).reshape(b, s * hkv)

    return decode_attention_cached(
        jnp.int32(0), q, k[None], v[None],
        kv_seq_lens=kv_seq_lens,
        k_scale_all=flat(k_scale)[None],
        v_scale_all=flat(v_scale)[None],
        own_kv=own_kv, shared_partial=shared_partial,
        scale=scale, block_s=block_s, row_batch=row_batch,
        interpret=interpret,
    )
